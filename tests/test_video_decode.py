"""Video decode path: Y4M parse, MJPEG-AVI demux, frame dirs, clip loader.

Test fixtures are synthesized to-spec (YUV4MPEG2 / RIFF-AVI headers written
byte-by-byte per the public formats), so the parsers are checked against the
format, not against themselves."""

import io
import os
import struct

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vats_tpu.data.video_decode import (  # noqa: E402
    decode_mjpeg_avi,
    decode_video,
    decode_y4m,
    load_clip,
    load_frame_dir,
    resize_center_crop,
    sample_clip_indices,
)


def _solid_frames(t=4, h=24, w=32):
    """Frames with per-frame solid colors for content assertions."""
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
              (0, 255, 255), (255, 0, 255)]
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        frames[i] = colors[i % len(colors)]
    return frames


def _rgb_to_yuv(frames):
    """BT.601 studio-swing RGB -> YCbCr (the standard encode matrix)."""
    f = frames.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y_full = 0.299 * r + 0.587 * g + 0.114 * b
    y = 16.0 + (219.0 / 255.0) * y_full
    u = 128.0 + (224.0 / 255.0) * (b - y_full) / 1.772
    v = 128.0 + (224.0 / 255.0) * (r - y_full) / 1.402
    return (np.clip(y, 0, 255), np.clip(u, 0, 255), np.clip(v, 0, 255))


def _write_y4m(path, frames, chroma="444"):
    t, h, w, _ = frames.shape
    y, u, v = _rgb_to_yuv(frames)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode())
        for i in range(t):
            f.write(b"FRAME\n")
            if chroma == "444":
                for plane in (y[i], u[i], v[i]):
                    f.write(plane.astype(np.uint8).tobytes())
            else:  # 420: 2x2 average chroma
                f.write(y[i].astype(np.uint8).tobytes())
                for plane in (u[i], v[i]):
                    sub = plane.reshape(h // 2, 2, w // 2, 2).mean((1, 3))
                    f.write(sub.astype(np.uint8).tobytes())


def _write_mjpeg_avi(path, frames):
    """Minimal RIFF/AVI: hdrl LIST (avih only) + movi LIST of 00dc JPEGs."""
    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=95)
        jpegs.append(buf.getvalue())

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    avih = struct.pack("<14I", 40000, 0, 0, 0x10, len(jpegs), 0, 1, 0,
                       frames.shape[2], frames.shape[1], 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs)
    )
    body = b"AVI " + hdrl + movi
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


@pytest.mark.parametrize("chroma", ["444", "420"])
def test_decode_y4m(tmp_path, chroma):
    frames = _solid_frames()
    p = str(tmp_path / "clip.y4m")
    _write_y4m(p, frames, chroma)
    out = decode_y4m(p)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # YUV roundtrip is lossy; solid colors should survive within ~6 levels
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 6


def test_decode_y4m_max_frames(tmp_path):
    frames = _solid_frames(t=6)
    p = str(tmp_path / "clip.y4m")
    _write_y4m(p, frames)
    assert decode_y4m(p, max_frames=3).shape[0] == 3


def test_decode_mjpeg_avi(tmp_path):
    frames = _solid_frames()
    p = str(tmp_path / "clip.avi")
    _write_mjpeg_avi(p, frames)
    out = decode_mjpeg_avi(p)
    assert out.shape == frames.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - frames.astype(int)).max() <= 10


def test_decode_rejects_non_avi(tmp_path):
    p = str(tmp_path / "x.avi")
    with open(p, "wb") as f:
        f.write(b"not a riff file")
    with pytest.raises(ValueError):
        decode_mjpeg_avi(p)


def test_load_frame_dir(tmp_path):
    frames = _solid_frames(t=3, h=16, w=16)
    d = tmp_path / "vid"
    d.mkdir()
    for i, f in enumerate(frames):
        Image.fromarray(f).save(str(d / f"frame_{i:04d}.png"))
    out = load_frame_dir(str(d))
    np.testing.assert_array_equal(out, frames)


def test_decode_video_npy_layouts(tmp_path):
    thwc = _solid_frames(t=3, h=8, w=10)
    cthw = thwc.transpose(3, 0, 1, 2)
    p1, p2 = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    np.save(p1, thwc)
    np.save(p2, cthw)
    np.testing.assert_array_equal(decode_video(p1), thwc)
    np.testing.assert_array_equal(decode_video(p2), thwc)


def test_sample_clip_indices():
    # centered window
    np.testing.assert_array_equal(
        sample_clip_indices(10, 4, stride=2), [1, 3, 5, 7]
    )
    # short video loops
    np.testing.assert_array_equal(
        sample_clip_indices(3, 5), [0, 1, 2, 0, 1]
    )
    # random placement stays in range
    rng = np.random.RandomState(0)
    for _ in range(10):
        idx = sample_clip_indices(20, 4, stride=3, random=True, rng=rng)
        assert idx.min() >= 0 and idx.max() < 20


def test_resize_center_crop():
    frames = _solid_frames(t=2, h=24, w=48)
    out = resize_center_crop(frames, 16)
    assert out.shape == (2, 16, 16, 3)


def test_load_clip_and_loader_end_to_end(tmp_path):
    from vats_tpu.data.vision_data import setup_video_loaders

    root = tmp_path / "dataset"
    for ci, cls in enumerate(["drumming", "surfing"]):
        cdir = root / cls
        cdir.mkdir(parents=True)
        _write_mjpeg_avi(
            str(cdir / "v0.avi"), _solid_frames(t=6, h=24, w=32)
        )
        _write_y4m(str(cdir / "v1.y4m"), _solid_frames(t=5, h=24, w=32))
    it = setup_video_loaders(
        str(root), batch_size=2, num_frames=4, image_size=16,
        shuffle=False, epochs=1,
    )
    batch = next(it)
    assert batch["videos"].shape == (2, 3, 4, 16, 16)
    assert batch["videos"].dtype == np.float32
    assert 0.0 <= batch["videos"].min() and batch["videos"].max() <= 1.0
    assert set(batch["labels"]) <= {0, 1}

    clip = load_clip(
        str(root / "drumming" / "v0.avi"), num_frames=4, image_size=16
    )
    assert clip.shape == (3, 4, 16, 16)
