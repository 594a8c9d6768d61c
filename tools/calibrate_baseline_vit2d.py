#!/usr/bin/env python
"""One-time baseline calibration for the ViT-2D image-encoder metric.

Times the REFERENCE implementation's ImageEncoderTransformer forward
(/root/reference/src/transformers/vision/vit_2d/model.py:104-229, torch CPU)
at the medium tier bench.py measures (384px / p16 / d1152 / 16L,
/root/reference/configs/transformers/vision/vit_2d/model_args/
model_args_medium.py) and records images/sec into
tools/baseline_calibration_medium.json, so bench.py can emit a
``vit2d_vs_baseline`` field.

Env: CALIB_VIT2D_ITERS (default 2)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

# torchvision is not installed in this container; the reference's patch
# embed only uses TF.center_crop (patch_embeddings2d.py:8,79) — provide a
# minimal functional equivalent so the reference model runs as written
if "torchvision" not in sys.modules:
    import types

    def _center_crop(img, output_size):
        th, tw = output_size
        h, w = img.shape[-2:]
        top = max((h - th) // 2, 0)
        left = max((w - tw) // 2, 0)
        return img[..., top:top + th, left:left + tw]

    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    tv_f = types.ModuleType("torchvision.transforms.functional")
    tv_f.center_crop = _center_crop
    tv.transforms = tv_t
    tv_t.functional = tv_f
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_t
    sys.modules["torchvision.transforms.functional"] = tv_f


def run_medium(iters: int) -> float:
    from configs.transformers.vision.vit_2d.model_args.model_args_medium import (
        ModelArgs,
    )
    from src.transformers.vision.vit_2d.model import ImageEncoderTransformer

    args = ModelArgs(dropout=0.0, use_checkpointing=False)
    torch.manual_seed(0)
    model = ImageEncoderTransformer(args).eval()
    b = 1
    x = torch.randn(b, args.C_in, args.target_size, args.target_size)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    ips = b * iters / dt
    print(json.dumps({"tier": "medium", "images_per_sec": round(ips, 3),
                      "wall_s": round(dt, 1)}), flush=True)
    return ips


def main():
    iters = int(os.environ.get("CALIB_VIT2D_ITERS", "2"))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "baseline_calibration_medium.json",
    )
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    ips = run_medium(iters)
    data["reference_cpu_vit2d_medium_images_per_sec"] = round(ips, 3)
    data["vit2d_note"] = (
        "reference torch ImageEncoderTransformer.forward on this host's "
        "CPU, B=1, eval mode, no checkpointing; medium-tier reference shapes"
    )
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
