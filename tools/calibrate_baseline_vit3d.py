#!/usr/bin/env python
"""One-time baseline calibration for BASELINE metric #2 (3D-ViT).

Times the REFERENCE implementation's VideoTransformer forward
(/root/reference/src/transformers/vision/vit_3d/model.py:211-308, torch CPU)
at the same tiers bench.py measures (xsmall: d240/4L 32f@128^2; large:
d2112/20L 8f@224^2) and records frames/sec into
tools/baseline_calibration_medium.json alongside the decode calibration, so
bench.py can emit a ``vit3d_vs_baseline`` field.

Env: CALIB_VIT3D_TIERS=xsmall,large  CALIB_VIT3D_ITERS
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402


def run_tier(tier: str, iters: int) -> float:
    if tier == "large":
        from configs.transformers.vision.vit_3d.model_args.model_args_large import (
            ModelArgs,
        )
    else:
        from configs.transformers.vision.vit_3d.model_args.model_args_xsmall import (
            ModelArgs,
        )
    from src.transformers.vision.vit_3d.model import VideoTransformer

    args = ModelArgs(dropout=0.0, use_checkpointing=False)
    torch.manual_seed(0)
    model = VideoTransformer(args).eval()
    b = 1
    th, tw = args.target_size
    x = torch.randn(b, args.C_in, args.max_frames, th, tw)
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        dt = time.perf_counter() - t0
    fps = b * args.max_frames * iters / dt
    print(json.dumps({"tier": tier, "frames_per_sec": round(fps, 3),
                      "wall_s": round(dt, 1)}), flush=True)
    return fps


def main():
    tiers = os.environ.get("CALIB_VIT3D_TIERS", "xsmall,large").split(",")
    iters = int(os.environ.get("CALIB_VIT3D_ITERS", "2"))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "baseline_calibration_medium.json",
    )
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    for tier in tiers:
        tier = tier.strip()
        fps = run_tier(tier, iters)
        data[f"reference_cpu_vit3d_{tier}_frames_per_sec"] = round(fps, 3)
    data["vit3d_note"] = (
        "reference torch VideoTransformer.forward on this host's CPU, B=1, "
        "eval mode, no checkpointing; per-tier reference shapes"
    )
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
