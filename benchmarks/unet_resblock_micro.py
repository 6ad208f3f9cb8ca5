#!/usr/bin/env python
"""UNet ResBlock: XLA composite vs fused conv3x3 chain, at the real UNet
shapes (B=8 = batch-4 x batched CFG). Drives the _use_fused_resblock gate
(models/unet.py): the gate flips wherever the fused chain measures faster.

History: pre-restructure (BENCHLOG r2) XLA won at 64^2x320 (1.12 vs
1.36ms) and the gate was set to >=128^2 rows; the tap-loop restructure
(hoisted column shifts, 121->156 TF/s at 512^2) may move that boundary —
this script re-measures it.
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))

from benchmarks.unet_breakdown import bench  # noqa: E402


def main():
    from sdtpu.config import SD_V1_4
    from sdtpu.models import unet as U

    cfg = SD_V1_4.unet
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    B = int(os.environ.get("SDTPU_ABL_BATCH", "8"))

    # (res, c_in, c_out): the distinct ResBlock shapes of the 512px UNet
    # (64^2 latents) incl. the concat-input decoder blocks, plus the
    # 128^2 row of the 1024px regime for continuity
    shapes = [(64, 320, 320), (64, 640, 320), (64, 960, 320),
              (32, 640, 640), (32, 1280, 640), (16, 1280, 1280),
              (128, 320, 320)]
    for res, cin, cout in shapes:
        x = jax.random.normal(key, (B, res, res, cin), dtype)
        emb = jax.random.normal(key, (1, 1280), dtype)
        rp = U._init_res_block(key, cin, 1280, cout, dtype)
        ms = {}
        for name, min_rows in (("XLA", 1 << 30), ("fused", 1)):
            os.environ["SDTPU_FUSED_UNET_MIN_ROWS"] = str(min_rows)
            try:
                ms[name] = bench(
                    lambda x, emb: U._res_block_apply(rp, x, emb, cfg),
                    (x, emb))
            except Exception as e:
                ms[name] = float("nan")
                print(f"  {name} failed: {str(e)[:90]}", flush=True)
        del os.environ["SDTPU_FUSED_UNET_MIN_ROWS"]
        print(f"resblock {res:3d}^2 {cin:4d}->{cout:4d} B{B}: "
              f"XLA {ms['XLA']:6.2f}ms  fused {ms['fused']:6.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
