#!/usr/bin/env python
"""1024px-class UNet step attribution: per-component scan-in-jit timing at
128^2-latent shapes (batch 4 = 2 images x batched CFG, bf16), reconstructed
against the measured ~315ms step (bench.py SDTPU_BENCH_SIZE=1024).

Small per-component graphs compile in seconds; a monkeypatched full-UNet
ablation at 128^2 never finished a single remote compile in 50 min (the
scan-free forward graph is a remote-XLA tarpit — see BENCHLOG)."""

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
    B = int(os.environ.get("SDTPU_ABL_BATCH", "4"))

    # (res, ch, n_resblocks, n_transformers) per level of the 1024px UNet
    # (latent 128^2; SD v1 mult 1,2,4,4; i/o block counts from
    # models/unet.py build graph: 5 res + 5 tr at levels 0-2, 16^2 has
    # 5+2 res + 1 middle tr, plus up/downsamplers)
    levels = [(128, 320, 5, 5), (64, 640, 5, 5), (32, 1280, 5, 5),
              (16, 1280, 10, 1)]
    total = 0.0
    for res, ch, n_res, n_tr in levels:
        x = jax.random.normal(key, (B, res, res, ch), dtype)
        emb = jax.random.normal(key, (1, 1280), dtype)
        ctx = jax.random.normal(key, (B, 77, 768), dtype)
        rp = U._init_res_block(key, ch, 1280, ch, dtype)
        ms_res = bench(lambda x, emb: U._res_block_apply(rp, x, emb, cfg),
                       (x, emb))
        line = f"res {res:3d} ch {ch:4d}: resblock {ms_res:7.2f}ms x{n_res}"
        lvl = ms_res * n_res
        if n_tr:
            tp = U._init_transformer(key, ch, 768, dtype)
            ms_tr = bench(
                lambda x, ctx: U._transformer_apply(
                    tp, x, ctx, cfg, cfg.heads_for(ch)), (x, ctx))
            line += f"  transformer {ms_tr:7.2f}ms x{n_tr}"
            lvl += ms_tr * n_tr
        print(line + f"   level total {lvl:7.2f}ms", flush=True)
        total += lvl
    print(f"reconstructed step (blocks only, no up/down/io glue): "
          f"{total:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
