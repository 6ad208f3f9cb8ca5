#!/usr/bin/env python
"""Microbenchmark: XLA attention vs Pallas flash at SD shapes.

Measurement methodology for the axon-tunneled TPU: block_until_ready is
NOT a reliable sync and per-dispatch RPC costs dominate small ops, so
each variant is repeated inside a jitted lax.scan (one dispatch) and
timed as (t[n_iters] - t[1]) / (n_iters - 1), synced by a scalar fetch.
Verified: this reports 188 TFLOP/s for a bare 4096^3 bf16 matmul (95% of
v5e peak).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_scan(fn, args, n):
    @jax.jit
    def run(args):
        def body(c, _):
            q = fn(*c)
            # feed output back as q to keep iterations data-dependent
            return (q,) + c[1:], None
        out, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(out[0].astype(jnp.float32))

    np.asarray(run(args))  # compile
    t0 = time.perf_counter()
    np.asarray(run(args))
    return time.perf_counter() - t0


def measure(fn, args, iters=16):
    t1 = bench_scan(fn, args, 1)
    tn = bench_scan(fn, args, iters)
    return (tn - t1) / (iters - 1) * 1000


def main():
    os.environ["SDTPU_KERNELS"] = "xla"
    from sdtpu.ops.attention import qkv_attention
    from sdtpu.ops.flash_attention import flash_attention_heads

    dtype = jnp.bfloat16
    shapes = [
        ("unet-l1", 64, 4096, 40),
        ("unet-l2", 64, 1024, 80),
        ("unet-l3", 64, 256, 160),
        ("vae-mid", 4, 4096, 512),
        ("hires-l1", 64, 16384, 40),
    ]
    for name, bh, s, d in shapes:
        k = jax.random.PRNGKey(0)
        q = jax.random.normal(k, (bh, s, d), dtype)
        flops = 2 * bh * s * s * d * 2

        def xla(q, k, v):
            return qkv_attention(q, k, v, None, 1)

        try:
            ms_x = measure(xla, (q, q, q))
            print(f"{name:9s} s={s:5d} d={d:3d}  XLA {ms_x:8.2f}ms "
                  f"({flops/ms_x/1e9:6.1f} TF/s)")
        except Exception as e:
            ms_x = float("nan")
            print(f"{name:9s} XLA FAILED {type(e).__name__}")

        for bq, bk in [(256, 256), (512, 512), (1024, 512), (512, 1024)]:
            if s % min(bq, s) or s % min(bk, s):
                continue
            d_pad = max(128, -(-d // 128) * 128)
            bq_, bk_ = min(bq, s), min(bk, s)
            vmem = (2 * (bq_ + 2 * bk_) * d_pad * 2 + 2 * bq_ * d_pad * 2
                    + bq_ * (d_pad + 256) * 4 + bq_ * bk_ * 4 * 2)
            if vmem > 13 * 1024 * 1024:
                continue
            fl = functools.partial(flash_attention_heads, block_q=bq, block_k=bk)
            try:
                ms_f = measure(fl, (q, q, q))
                print(f"  flash[{bq:4d}x{bk:4d}] {ms_f:8.2f}ms "
                      f"({flops/ms_f/1e9:6.1f} TF/s)  ratio {ms_f/ms_x:5.2f}")
            except Exception as e:
                print(f"  flash[{bq:4d}x{bk:4d}] FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
