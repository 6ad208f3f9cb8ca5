#!/usr/bin/env python
"""1024px fused-sublayer mechanism attempt (VERDICT r3 task 8).

Hypothesis: the fused self-attention sublayer loses to the raw online
attention core at S=16384 (20.1ms vs 13.2ms) partly because its Python
head loop unrolls 8 copies of the [bq, S] score pipeline into one Mosaic
program — bq=256 already "tips the remote compiler over", so it is stuck
at bq=128 where the scores matmul runs with a 128-row M dim and the j==0
K/V prep amortises over 128 programs/batch. The v2 kernel below switches
the head loop to lax.fori_loop with dynamic 40-row sublane slices
(8-granular, Mosaic-legal), shrinking the program 8x; if that lets
bq=256/512 compile, the scores matmul gets a 2-4x larger M dim and the
prep serialisation halves/quarters.

Candidates (interleaved min-of-N across rounds):
  fused128   — shipped kernel (sdtpu.ops.fused_transformer), bq=128
  v2-128/256/512 — fori-loop kernel at increasing q blocks
  unfused    — LN + XLA projections + dispatched attention + out proj
               (what the non-fused path costs end to end)
Shape: the 1024px 128^2 transformer (B=4 = 2 img x CFG, S=16384, C=320).
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _v2_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
               o_ref, xn_scr, kt_scr, vt_scr, ot_scr, *,
               scale, bq, n_head, d_head, eps):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _prep():
        x = x_ref[0].astype(jnp.float32)  # [S, C]
        mu = jnp.mean(x, axis=1, keepdims=True)
        u = x - mu
        var = jnp.mean(u * u, axis=1, keepdims=True)
        xn = (u * jax.lax.rsqrt(var + eps)).astype(x_ref.dtype)
        xn = xn * g_ref[:] + b_ref[:]
        xn_scr[:] = xn
        kt_scr[:] = jax.lax.dot_general(
            wk_ref[:], xn, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(kt_scr.dtype)
        vt_scr[:] = jax.lax.dot_general(
            wv_ref[:], xn, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(vt_scr.dtype)

    xq = xn_scr[pl.ds(j * bq, bq), :]  # [bq, C] (normed)

    def head_body(h, carry):
        w_h = wq_ref[h]  # [C, d_head]
        q_h = jax.lax.dot_general(
            xq, w_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xq.dtype)
        kt_h = kt_scr[pl.ds(h * d_head, d_head), :]  # [dh, S]
        s = jax.lax.dot_general(
            q_h, kt_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [bq, S]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        vt_h = vt_scr[pl.ds(h * d_head, d_head), :]  # [dh, S]
        ot_h = jax.lax.dot_general(
            vt_h, p.astype(vt_h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [dh, bq]
        ot_scr[pl.ds(h * d_head, d_head), :] = ot_h / l.T
        return carry

    jax.lax.fori_loop(0, n_head, head_body, 0)

    out = jax.lax.dot_general(
        ot_scr[:].astype(x_ref.dtype), wo_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [bq, C]
    xres = x_ref[0, pl.ds(j * bq, bq), :].astype(jnp.float32)
    o_ref[0] = (out + bo_ref[:] + xres).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "block_q",
                                             "interpret"))
def fused_self_attention_v2(x, ln_g, ln_b, wq, wk, wv, wo, bo,
                            n_head: int, eps: float = 1e-5,
                            block_q: int = 128, interpret: bool = False):
    b, s, c = x.shape
    d_head = c // n_head
    assert d_head * n_head == c and d_head % 8 == 0, (c, n_head)
    scale = float(d_head) ** -0.5
    bq = min(block_q, s)
    while s % bq:
        bq //= 2
    nq = s // bq
    wq_h = wq.reshape(c, n_head, d_head).transpose(1, 0, 2)
    dtype = x.dtype
    out = pl.pallas_call(
        functools.partial(_v2_kernel, scale=scale, bq=bq, n_head=n_head,
                          d_head=d_head, eps=eps),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((n_head, c, d_head), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((s, c), dtype),
            pltpu.VMEM((c, s), dtype),
            pltpu.VMEM((c, s), dtype),
            pltpu.VMEM((c, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * s * c * 2 + 2 * b * s * c * c * 4,
            bytes_accessed=2 * b * s * c * x.dtype.itemsize,
            transcendentals=b * s * s,
        ),
        interpret=interpret,
    )(x, ln_g.astype(dtype)[None, :], ln_b.astype(dtype)[None, :],
      wq_h.astype(dtype), wk.astype(dtype), wv.astype(dtype),
      wo.astype(dtype), bo.astype(jnp.float32)[None, :])
    return out


def bench(fn, args, iters=8):
    def run(args, n):
        def body(c, _):
            out = fn(*c)
            c0 = c[0] + 0.0 * jnp.mean(out.astype(c[0].dtype))
            return (c0,) + c[1:], None
        c, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(c[0].astype(jnp.float32))

    run1 = jax.jit(functools.partial(run, n=1))
    runN = jax.jit(functools.partial(run, n=iters))
    np.asarray(run1(args)); np.asarray(runN(args))

    def once():
        t0 = time.perf_counter(); np.asarray(run1(args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(runN(args))
        tn = time.perf_counter() - t0
        return (tn - t1) / (iters - 1) * 1000
    return once


def main():
    from sdtpu.ops.attention import qkv_attention
    from sdtpu.ops.conv import linear
    from sdtpu.ops.fused_transformer import fused_self_attention
    from sdtpu.ops.groupnorm import layer_norm

    dtype = jnp.bfloat16
    b, s, c, h = 4, 16384, 320, 8
    if len(sys.argv) > 1:
        b, s, c, h = (int(v) for v in sys.argv[1].split(","))
    print(f"device: {jax.devices()[0]}  B{b} S{s} C{c} h{h}", flush=True)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (b, s, c), dtype)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), dtype)
    bb = 0.1 * jax.random.normal(ks[2], (c,), dtype)
    wscale = c ** -0.5
    wq, wk, wv, wo = (wscale * jax.random.normal(k, (c, c), dtype)
                      for k in ks[3:7])
    bo = 0.1 * jax.random.normal(ks[7], (c,), dtype)

    def unfused(x):
        xn = layer_norm(x, g, bb, 1e-5)
        q = linear({"w": wq}, xn)
        k = linear({"w": wk}, xn)
        v = linear({"w": wv}, xn)
        o = qkv_attention(q, k, v, None, h)
        return x + linear({"w": wo, "b": bo}, o)

    cands = {"unfused": (unfused, (x,)),
             "fused128": (lambda x: fused_self_attention(
                 x, g, bb, wq, wk, wv, wo, bo, h, block_q=128), (x,))}
    for bq in (128, 256, 512):
        cands[f"v2-{bq}"] = (functools.partial(
            lambda x, bq: fused_self_attention_v2(
                x, g, bb, wq, wk, wv, wo, bo, h, block_q=bq), bq=bq), (x,))

    # compile + correctness vs unfused, then interleaved min-of-N
    ref = np.asarray(unfused(x).astype(jnp.float32))
    runners = {}
    for name, (fn, args) in cands.items():
        try:
            got = np.asarray(fn(*args).astype(jnp.float32))
            rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
            runners[name] = bench(fn, args)
            print(f"  {name}: compiled, relerr {rel:.2e}", flush=True)
        except Exception as e:
            print(f"  {name}: FAIL {str(e)[:140]}", flush=True)

    times = {name: [] for name in runners}
    for r in range(3):
        for name, once in runners.items():
            times[name].append(once())
    for name, ts in times.items():
        print(f"{name:>9}: min {min(ts):7.2f}ms  runs "
              f"{'/'.join(f'{t:.2f}' for t in ts)}", flush=True)


if __name__ == "__main__":
    main()
