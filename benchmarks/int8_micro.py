#!/usr/bin/env python
"""Int8 MXU A/B at the UNet's granularity-bound attention shapes.

The 512px floor analysis (BENCHLOG) pins the residual UNet-step cost on
the 64^2 self-attention SCORES matmul: contraction over d_head=40 runs
at ~52 TF/s bf16 — the MXU's K-granularity cost. v5e's int8 MXU peak is
~2x bf16 (~394 TOPS), so an int8 dot at the SAME granularity ratio
would double the scores throughput — the one lever that raises the
peak rather than the utilisation (VERDICT r4 #1).

Measures, interleaved min-of-N (the only trustworthy A/B here,
CLAUDE.md):
  1. raw dot: bf16 vs int8(+int32 accum) at scores / p@v / projection /
     MLP shapes — is the int8 MXU path real at K=40?
  2. dynamically-quantized scores pipeline: bf16 q,k -> per-row abs-max
     scales -> int8 dot -> f32 dequant (the form a kernel would use),
     vs the plain bf16 dot it replaces.
  3. weight-only int8 (int8 weights dequantised to bf16 before a bf16
     dot) at the projection shape — expected NO win (the dot stays
     bf16; batch-8 projections are MXU-bound, not weight-HBM-bound);
     measured to close VERDICT r4 #1's weight-only branch with a row.
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("SDTPU_CACHE", "/tmp/sdtpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

EXTRA = int(os.environ.get("EXTRA", "64"))


def make_runner(fn, args):
    """scan-in-jit timing: carry EVERY arg through a ~0*mean(out)
    feedback so no per-iteration work can be CSE'd/hoisted; scalar fetch
    is the device sync (CLAUDE.md methodology)."""

    def run(args, n):
        def body(c, _):
            out = fn(*c)
            out = out[0] if isinstance(out, tuple) else out
            # Three traps (all hit in earlier runs, rows read over-peak
            # or negative): (a) 0.0*mean folds to a constant and the dot
            # HOISTS out of the scan; (b) a LINEAR reduction of a dot
            # reassociates — XLA rewrites mean(q@k^T) into
            # sum_d(colsum(q)*colsum(k)), O(S*d), eliminating the dot;
            # (c) feedback into only ONE carried arg leaves per-arg
            # preprocessing of the OTHERS (k-side dynamic quant, weight
            # dequant) loop-invariant, hoisting it out of the timed
            # body. mean(out^2) is quartic in the inputs (no such
            # rewrite), the 1e-38 factor keeps the carry data-dependent
            # (value ~0 but not statically foldable, incl. the ->int8
            # convert), and every carry leaf gets the feedback.
            eps = 1e-38 * jnp.mean(jnp.square(out.astype(jnp.float32)))
            return tuple(ci + eps.astype(ci.dtype) for ci in c), None
        c, _ = jax.lax.scan(body, args, None, length=n)
        return jnp.sum(c[0].astype(jnp.float32))

    run1 = jax.jit(functools.partial(run, n=8))
    runN = jax.jit(functools.partial(run, n=8 + EXTRA))
    np.asarray(run1(args)); np.asarray(runN(args))

    def measure():
        t0 = time.perf_counter(); np.asarray(run1(args)); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(runN(args)); tn = time.perf_counter() - t0
        return (tn - t1) / EXTRA * 1000

    return measure


def ab(label, flops, named_runners, n_rounds=4):
    mins = [1e9] * len(named_runners)
    for _ in range(n_rounds):
        for i, (_, r) in enumerate(named_runners):
            mins[i] = min(mins[i], r())
    cols = "  ".join(f"{name} {m:7.3f}ms ({flops/m/1e9:6.1f} T/s)"
                     for (name, _), m in zip(named_runners, mins))
    print(f"{label}: {cols}", flush=True)
    return mins


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    # ---- 1. raw dot: bf16 vs int8, batched scores shape --------------
    # [bh, S, d] x [bh, S, d] -> [bh, S, S] contracting d (=scores), and
    # [bh, S, S] x [bh, S, d] -> [bh, S, d] contracting S (=p@v)
    for bh, s, d in [(64, 4096, 40), (64, 4096, 128), (16, 1024, 80)]:
        qb = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
        kb = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
        qi = (qb * 10).astype(jnp.int8)
        ki = (kb * 10).astype(jnp.int8)
        dn = (((2,), (2,)), ((0,), (0,)))

        def dot_bf16(q, k):
            return jax.lax.dot_general(
                q, k, dn, preferred_element_type=jnp.float32)

        def dot_int8(q, k):
            return jax.lax.dot_general(
                q, k, dn, preferred_element_type=jnp.int32)

        flops = 2 * bh * s * s * d
        ab(f"scores bh{bh} s{s} d{d}", flops,
           [("bf16", make_runner(dot_bf16, (qb, kb))),
            ("int8", make_runner(dot_int8, (qi, ki)))])

    # p@v: contraction over S=4096 (already ~197 TF/s bf16)
    bh, s, d = 64, 4096, 40
    pb = jax.nn.softmax(jax.random.normal(key, (bh, s, s))).astype(jnp.bfloat16)
    vb = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
    pi = (pb * 127).astype(jnp.int8)
    vi = (vb * 10).astype(jnp.int8)
    dnpv = (((2,), (1,)), ((0,), (0,)))
    flops = 2 * bh * s * s * d
    ab(f"p@v    bh{bh} s{s} d{d}", flops,
       [("bf16", make_runner(lambda p, v: jax.lax.dot_general(
            p, v, dnpv, preferred_element_type=jnp.float32), (pb, vb))),
        ("int8", make_runner(lambda p, v: jax.lax.dot_general(
            p, v, dnpv, preferred_element_type=jnp.int32), (pi, vi)))])

    # projection / MLP shapes (contract C)
    for m, cin, cout, tag in [(32768, 320, 320, "proj"),
                              (32768, 320, 2560, "mlp")]:
        xb = jax.random.normal(key, (m, cin), jnp.bfloat16)
        wb = jax.random.normal(key, (cin, cout), jnp.bfloat16)
        xi = (xb * 10).astype(jnp.int8)
        wi = (wb * 10).astype(jnp.int8)
        dn2 = (((1,), (0,)), ((), ()))
        flops = 2 * m * cin * cout
        ab(f"{tag}  m{m} {cin}->{cout}", flops,
           [("bf16", make_runner(lambda x, w: jax.lax.dot_general(
                x, w, dn2, preferred_element_type=jnp.float32), (xb, wb))),
            ("int8", make_runner(lambda x, w: jax.lax.dot_general(
                x, w, dn2, preferred_element_type=jnp.int32), (xi, wi)))])

    # ---- 2. full dynamic-quant scores pipeline vs plain bf16 ---------
    bh, s, d = 64, 4096, 40
    qb = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
    kb = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
    dn = (((2,), (2,)), ((0,), (0,)))

    def scores_bf16(q, k):
        return jax.lax.dot_general(q, k, dn,
                                   preferred_element_type=jnp.float32)

    def scores_dynq(q, k):
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=2, keepdims=True) / 127.0 + 1e-8
        ks = jnp.max(jnp.abs(kf), axis=2, keepdims=True) / 127.0 + 1e-8
        qi = jnp.round(qf / qs).astype(jnp.int8)
        ki = jnp.round(kf / ks).astype(jnp.int8)
        si = jax.lax.dot_general(qi, ki, dn,
                                 preferred_element_type=jnp.int32)
        return si.astype(jnp.float32) * qs * ks.transpose(0, 2, 1)

    flops = 2 * bh * s * s * d
    ab("scores full-pipeline", flops,
       [("bf16", make_runner(scores_bf16, (qb, kb))),
        ("dynq-int8", make_runner(scores_dynq, (qb, kb)))])

    # numeric sanity of the dequant form (reduced ON device — fetching
    # the 4.3GB scores tensor through the tunnel takes minutes)
    @jax.jit
    def _err(q, k):
        d = scores_dynq(q, k) - scores_bf16(q, k)
        return jnp.max(jnp.abs(d)), jnp.max(jnp.abs(scores_bf16(q, k)))
    err, ref = (float(x) for x in _err(qb, kb))
    print(f"dynq max abs err {err:.4f} (ref max {ref:.2f}, "
          f"rel {err/ref:.5f})", flush=True)

    # ---- 3. weight-only int8 at the projection shape ------------------
    m, cin, cout = 32768, 320, 320
    xb = jax.random.normal(key, (m, cin), jnp.bfloat16)
    wb = jax.random.normal(key, (cin, cout), jnp.bfloat16)
    wsc = jnp.max(jnp.abs(wb.astype(jnp.float32)), axis=0) / 127.0 + 1e-8
    wi8 = jnp.round(wb.astype(jnp.float32) / wsc).astype(jnp.int8)
    dn2 = (((1,), (0,)), ((), ()))

    def proj_bf16(x, w):
        return jax.lax.dot_general(x, w, dn2,
                                   preferred_element_type=jnp.float32)

    def proj_wonly(x, wi, ws):
        w = (wi.astype(jnp.float32) * ws).astype(jnp.bfloat16)
        return jax.lax.dot_general(x, w, dn2,
                                   preferred_element_type=jnp.float32)

    flops = 2 * m * cin * cout
    # wi8/wsc are CARRIED (not closed over) so the dequant stays inside
    # the timed body — see trap (c) in make_runner
    ab("proj weight-only", flops,
       [("bf16", make_runner(proj_bf16, (xb, wb))),
        ("w-only-int8", make_runner(proj_wonly, (xb, wi8, wsc)))])


if __name__ == "__main__":
    main()
