"""Diffusion training (DDPM epsilon / v-prediction objective).

The reference is inference-only — it depends on burn-autodiff but never
imports it (reference: Cargo.toml:20, SURVEY.md §0). sdtpu gets training
for free from JAX autodiff: q-sample the latent, predict the noise,
MSE; optimizer via optax; multi-chip via mesh shardings (dp batch +
optional tp weight sharding), with XLA emitting the gradient psums.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from sdtpu.config import StableDiffusionConfig
from sdtpu.models.unet import unet_apply


def q_sample(x0, noise, alphas_cumprod, t):
    """Forward diffusion: x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps."""
    a_t = jnp.asarray(alphas_cumprod)[t].reshape(-1, 1, 1, 1)
    return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * noise


def diffusion_loss(unet_params, cfg: StableDiffusionConfig, latents, context, t, noise,
                   ctx_valid=None, compute_dtype=jnp.float32, remat=False):
    """MSE between the UNet prediction and the target (epsilon, or v for
    v-prediction models). latents: [B,h,w,4], t: [B] int32.
    remat: block-granular jax.checkpoint in the UNet — cuts the stored
    activations to one per block boundary (a full SD v1 f32 train step
    does not fit a 16GB chip without it) for one extra forward pass.
    String values ("dots"/"heavy") select a checkpoint policy that keeps
    the expensive matmul/conv/attention outputs and recomputes only the
    cheap elementwise chains (models/unet.py:_remat_policy)."""
    from sdtpu.ops.dispatch import force_xla

    x_t = q_sample(latents, noise, cfg_alphas(cfg), t)
    # force_xla: most Pallas kernels are forward-only (no VJP); the
    # training graph must trace a differentiable lowering. The context
    # is trace-time state, so it pins every dispatch gate inside
    # unet_apply (including inside jax.checkpoint regions).
    # allow_differentiable keeps the custom-VJP flash-attention forward
    # on its Pallas kernel (3.5x XLA at the dominant training shape).
    with force_xla(allow_differentiable=True):
        pred = unet_apply(unet_params, x_t.astype(compute_dtype), t,
                          context.astype(compute_dtype), cfg.unet,
                          ctx_valid=ctx_valid, remat=remat)
    pred = pred.astype(jnp.float32)
    if cfg.prediction_type == "v":
        a_t = jnp.asarray(cfg_alphas(cfg))[t].reshape(-1, 1, 1, 1)
        target = jnp.sqrt(a_t) * noise - jnp.sqrt(1.0 - a_t) * latents
    else:
        target = noise
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=8)
def _alphas_for(n_train_steps: int):
    # numpy on purpose: this is called inside jitted train steps, and a
    # cached jnp computation would capture (and leak) a tracer under
    # omnistaging; a np.ndarray is always a safe trace constant.
    import numpy as np

    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, n_train_steps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def cfg_alphas(cfg: StableDiffusionConfig):
    return _alphas_for(cfg.n_train_steps)


def make_optimizer(
    lr: float = 1e-4,
    warmup_steps: int = 1000,
    total_steps: int = 1_000_000,
    weight_decay: float = 1e-2,
    grad_clip: float = 1.0,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """Standard diffusion-training recipe: global-norm clip + AdamW with
    linear warmup into cosine decay.

    kind="adafactor" swaps in the factored-second-moment optimizer: the
    2x-params AdamW m/v state (6.9GB f32 for SD v1) drops to the row/
    column moment factors (~KBs per matrix), which buys ~7GB of HBM for
    batch on a single 16GB chip."""
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    if kind == "adafactor":
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adafactor(schedule, weight_decay_rate=weight_decay),
        )
    if kind != "adamw":
        raise ValueError(f"kind must be adamw|adafactor, got {kind!r}")
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


class MultiStepsState(NamedTuple):
    mini_step: jnp.ndarray      # int32, 0..every_k-1
    gradient_step: jnp.ndarray  # int32, completed optimizer steps
    inner_state: tuple
    acc_grads: dict             # gradient sum in accum_dtype


def multi_steps(inner: optax.GradientTransformation, every_k: int,
                accum_dtype=None) -> optax.GradientTransformation:
    """Gradient accumulation wrapper (optax.MultiSteps semantics: emit
    zero updates for every_k-1 calls, then one inner update on the mean
    gradient) with a controllable accumulator dtype.

    accum_dtype=bfloat16 halves the accumulator's HBM footprint AND the
    per-micro-step read+write traffic (for SD v1: 3.4GB f32 -> 1.7GB —
    the f32 accumulator is a measured +12% per micro-step, BENCHLOG).
    The running SUM is kept in accum_dtype; the mean is computed in f32
    before the inner (f32 master) update, so only the accumulation
    itself rounds: summing k<=8 same-scale gradients in bf16 loses
    ~2-3 of its 8 mantissa bits — noise relative to SGD minibatch
    variance (oracle bound: tests/test_training.py).

    accum_dtype=None accumulates in the gradients' own dtype (f32 here),
    matching optax.MultiSteps numerics.

    CAVEAT (measured 2026-08, axon v5e): at SD-v1 scale the
    accum_dtype=None configuration of THIS wrapper crashes the remote
    TPU compile helper (2/2 windows, both remat policies) while
    optax.MultiSteps' f32 graph compiles in the same windows
    (benchmarks/accum_bf16_ab.py vs accum_micro.py) — for full-size f32
    accumulation use optax.MultiSteps (finetune.run_finetune does).
    The bf16 configuration compiles and is the faster path anyway
    (248.9 -> 215.0 ms/micro-step at micro-batch 4, BENCHLOG r4).
    """
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    def _acc_like(params):
        return jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, accum_dtype or p.dtype), params)

    def init(params):
        return MultiStepsState(
            mini_step=jnp.zeros((), jnp.int32),
            gradient_step=jnp.zeros((), jnp.int32),
            inner_state=inner.init(params),
            acc_grads=_acc_like(params))

    def update(grads, state, params=None, **extra):
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), state.acc_grads, grads)
        final = state.mini_step == every_k - 1

        def do_update(_):
            mean = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.float32) / every_k, acc)
            updates, inner_state = inner.update(mean, state.inner_state,
                                                params, **extra)
            return updates, MultiStepsState(
                mini_step=jnp.zeros((), jnp.int32),
                gradient_step=state.gradient_step + 1,
                inner_state=inner_state,
                acc_grads=_acc_like(acc))

        def skip_update(_):
            updates = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), params)
            return updates, MultiStepsState(
                mini_step=state.mini_step + 1,
                gradient_step=state.gradient_step,
                inner_state=state.inner_state,
                acc_grads=acc)

        if every_k == 1:
            return do_update(None)
        return jax.lax.cond(final, do_update, skip_update, None)

    return optax.GradientTransformation(init, update)


def ema_update(ema_params, params, decay: float = 0.9999):
    """Exponential moving average of params (the weights SD ships)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def make_train_step(cfg: StableDiffusionConfig, optimizer: optax.GradientTransformation,
                    compute_dtype=jnp.float32, remat: bool | str = False,
                    accum: int = 1, ema_decay: float | None = None):
    """Returns train_step(unet_params, opt_state, batch, key) ->
    (params, opt_state, loss). batch = (latents, context) or
    (latents, context, ctx_valid).

    accum > 1: gradient accumulation - the batch is split into `accum`
    equal micro-batches scanned sequentially, gradients averaged in f32,
    ONE optimizer update. Activation memory scales with batch/accum while
    the optimizer sees the full effective batch; bitwise-equal t/noise
    draws vs accum=1 (both drawn full-batch up front), so the two
    configurations are numerically interchangeable up to f32 summation
    order.

    CAVEAT (measured 2026-08, axon v5e): at SD-v1 scale the remote TPU
    compile helper crashes (exit 1) on this scan - the XLA while loop
    carries the full ~700-leaf/3.4GB grads tree, which the server-side
    compiler does not survive at 860M params (SD_TINY compiles fine;
    remat / Pallas-vs-XLA / micro-batch size are all irrelevant). For
    full-size models use per-micro-batch stepping with
    optax.MultiSteps(opt, accum) and accum=1 here - the per-call graph
    is the plain step that compiles - which is exactly what
    finetune.run_finetune does.

    ema_decay set: the step also carries an EMA shadow of the params (the
    weights SD actually ships) - signature becomes
    train_step(params, opt_state, ema_params, batch, key) ->
    (params, opt_state, ema_params, loss). Folding the EMA into the
    jitted step makes it free of extra HBM round-trips vs a separate
    ema_update launch.
    """

    def loss_fn(p, latents, context, t, noise, ctx_valid):
        return diffusion_loss(p, cfg, latents, context, t, noise,
                              ctx_valid=ctx_valid,
                              compute_dtype=compute_dtype, remat=remat)

    def grads_of(params, latents, context, ctx_valid, t, noise):
        if accum == 1:
            return jax.value_and_grad(loss_fn)(
                params, latents, context, t, noise, ctx_valid)
        b = latents.shape[0]
        if b % accum:
            raise ValueError(f"batch {b} not divisible by accum {accum}")
        mb = b // accum

        def split(x):
            return None if x is None else x.reshape((accum, mb) + x.shape[1:])

        xs = tuple(split(a) for a in (latents, context, t, noise, ctx_valid))

        def body(carry, micro):
            loss_sum, g_sum = carry
            lat_i, ctx_i, t_i, n_i, v_i = micro
            loss, g = jax.value_and_grad(loss_fn)(
                params, lat_i, ctx_i, t_i, n_i, v_i)
            g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
            return (loss_sum + loss, g_sum), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (loss_sum, g_sum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zeros), xs)
        inv = 1.0 / accum
        return loss_sum * inv, jax.tree_util.tree_map(
            lambda g: g * inv, g_sum)

    def step_core(params, opt_state, batch, key):
        latents, context = batch[0], batch[1]
        ctx_valid = batch[2] if len(batch) > 2 else None
        kt, kn = jax.random.split(key)
        b = latents.shape[0]
        t = jax.random.randint(kt, (b,), 0, cfg.n_train_steps)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        loss, grads = grads_of(params, latents, context, ctx_valid, t, noise)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if ema_decay is None:
        return step_core

    def train_step_ema(params, opt_state, ema_params, batch, key):
        params, opt_state, loss = step_core(params, opt_state, batch, key)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, opt_state, ema_params, loss

    return train_step_ema
