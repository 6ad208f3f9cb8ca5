"""Training subsystem tests (CPU, tiny model, 8-device virtual mesh):
loss decrease on an overfit batch, gradient-accumulation equivalence,
in-step EMA math, dataset -> latent-cache -> prefetched-batch pipeline,
train-state save/resume (incl. EMA), and the finetune CLI end-to-end.

The reference is inference-only (SURVEY.md §0: burn-autodiff declared,
never imported) — all capability here is sdtpu-only; tests pin sdtpu's
own documented semantics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdtpu.dataset import (LatentBatches, build_latent_cache,
                           center_crop_resize, load_latent_cache)
from sdtpu.pipeline import StableDiffusion
from sdtpu.tokenizer import SimpleTokenizer
from sdtpu.training import ema_update, make_optimizer, make_train_step

from test_pipeline import TINY, tiny_params


@pytest.fixture(scope="module")
def sd():
    return StableDiffusion(tiny_params(), TINY)


@pytest.fixture(scope="module")
def tokenizer():
    return SimpleTokenizer()


def _fixed_batch(b=4, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    hw = TINY.latent_size
    latents = jax.random.normal(k1, (b, hw, hw, 4), jnp.float32)
    context = jax.random.normal(k2, (b, 7, TINY.unet.context_dim), jnp.float32)
    return latents, context


def test_loss_decreases_overfit():
    params = tiny_params()["unet"]
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(TINY, opt))
    batch = _fixed_batch()
    losses = []
    for i in range(25):
        params, opt_state, loss = step(
            params, opt_state, batch, jax.random.PRNGKey(7))  # fixed noise
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses


def test_grad_accum_equivalence():
    """accum=k must match accum=1 on the same batch/key: identical t and
    noise draws (both full-batch up front) and AVERAGED grads. SGD(1.0)
    on purpose: the param delta then IS the gradient, so the comparison
    tests exactly what accumulation must preserve. (Adam would amplify
    f32 summation-order jitter on near-zero grads to lr-scale param
    diffs — m/sqrt(v) is ~sign(g) — which is noise, not a bug.)"""
    params = tiny_params()["unet"]
    opt = optax.sgd(1.0)
    batch = _fixed_batch(b=4)
    key = jax.random.PRNGKey(3)

    outs = {}
    for accum in (1, 2, 4):
        step = jax.jit(make_train_step(TINY, opt, accum=accum))
        p, s, loss = step(params, opt.init(params), batch, key)
        outs[accum] = (p, float(loss))
    p1, l1 = outs[1]
    for accum in (2, 4):
        pa, la = outs[accum]
        assert abs(la - l1) < 1e-5, (accum, la, l1)
        flat1 = jax.tree_util.tree_leaves(p1)
        flata = jax.tree_util.tree_leaves(pa)
        for a, b in zip(flat1, flata):
            # grads are O(1e-3); a sum-instead-of-mean bug shifts params
            # by full grad magnitude, far outside this band
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_multisteps_micro_stepping_matches_mean_grad():
    """run_finetune's accum strategy (optax.MultiSteps + per-micro-batch
    calls; chosen because the in-jit scan crashes the remote TPU compiler
    at SD scale — training.make_train_step docstring): the first micro
    call must leave params untouched, the accum-th call must apply the
    MEAN of the micro gradients."""
    from sdtpu.training import diffusion_loss

    params = tiny_params()["unet"]
    opt = optax.MultiSteps(optax.sgd(1.0), every_k_schedule=2)
    step = jax.jit(make_train_step(TINY, opt))
    micro1, micro2 = _fixed_batch(b=2, seed=1), _fixed_batch(b=2, seed=2)
    key_a, key_b = jax.random.PRNGKey(10), jax.random.PRNGKey(11)

    def manual_grad(batch, key):
        # replicate step_core's internal draws exactly
        latents, context = batch
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (latents.shape[0],), 0,
                               TINY.n_train_steps)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        return jax.grad(lambda p: diffusion_loss(
            p, TINY, latents, context, t, noise))(params)

    p1, o1, _ = step(params, opt.init(params), micro1, key_a)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p2, o2, _ = step(p1, o1, micro2, key_b)
    g1, g2 = manual_grad(micro1, key_a), manual_grad(micro2, key_b)
    for p0, pn, a, b in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(p2),
                            jax.tree_util.tree_leaves(g1),
                            jax.tree_util.tree_leaves(g2)):
        want = np.asarray(p0) - (np.asarray(a) + np.asarray(b)) / 2.0
        np.testing.assert_allclose(np.asarray(pn), want,
                                   rtol=1e-5, atol=1e-7)


def test_remat_policies_match_no_remat():
    """remat=True/"dots"/"heavy" change WHAT is stored for the backward
    pass, never the math: loss and gradients must match remat=False
    (same trace, f32, CPU). Pins the checkpoint_name tags in ops/conv.py
    and ops/attention.py + the policy map (models/unet.py:_remat_policy)."""
    from sdtpu.training import diffusion_loss

    params = tiny_params()["unet"]
    latents, context = _fixed_batch(b=2)
    t = jnp.array([3, 7], jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(9), latents.shape,
                              jnp.float32)

    def lg(remat):
        return jax.jit(jax.value_and_grad(lambda p: diffusion_loss(
            p, TINY, latents, context, t, noise, remat=remat)))(params)

    l_ref, g_ref = lg(False)
    for remat in (True, "full", "dots", "heavy"):
        l, g = lg(remat)
        assert abs(float(l) - float(l_ref)) < 1e-6, remat
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=remat)


def test_remat_invalid_policy_raises():
    from sdtpu.models.unet import _remat_policy

    with pytest.raises(ValueError, match="remat must be"):
        _remat_policy("everything")


def test_multi_steps_matches_optax_and_bf16_is_close():
    """training.multi_steps is a drop-in for optax.MultiSteps in
    run_finetune: f32 accumulation must match optax.MultiSteps exactly
    (same mean-gradient update, params untouched mid-cycle); the bf16
    accumulator must land within bf16 rounding (~2^-8 relative) of it."""
    from sdtpu.training import multi_steps

    params = tiny_params()["unet"]
    micro1, micro2 = _fixed_batch(b=2, seed=1), _fixed_batch(b=2, seed=2)
    key_a, key_b = jax.random.PRNGKey(10), jax.random.PRNGKey(11)

    def run(opt):
        step = jax.jit(make_train_step(TINY, opt))
        p1, o1, _ = step(params, opt.init(params), micro1, key_a)
        p2, o2, _ = step(p1, o1, micro2, key_b)
        return p1, p2, o2

    p1_ref, p2_ref, _ = run(optax.MultiSteps(optax.sgd(1.0),
                                             every_k_schedule=2))
    p1_f32, p2_f32, o_f32 = run(multi_steps(optax.sgd(1.0), 2))
    # mid-cycle: params bit-identical to the input tree
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p1_f32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(o_f32.gradient_step) == 1 and int(o_f32.mini_step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(p2_ref),
                    jax.tree_util.tree_leaves(p2_f32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    _, p2_bf16, _ = run(multi_steps(optax.sgd(1.0), 2,
                                    accum_dtype=jnp.bfloat16))
    for p0, a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2_ref),
                        jax.tree_util.tree_leaves(p2_bf16)):
        # the applied update (p - p0) may round at bf16 granularity;
        # bound the update ERROR by ~2^-7 of the update magnitude + eps
        upd_ref = np.asarray(a) - np.asarray(p0)
        upd_b16 = np.asarray(b) - np.asarray(p0)
        err = np.abs(upd_b16 - upd_ref)
        # each accumulation rounds relative to the MAGNITUDES being
        # summed (which may cancel), so bound by the leaf's update scale
        bound = np.abs(upd_ref).max() * 2.0 ** -7 + 1e-7
        assert (err <= bound).all(), float((err - bound).max())


def test_accum_rejects_indivisible_batch():
    step = jax.jit(make_train_step(TINY, optax.adam(1e-3), accum=3))
    params = tiny_params()["unet"]
    with pytest.raises(ValueError, match="not divisible"):
        step(params, optax.adam(1e-3).init(params), _fixed_batch(b=4),
             jax.random.PRNGKey(0))


def test_ema_in_step_matches_formula():
    params = tiny_params()["unet"]
    opt = optax.adam(1e-3)
    batch = _fixed_batch()
    key = jax.random.PRNGKey(5)

    plain = jax.jit(make_train_step(TINY, opt))
    p_ref, _, loss_ref = plain(params, opt.init(params), batch, key)

    ema_step = jax.jit(make_train_step(TINY, opt, ema_decay=0.5))
    p_new, _, ema, loss = ema_step(params, opt.init(params), params,
                                   batch, key)
    assert abs(float(loss) - float(loss_ref)) < 1e-6
    want = ema_update(params, p_new, 0.5)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_v_prediction_loss_target():
    """v-objective oracle: loss must be MSE against
    v = sqrt(a_t)·eps − sqrt(1−a_t)·x0 (SD v2.1-768 target), computed
    here independently from the same q-sampled input."""
    import dataclasses

    from sdtpu.models.unet import unet_apply
    from sdtpu.ops.dispatch import force_xla
    from sdtpu.training import cfg_alphas, diffusion_loss, q_sample

    cfg_v = dataclasses.replace(TINY, prediction_type="v")
    params = tiny_params()["unet"]
    latents, context = _fixed_batch(b=2)
    t = jnp.asarray([3, 700], jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(8), latents.shape)

    got = float(diffusion_loss(params, cfg_v, latents, context, t, noise))

    alphas = jnp.asarray(cfg_alphas(TINY))
    x_t = q_sample(latents, noise, alphas, t)
    with force_xla(allow_differentiable=True):
        pred = unet_apply(params, x_t, t, context, TINY.unet)
    a_t = alphas[t].reshape(-1, 1, 1, 1)
    v = jnp.sqrt(a_t) * noise - jnp.sqrt(1.0 - a_t) * latents
    want = float(jnp.mean((pred - v) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ctx_valid_batch_masks_keys():
    """A (latents, context, valid) batch must reproduce the loss of the
    physically-truncated context (mask parity, pipeline.py context())."""
    params = tiny_params()["unet"]
    opt = optax.adam(1e-3)
    latents, context = _fixed_batch(b=2)
    key = jax.random.PRNGKey(9)
    step = jax.jit(make_train_step(TINY, opt))

    n_keep = 5
    valid = jnp.arange(context.shape[1])[None, :] < n_keep
    valid = jnp.broadcast_to(valid, context.shape[:2])
    _, _, loss_masked = step(params, opt.init(params),
                             (latents, context, valid), key)
    _, _, loss_trunc = step(params, opt.init(params),
                            (latents, context[:, :n_keep]), key)
    np.testing.assert_allclose(float(loss_masked), float(loss_trunc),
                               rtol=1e-5)


# --------------------------------------------------------------- dataset


def _write_dataset(tmp_path, n=3, size=40):
    from sdtpu.utils.image import save_png

    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 256, (size, size - 4, 3), np.uint8)
        save_png(img, str(tmp_path / f"img{i}.png"))
        if i < n - 1:  # last example: no caption -> unconditional
            (tmp_path / f"img{i}.txt").write_text(f"a photo number {i}")
    return str(tmp_path)


def test_center_crop_resize():
    img = np.arange(48 * 40 * 3, dtype=np.uint8).reshape(48, 40, 3)
    out = center_crop_resize(img, 32)
    assert out.shape == (32, 32, 3)
    same = center_crop_resize(np.zeros((32, 32, 3), np.uint8), 32)
    assert same.shape == (32, 32, 3)


def test_build_latent_cache_and_load(tmp_path, sd, tokenizer):
    data_dir = _write_dataset(tmp_path)
    cache = build_latent_cache(sd, tokenizer, data_dir,
                               str(tmp_path / "cache.npz"), batch=2)
    latents, contexts, n_valid = load_latent_cache(cache)
    hw = TINY.latent_size
    assert latents.shape == (3, hw, hw, 4)
    assert contexts.shape == (3, TINY.clip.n_ctx, TINY.clip.n_state)
    assert n_valid.dtype == np.int32 and (n_valid >= 2).all()

    # latents are scaled into the sampler's latent space: re-encode
    # example 0 by hand through the pipeline API and compare
    from sdtpu.dataset import load_image_u8

    img = center_crop_resize(
        load_image_u8(os.path.join(data_dir, "img0.png")), TINY.image_size)
    x = img.astype(np.float32)[None] / 127.5 - 1.0
    # pad to the cache's jitted batch of 2 like build_latent_cache does
    x2 = np.concatenate([x, np.zeros_like(x)])
    want = np.asarray(sd.encode_image(x2))[0] * TINY.latent_scale
    np.testing.assert_allclose(latents[0], want, rtol=1e-5, atol=1e-6)


def test_build_latent_cache_flip(tmp_path, sd, tokenizer):
    """flip=True doubles the cache; the mirrored latent equals encoding
    the mirrored PIXELS (a latent-space flip would be wrong under the
    VAE's asymmetric padding — that's the point of encoding both)."""
    data_dir = _write_dataset(tmp_path, n=2)
    cache = build_latent_cache(sd, tokenizer, data_dir,
                               str(tmp_path / "cache_flip.npz"),
                               batch=2, flip=True)
    latents, contexts, n_valid = load_latent_cache(cache)
    assert latents.shape[0] == 4 and contexts.shape[0] == 4

    from sdtpu.dataset import load_image_u8

    img = center_crop_resize(
        load_image_u8(os.path.join(data_dir, "img0.png")), TINY.image_size)
    x = np.stack([img, img[:, ::-1]]).astype(np.float32) / 127.5 - 1.0
    want = np.asarray(sd.encode_image(x)) * TINY.latent_scale
    np.testing.assert_allclose(latents[2], want[1], rtol=1e-5, atol=1e-6)
    # mirrored copies share the caption context
    np.testing.assert_array_equal(contexts[0], contexts[2])
    # and the mirror's latent is NOT a latent-space flip of the original
    assert not np.allclose(latents[2], latents[0][:, ::-1], atol=1e-3)


def test_resolve_cache_staleness(tmp_path, sd, tokenizer):
    from sdtpu.finetune import resolve_cache

    data_dir = _write_dataset(tmp_path, n=2)
    c1 = resolve_cache(sd, tokenizer, data_dir, batch=2)
    m1 = os.path.getmtime(c1)
    assert resolve_cache(sd, tokenizer, data_dir, batch=2) == c1
    assert os.path.getmtime(c1) == m1  # reused, not rebuilt

    # touching an image invalidates the cache
    os.utime(os.path.join(data_dir, "img0.png"),
             (m1 + 10, m1 + 10))
    resolve_cache(sd, tokenizer, data_dir, batch=2)
    assert os.path.getmtime(c1) > m1  # rebuilt


def test_latent_batches_shapes_and_determinism():
    rng = np.random.default_rng(1)
    lat = rng.standard_normal((3, 8, 8, 4)).astype(np.float32)
    ctx = rng.standard_normal((3, 7, 16)).astype(np.float32)
    nv = np.asarray([3, 5, 7], np.int32)

    def take(n, **kw):
        it = LatentBatches(lat, ctx, nv, batch_size=4, seed=42, **kw)
        try:
            return [next(it) for _ in range(n)]
        finally:
            it.close()

    a = take(3, device=False)
    b = take(3, device=False)
    for (la, ca, va), (lb, cb, vb) in zip(a, b):
        assert la.shape == (4, 8, 8, 4) and ca.shape == (4, 7, 16)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(va, vb)

    # device path: n_valid becomes a [B, S] key mask
    (dl, dc, dv), = take(1)
    assert dv.shape == (4, 7) and dv.dtype == jnp.bool_.dtype
    assert int(dv[0].sum()) in (3, 5, 7)


# ------------------------------------------------------- resume + CLI


def test_train_state_ema_roundtrip(tmp_path):
    from sdtpu.io.checkpoint import restore_train_state, save_train_state

    params = tiny_params()["unet"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    ema = jax.tree_util.tree_map(lambda p: p * 0.5, params)
    path = str(tmp_path / "state")
    save_train_state(path, params, opt_state, 17, ema=ema)
    p2, o2, step, e2 = restore_train_state(
        path, template=(params, opt_state), ema=ema)
    assert step == 17
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(e2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_finetune_and_resume(tmp_path, sd, tokenizer):
    from sdtpu.finetune import run_finetune

    data_dir = _write_dataset(tmp_path)
    state_dir = str(tmp_path / "state")
    logs = []
    r1 = run_finetune(
        sd, tokenizer, data_dir, str(tmp_path / "model_a"),
        steps=2, batch_size=8, lr=1e-3, ema_decay=0.9, seed=0,
        save_every=2, state_dir=state_dir, log_every=1, log=logs.append)
    assert os.path.isdir(state_dir)
    assert np.isfinite(r1["final_loss"])
    assert any("loss" in line for line in logs)

    r2 = run_finetune(
        sd, tokenizer, data_dir, str(tmp_path / "model_b"),
        steps=4, batch_size=8, lr=1e-3, ema_decay=0.9, seed=0,
        state_dir=state_dir, resume=True, log_every=1, log=logs.append)
    assert any("resumed step 2" in line for line in logs)
    assert os.path.exists(r2["out_path"])

    # the written model loads back through the native reader and its
    # UNet differs from the base (it trained), other trees are intact
    from sdtpu.io.native import load_native

    params2, cfg2 = load_native(r2["out_path"])
    assert cfg2.name == TINY.name
    base_leaf = np.asarray(
        jax.tree_util.tree_leaves(sd.params["unet"])[0])
    new_leaf = np.asarray(jax.tree_util.tree_leaves(params2["unet"])[0])
    assert not np.array_equal(base_leaf, new_leaf)


def test_accum_bf16_without_accum_rejected(tmp_path, sd, tokenizer):
    """--accum-bf16 with accum==1 would silently be a no-op (the whole
    accumulator branch is gated on accum>1) — it must raise instead
    (ADVICE r4)."""
    from sdtpu.finetune import run_finetune

    data_dir = _write_dataset(tmp_path)
    with pytest.raises(ValueError, match="accum-bf16"):
        run_finetune(sd, tokenizer, data_dir, str(tmp_path / "m"),
                     steps=1, batch_size=8, accum=1, accum_bf16=True,
                     log=lambda s: None)


def test_resume_optimizer_mismatch_message(tmp_path, sd, tokenizer):
    """Resuming a train state under a different optimizer stack (here:
    accum=1 state resumed with accum=2, which wraps the optimizer in
    optax.MultiSteps and changes the opt_state pytree) must fail with a
    message naming the configuration, not an opaque orbax tree mismatch
    (ADVICE r4)."""
    from sdtpu.finetune import run_finetune

    data_dir = _write_dataset(tmp_path)
    state_dir = str(tmp_path / "state_mm")
    run_finetune(sd, tokenizer, data_dir, str(tmp_path / "m1"),
                 steps=2, batch_size=8, save_every=2, state_dir=state_dir,
                 log=lambda s: None)
    # the message must name the flags without ASSERTING the mismatch
    # diagnosis (the same exception types also cover corrupt saves)
    with pytest.raises(RuntimeError,  # (?s): the embedded cause spans lines
                       match=r"(?s)failed to restore.*accum=2"):
        run_finetune(sd, tokenizer, data_dir, str(tmp_path / "m2"),
                     steps=4, batch_size=16, accum=2, state_dir=state_dir,
                     resume=True, log=lambda s: None)


def test_finetune_cli_smoke(tmp_path, capsys):
    from sdtpu.cli import finetune_main
    from sdtpu.io.native import save_native

    model_path = str(tmp_path / "base.safetensors")
    save_native(tiny_params(), model_path, TINY)
    data_path = tmp_path / "data"
    data_path.mkdir()
    data_dir = _write_dataset(data_path, n=2)
    out = str(tmp_path / "tuned")
    finetune_main([
        "finetune", "native", model_path, data_dir, out,
        "--steps", "2", "--batch", "8", "--lr", "1e-3", "--seed", "1",
    ])
    captured = capsys.readouterr()
    assert "Done: final loss" in captured.out
    assert os.path.exists(out + ".safetensors")


def test_overfit_reproduces_training_image(sd, tokenizer):
    """End-to-end learning proof beyond loss-decrease (VERDICT r3 task
    6): overfit the UNet on ONE image until generate() reproduces it.

    Target = the VAE round-trip of the training image (the frozen random
    VAE bounds what ANY latent-space training can reproduce). Two knobs
    make the tiny random model actually reach it (measured 2026-08):
    - latent_scale is CALIBRATED to unit latent RMS, exactly what the
      0.18215 constant does for the real SD VAE. The random tiny VAE
      encodes at RMS ~0.19, so the stock scale leaves the target 30x
      below the sampler's noise floor and NO amount of training moves
      PSNR (loss 0.002 overfit, PSNR flat at 13dB).
    - v-prediction objective: eps-prediction amplifies model error by
      sqrt(1-a)/sqrt(a) at the x0 read-out; v keeps it O(1). Same
      sampler code path, config-driven (and this doubles as an
      end-to-end v-prediction train->sample test; eps training is
      covered by test_loss_decreases_overfit).
    Guidance 1.0, so the sampled model is exactly the trained
    conditional. Measured trajectory: PSNR 13.3 -> 26dB at 300 steps
    (29dB at 400)."""
    import dataclasses

    import optax

    yy, xx = np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32),
                         indexing="ij")
    img = np.stack([np.sin(3 * xx) * 0.6, yy * 0.5,
                    np.cos(2 * yy + xx) * 0.4], -1)[None].astype(np.float32)
    enc = np.asarray(sd.encode_image(jnp.asarray(img)))
    cfg = dataclasses.replace(
        TINY, prediction_type="v",
        latent_scale=float(1.0 / np.sqrt((enc ** 2).mean())))
    sdv = StableDiffusion(sd.params, cfg)
    z0 = enc * cfg.latent_scale
    target = sdv.latent_to_image(jnp.asarray(z0, jnp.float32))

    ctx, valid = sdv.context(tokenizer, "a mossy stone")
    b = 8
    batch = (jnp.tile(jnp.asarray(z0), (b, 1, 1, 1)),
             jnp.tile(ctx, (b, 1, 1)), jnp.tile(valid, (b, 1)))

    def psnr(a, bimg):
        mse = np.mean((a.astype(np.float32) - bimg.astype(np.float32)) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    def gen(unet_params):
        sd2 = StableDiffusion({**sdv.params, "unet": unet_params}, cfg)
        hw = cfg.latent_size
        lat = sd2.sample_latent(
            ctx, ctx, 1.0, 10,
            initial_latent=jax.random.normal(jax.random.PRNGKey(123),
                                             (1, hw, hw, 4)),
            ctx_valid=valid, uncond_valid=valid)
        return sd2.latent_to_image(lat)

    params = tiny_params(seed=3)["unet"]
    before = psnr(gen(params), target)

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt))
    key = jax.random.PRNGKey(0)
    for _ in range(300):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, batch, sub)
    assert np.isfinite(float(loss))

    after = psnr(gen(params), target)
    # untrained tiny UNet generates ~noise (~13dB); the trained one must
    # BOTH clear an absolute bar and beat its baseline by a wide margin
    assert after > before + 8.0, (before, after)
    assert after > 20.0, (before, after)


def test_adafactor_loss_decreases():
    """make_optimizer(kind="adafactor") — the `finetune --fast` optimizer
    (BENCHLOG r5: batch 8 no-remat, +40% over adamw/heavy at SD-v1
    scale) — must train: finite losses, clear decrease on an overfit
    batch, and a param tree that actually moved."""
    params = tiny_params()["unet"]
    opt = make_optimizer(lr=2e-3, warmup_steps=0, total_steps=25,
                         kind="adafactor")
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(TINY, opt))
    batch = _fixed_batch()
    losses = []
    p = params
    for _ in range(25):
        p, opt_state, loss = step(p, opt_state, batch, jax.random.PRNGKey(7))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # adafactor's relative step sizing descends slower than adam on this
    # tiny overfit (1.105 -> 0.909 over 25 steps, deterministic): gate
    # on a clear-but-achievable decrease
    assert np.mean(losses[-5:]) < 0.9 * np.mean(losses[:5]), losses
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, p)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
