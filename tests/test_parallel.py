"""Multi-chip tests on the virtual 8-device CPU mesh: dp sampling
equivalence, dp+tp train step execution, sharding rule sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from sdtpu.config import SD_TINY
from sdtpu.diffusion import scaled_linear_alphas_cumprod
from sdtpu.models.clip import init_clip
from sdtpu.models.unet import init_unet, unet_apply
from sdtpu.models.vae import init_autoencoder
from sdtpu.parallel import make_mesh, param_shardings, shard_batch, shard_params
from sdtpu.pipeline import StableDiffusion
from sdtpu.training import make_train_step


def tiny_params(seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {
        "clip": init_clip(k1, SD_TINY.clip),
        "unet": init_unet(k2, SD_TINY.unet),
        "autoencoder": init_autoencoder(k3, SD_TINY.vae),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        "n_steps": 1000,
    }


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharding_rules():
    mesh = make_mesh(dp=4, tp=2)
    params = {"unet": tiny_params()["unet"]}
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = { "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path): s.spec
              for path, s in flat }
    # column parallel on qkv; row parallel on out
    q = [v for k, v in specs.items() if k.endswith("attn1/query/w")]
    assert q and all(s == P(None, "tp") for s in q)
    o = [v for k, v in specs.items() if k.endswith("attn1/out/w")]
    assert o and all(s == P("tp", None) for s in o)
    # norms replicated
    g = [v for k, v in specs.items() if k.endswith("norm_out/g")]
    assert g and all(s == P() for s in g)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_sampling_matches_single_device(dp, tp):
    """Batch-8 sampling on a (dp, tp) mesh must equal the unsharded
    result — covers pure-dp, mixed, and tp-heavy (tp=4) layouts
    (VERDICT r3 task 7)."""
    params = tiny_params()
    sd = StableDiffusion(params, SD_TINY)
    latent0 = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (8, 77, 32))
    unctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    valid = jnp.ones((8, 77), bool).at[:, 5:].set(False)
    unvalid = jnp.ones((1, 77), bool).at[:, 2:].set(False)

    ref = sd.sample_latent(ctx, unctx, 7.5, 2, initial_latent=latent0,
                           ctx_valid=valid, uncond_valid=unvalid)

    mesh = make_mesh(dp=dp, tp=tp)
    sharded_params = shard_params(params, mesh)
    sd2 = StableDiffusion(sharded_params, SD_TINY)
    got = sd2.sample_latent(
        shard_batch(ctx, mesh), unctx, 7.5, 2,
        initial_latent=shard_batch(latent0, mesh),
        ctx_valid=shard_batch(valid, mesh), uncond_valid=unvalid)
    # values are O(40) after 2 steps from pure noise; rtol matters here
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=2e-4)


def test_make_mesh_rejects_idle_devices():
    """dp*tp must cover the devices: silent idling is a provisioning bug
    (VERDICT r3 weak #5)."""
    with pytest.raises(ValueError, match="idle"):
        make_mesh(dp=3, tp=2)
    with pytest.raises(ValueError, match="needs"):
        make_mesh(dp=5, tp=2)
    with pytest.raises(ValueError, match="does not divide"):
        make_mesh(tp=3)
    with pytest.warns(UserWarning, match="idle"):
        mesh = make_mesh(dp=2, tp=2, allow_idle=True)
    assert mesh.shape == {"dp": 2, "tp": 2}


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_train_step_dp_tp(dp, tp):
    """One jitted train step over a (dp, tp) mesh: loss finite, params
    updated, gradient psums handled by GSPMD."""
    mesh = make_mesh(dp=dp, tp=tp)
    params = tiny_params()["unet"]
    params = jax.device_put(params, param_shardings({"unet": params}, mesh)["unet"])

    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(SD_TINY, opt))

    latents = shard_batch(jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 4)), mesh)
    context = shard_batch(jax.random.normal(jax.random.PRNGKey(1), (8, 7, 32)), mesh)

    new_params, opt_state, loss = step(params, opt_state, (latents, context),
                                       jax.random.PRNGKey(2))
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0
    w0 = np.asarray(jax.tree_util.tree_leaves(params)[0])
    w1 = np.asarray(jax.tree_util.tree_leaves(new_params)[0])
    assert not np.array_equal(w0, w1)


def test_train_checkpoint_resume(tmp_path):
    """Save train state mid-run, restore onto a different mesh layout,
    continue training — losses stay finite and params match."""
    import numpy as np
    from sdtpu.io.checkpoint import restore_train_state, save_train_state
    from sdtpu.parallel import param_shardings

    mesh8 = make_mesh(dp=8, tp=1)
    params = tiny_params()["unet"]
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(SD_TINY, opt))

    latents = shard_batch(jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 4)), mesh8)
    context = shard_batch(jax.random.normal(jax.random.PRNGKey(1), (8, 7, 32)), mesh8)
    params, opt_state, _ = step_fn(params, opt_state, (latents, context),
                                   jax.random.PRNGKey(2))

    path = str(tmp_path / "ckpt")
    save_train_state(path, params, opt_state, step=1)

    mesh42 = make_mesh(dp=4, tp=2)
    shardings = param_shardings({"unet": params}, mesh42)["unet"]
    r_params, r_opt, step = restore_train_state(
        path, shardings=shardings, template=(params, opt_state))
    assert step == 1
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(params)[0]),
        np.asarray(jax.tree_util.tree_leaves(r_params)[0]))

    _, _, loss = step_fn(r_params, r_opt, (latents, context), jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_training_reduces_loss():
    """A few steps on a fixed batch should reduce the diffusion loss —
    integration check of loss + grads + optimizer together."""
    import numpy as np

    params = tiny_params()["unet"]
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(SD_TINY, opt))

    latents = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    context = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 32))
    losses = []
    for i in range(6):
        # fixed data AND fixed step key -> pure optimization progress
        params, opt_state, loss = step_fn(params, opt_state,
                                          (latents, context),
                                          jax.random.PRNGKey(42))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

def test_remat_train_step_matches_exact():
    """remat=True (block-granular jax.checkpoint) must be semantically
    invisible: same loss and same gradients as the exact backward (up to
    fp reassociation of the recomputed forward)."""
    import numpy as np

    from sdtpu.training import diffusion_loss

    params = tiny_params()["unet"]
    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    context = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    t = jnp.asarray([3, 500])
    noise = jax.random.normal(jax.random.PRNGKey(2), latents.shape)

    outs = {}
    for remat in (False, True):
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: diffusion_loss(p, SD_TINY, latents, context, t,
                                     noise, remat=remat)))(params)
        outs[remat] = (float(loss), grads)

    assert np.isclose(outs[False][0], outs[True][0], rtol=1e-6), (
        outs[False][0], outs[True][0])
    ge = jax.tree_util.tree_leaves(outs[False][1])
    gr = jax.tree_util.tree_leaves(outs[True][1])
    for x, y in zip(ge, gr):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max() + 1e-12
        np.testing.assert_allclose(y / scale, x / scale, atol=1e-5)


def test_training_forces_xla_dispatch(monkeypatch):
    """The training loss must trace the differentiable XLA path even when
    kernel dispatch would pick Pallas (the kernels are forward-only; on
    TPU an undiverted trace dies with 'Linearization failed')."""
    import sdtpu.ops.dispatch as dispatch
    from sdtpu.training import diffusion_loss

    # pretend we are on a Pallas-capable backend
    monkeypatch.setattr(dispatch, "_use_pallas_cached", lambda: True)
    assert dispatch.use_pallas()
    with dispatch.force_xla():
        assert not dispatch.use_pallas()

    params = tiny_params()["unet"]
    latents = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    context = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    t = jnp.asarray([3, 500])
    noise = jax.random.normal(jax.random.PRNGKey(2), latents.shape)
    # would crash on CPU inside a Pallas kernel (or on TPU inside the
    # VJP) if force_xla did not pin the gates during the loss trace
    loss, grads = jax.value_and_grad(
        lambda p: diffusion_loss(p, SD_TINY, latents, context, t, noise,
                                 remat=True))(params)
    assert np.isfinite(float(loss))
