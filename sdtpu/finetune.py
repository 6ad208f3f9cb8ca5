"""End-to-end fine-tuning loop: dataset -> latent cache -> train -> model.

The reference is inference-only (SURVEY.md SS0: burn-autodiff is declared
but never imported); this module is sdtpu-only capability. It glues the
pieces the library already has into the loop a user actually runs:

    dataset.build_latent_cache   (VAE+CLIP encode once, cached npz)
    dataset.LatentBatches        (shuffled, host-prefetched device batches)
    training.make_train_step     (remat; accum via optax.MultiSteps
                                  micro-stepping - see its docstring for
                                  why not the in-jit scan at SD scale)
    io.checkpoint                (orbax train-state save/resume)
    io.native.save_native        (finetuned model -> .safetensors)

TPU mapping: only the UNet trains (standard SD fine-tune recipe; CLIP and
the VAE stay frozen, exactly the split the latent cache bakes in). Params
and optimizer state live donated on device; on a multi-device backend the
batch is dp-sharded over a Mesh and XLA emits the gradient psums -- the
same sharding rules the sampler and dryrun_multichip use.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sdtpu.config import StableDiffusionConfig
from sdtpu.dataset import LatentBatches, build_latent_cache, load_latent_cache
from sdtpu.io.checkpoint import restore_train_state, save_train_state
from sdtpu.io.native import save_native
from sdtpu.training import ema_update, make_optimizer, make_train_step


def resolve_cache(sd, tokenizer, data: str, batch: int = 8,
                  flip: bool = False) -> str:
    """`data` is either a prebuilt cache npz or a dataset directory; build
    (or reuse) the per-config cache next to the directory's images. A
    cache older than any image/caption in the directory is rebuilt."""
    if data.endswith(".npz"):
        if not os.path.exists(data):
            raise FileNotFoundError(f"latent cache not found: {data}")
        return data
    suffix = "_flip" if flip else ""
    cache = os.path.join(data, f"sdtpu_cache_{sd.config.name}{suffix}.npz")
    if os.path.exists(cache):
        cache_mtime = os.path.getmtime(cache)
        newest = max(os.path.getmtime(os.path.join(data, f))
                     for f in os.listdir(data)
                     if not f.startswith("sdtpu_cache_"))
        if newest <= cache_mtime:
            return cache
    build_latent_cache(sd, tokenizer, data, cache, batch=batch, flip=flip)
    return cache


def run_textual_inversion(
    sd,
    tokenizer,
    data_dir: str,
    out_path: str,
    *,
    placeholder: str = "<sks>",
    n_vectors: int = 1,
    init_token: Optional[str] = None,
    steps: int = 100,
    batch_size: int = 4,
    lr: float = 5e-3,
    compute_dtype=jnp.float32,
    remat: bool = False,
    seed: int = 0,
    log_every: int = 10,
    log: Callable[[str], None] = print,
) -> dict:
    """Learn `n_vectors` new CLIP token-embedding rows for `placeholder`
    from the images in `data_dir`; write an sdtpu-ti safetensors concept
    (loadable with `sample --concept`). The base checkpoint is untouched
    — the only trainable state is the [n_vectors, n_state] table rows
    (sdtpu/textual_inversion.py), so no optimizer-state or remat pressure.

    Returns {"steps", "final_loss", "losses", "out_path", "steps_per_sec"}.
    """
    import optax

    from sdtpu.textual_inversion import (init_ti_embeddings,
                                         make_ti_train_step,
                                         prepare_ti_data, save_ti)

    if data_dir.endswith(".npz"):
        raise ValueError(
            "textual inversion needs the raw image directory (captions are "
            "re-tokenized with the placeholder), not a latent cache")
    cfg: StableDiffusionConfig = sd.config
    latents, tokens, valid = prepare_ti_data(
        sd, tokenizer, data_dir, placeholder=placeholder,
        n_vectors=n_vectors, batch=min(8, max(batch_size, 1)))
    n = len(latents)
    log(f"dataset: {n} examples, placeholder {placeholder!r} "
        f"x{n_vectors} vectors")

    init_id = None
    if init_token is not None:
        ids = tokenizer.encode(init_token)
        if len(ids) != 1:
            raise ValueError(
                f"init token {init_token!r} must be a single BPE token "
                f"(got {len(ids)})")
        init_id = ids[0]
    new_emb = init_ti_embeddings(jax.random.PRNGKey(seed + 1),
                                 sd.params["clip"], n_vectors, init_id)

    opt = optax.adam(lr)  # the standard TI recipe: plain Adam, high lr
    opt_state = opt.init(new_emb)
    on_tpu = jax.default_backend() != "cpu"
    step_jit = jax.jit(
        make_ti_train_step(cfg, opt, compute_dtype=compute_dtype,
                           remat=remat),
        donate_argnums=(0, 1) if on_tpu else ())

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    losses = []
    t_start = time.perf_counter()
    for i in range(steps):
        idx = rng.choice(n, size=batch_size, replace=n < batch_size)
        batch = (jnp.asarray(latents[idx]), jnp.asarray(tokens[idx]),
                 jnp.asarray(valid[idx]))
        key, sub = jax.random.split(key)
        new_emb, opt_state, loss = step_jit(new_emb, opt_state, sd.params,
                                            batch, sub)
        # the LAST step's loss is always captured so final_loss is
        # meaningful for any log_every, including 0 (ADVICE r3)
        if (log_every and i % log_every == 0) or i + 1 == steps:
            loss_f = float(loss)
            losses.append((i, loss_f))
            if log_every:
                log(f"step {i + 1}/{steps} loss {loss_f:.5f}")
    dt = time.perf_counter() - t_start

    if not out_path.endswith(".safetensors"):
        out_path = f"{out_path}.ti.safetensors"
    save_ti(np.asarray(new_emb), out_path, placeholder, config_name=cfg.name)
    log(f"concept saved to {out_path}")
    return {
        "steps": steps,
        "final_loss": losses[-1][1] if losses else float("nan"),
        "losses": losses,
        "out_path": out_path,
        "steps_per_sec": steps / dt if dt > 0 else float("inf"),
    }


def run_finetune(
    sd,
    tokenizer,
    data: str,
    out_model: str,
    *,
    steps: int = 100,
    batch_size: int = 4,
    accum: int = 1,
    accum_bf16: bool = False,
    lr: float = 1e-5,
    warmup_steps: int = 0,
    weight_decay: float = 1e-2,
    grad_clip: float = 1.0,
    opt_kind: str = "adamw",
    ema_decay: Optional[float] = None,
    lora_rank: Optional[int] = None,
    lora_alpha: Optional[float] = None,
    flip: bool = False,
    compute_dtype=jnp.float32,
    remat: bool | str = False,
    tp: int = 1,
    seed: int = 0,
    save_every: int = 0,
    state_dir: Optional[str] = None,
    resume: bool = False,
    log_every: int = 10,
    log: Callable[[str], None] = print,
) -> dict:
    """Fine-tune `sd`'s UNet on `data`; write `<out_model>.safetensors`.

    Returns {"steps", "final_loss", "losses", "out_path", "steps_per_sec"}.
    """
    cfg: StableDiffusionConfig = sd.config
    cache = resolve_cache(sd, tokenizer, data, batch=min(8, batch_size),
                          flip=flip)
    latents, contexts, n_valid = load_latent_cache(cache)
    log(f"dataset: {len(latents)} examples from {cache}")

    devices = jax.devices()
    mesh = None
    unet_params = sd.params["unet"]
    # master params train in f32 regardless of the compute dtype
    unet_params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(p, jnp.float32), unet_params)
    stage = None
    if len(devices) > 1:
        from sdtpu.parallel import (make_mesh, param_shardings, shard_batch)

        mesh = make_mesh(dp=len(devices) // tp, tp=tp, devices=devices)
        if (batch_size // accum) % mesh.shape["dp"]:
            raise ValueError(
                f"micro-batch {batch_size}//{accum} must be divisible by "
                f"dp={mesh.shape['dp']} on a {len(devices)}-device backend")
        unet_params = jax.device_put(
            unet_params, param_shardings({"unet": unet_params}, mesh)["unet"])
        stage = lambda a: shard_batch(a, mesh)  # noqa: E731
        log(f"mesh: dp={mesh.shape['dp']} tp={mesh.shape['tp']}")

    if batch_size % accum:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"accum {accum}")
    if accum_bf16 and accum <= 1:
        # without accumulation there is no running gradient sum to keep
        # in bf16 — a silent no-op would make the flag look effective
        # (ADVICE r4)
        raise ValueError("--accum-bf16 has no effect without --accum k>1")
    micro_bs = batch_size // accum
    opt = make_optimizer(lr=lr, warmup_steps=warmup_steps, total_steps=steps,
                         weight_decay=weight_decay, grad_clip=grad_clip,
                         kind=opt_kind)
    if accum > 1:
        # per-micro-batch stepping: the accumulator averages `accum`
        # gradients then applies one inner update. Chosen over the in-jit
        # scan of training.make_train_step(accum=k) because the scanned
        # grads-tree carry crashes the remote TPU compiler at SD-v1 scale
        # (see the make_train_step docstring caveat). accum_bf16 keeps
        # the running gradient sum in bf16 (halves the accumulator HBM
        # traffic: f32 248.9 -> bf16 215.0 ms/micro-step at SD-v1
        # micro-batch 4, BENCHLOG r4). The f32 (accum_dtype=None) config
        # of training.multi_steps ALSO crashes the remote compiler at
        # SD-v1 scale (measured 2x, both remat policies, while
        # optax.MultiSteps' f32 graph compiles in the same windows —
        # benchmarks/accum_bf16_ab.py vs accum_micro.py), so the f32
        # route keeps the proven optax implementation.
        if accum_bf16:
            from sdtpu.training import multi_steps

            opt = multi_steps(opt, accum, accum_dtype=jnp.bfloat16)
        else:
            opt = optax.MultiSteps(opt, every_k_schedule=accum)

    # the trainable tree: the full UNet, or a LoRA adapter over its
    # attention linears (base frozen; optimizer state shrinks from GBs
    # to MBs, so much larger batches fit)
    lora_scale = None
    if lora_rank:
        from sdtpu.lora import (init_lora, lora_param_count,
                                make_lora_train_step)

        alpha = float(lora_alpha if lora_alpha is not None else lora_rank)
        lora_scale = alpha / lora_rank
        train_tree = init_lora(jax.random.PRNGKey(seed + 1), unet_params,
                               rank=lora_rank)
        log(f"LoRA rank {lora_rank} alpha {alpha:g}: "
            f"{lora_param_count(train_tree)/1e6:.2f}M adapter params")
        step_fn = make_lora_train_step(cfg, opt, lora_scale,
                                       compute_dtype=compute_dtype,
                                       remat=remat)
    else:
        train_tree = unet_params
        step_fn = make_train_step(cfg, opt, compute_dtype=compute_dtype,
                                  remat=remat)
    opt_state = opt.init(train_tree)
    ema_params = train_tree if ema_decay is not None else None

    step0 = 0
    if resume:
        if not (state_dir and os.path.isdir(state_dir)):
            raise FileNotFoundError(
                f"--resume: no train state at {state_dir!r}")
        try:
            if ema_params is not None:
                train_tree, opt_state, step0, ema_params = \
                    restore_train_state(state_dir,
                                        template=(train_tree, opt_state),
                                        ema=ema_params)
            else:
                train_tree, opt_state, step0 = restore_train_state(
                    state_dir, template=(train_tree, opt_state))
        except (ValueError, KeyError, TypeError) as e:
            # the opt_state pytree is part of the orbax template: states
            # saved under a different optimizer stack (e.g. f32-accum
            # states written by the brief training.multi_steps routing
            # before r4's optax.MultiSteps fix, or a different
            # --accum/--accum-bf16/--opt combination) fail the template
            # restore with an opaque tree mismatch (ADVICE r4). The same
            # exception types also cover a corrupt/truncated save, so
            # keep the underlying error in the message rather than
            # asserting the mismatch diagnosis.
            raise RuntimeError(
                f"--resume: failed to restore train state at "
                f"{state_dir!r} [{type(e).__name__}: {e}]. If these "
                f"flags (accum={accum}, accum_bf16={accum_bf16}, "
                f"opt={opt_kind}) differ from the ones the state was "
                f"saved under, resume with the original flags or restart "
                f"from the model checkpoint; if they match, the saved "
                f"state is likely incomplete or corrupt.") from e
        log(f"resumed step {step0} from {state_dir}")

    # EMA is applied host-side at optimizer-step boundaries (with accum>1
    # the params only change on every accum-th call; folding EMA into the
    # micro step would compound the decay accum times per update)
    # donation frees the previous params/opt/ema buffers in-place on TPU
    # (load-bearing for full-size models, BENCHLOG training notes); the
    # CPU backend can't donate and would warn every step, so skip there
    on_tpu = jax.default_backend() != "cpu"
    step_jit = jax.jit(step_fn, donate_argnums=(0, 1) if on_tpu else ())
    ema_jit = jax.jit(ema_update, donate_argnums=(0,) if on_tpu else (),
                      static_argnums=(2,))

    batches = LatentBatches(latents, contexts, n_valid,
                            batch_size=micro_bs, seed=seed, sharding=stage)
    key = jax.random.PRNGKey(seed)
    losses = []
    t_start = time.perf_counter()
    try:
        for micro in range(step0 * accum, steps * accum):
            key, sub = jax.random.split(key)
            batch = next(batches)
            if lora_rank:
                train_tree, opt_state, loss = step_jit(
                    train_tree, opt_state, unet_params, batch, sub)
            else:
                train_tree, opt_state, loss = step_jit(
                    train_tree, opt_state, batch, sub)
            if (micro + 1) % accum:
                continue  # optimizer boundary not reached yet
            i = (micro + 1) // accum - 1  # completed optimizer step index
            if ema_decay is not None:
                ema_params = ema_jit(ema_params, train_tree, ema_decay)
            if log_every and (i % log_every == 0 or i + 1 == steps):
                loss_f = float(loss)  # syncs; cadence bounded by log_every
                losses.append((i, loss_f))
                log(f"step {i + 1}/{steps} loss {loss_f:.5f}")
            if save_every and state_dir and (i + 1) % save_every == 0:
                save_train_state(state_dir, train_tree, opt_state, i + 1,
                                 ema=ema_params)
                log(f"train state saved at step {i + 1} -> {state_dir}")
    finally:
        batches.close()
    dt = time.perf_counter() - t_start
    final_loss = losses[-1][1] if losses else float("nan")

    final_tree = ema_params if ema_decay is not None else train_tree
    out_path = (out_model if out_model.endswith(".safetensors")
                else f"{out_model}.safetensors")
    lora_path = None
    if lora_rank:
        from sdtpu.lora import apply_lora, save_lora

        adapter = jax.tree_util.tree_map(np.asarray, final_tree)
        lora_path = out_path.replace(".safetensors", ".lora.safetensors")
        save_lora(adapter, lora_path, rank=lora_rank, alpha=alpha,
                  config_name=cfg.name)
        log(f"adapter saved to {lora_path}")
        # merge against the HOST-resident originals (np in, np out): only
        # the MB-scale adapter crosses the device boundary — fetching the
        # 3.4GB device tree through a tunneled TPU takes minutes
        host_base = jax.tree_util.tree_map(
            lambda p: np.asarray(p, np.float32), sd.params["unet"])
        host_unet = apply_lora(host_base, adapter, lora_scale)
    else:
        host_unet = jax.tree_util.tree_map(np.asarray, final_tree)
    full = dict(sd.params)
    full["unet"] = host_unet
    save_native(full, out_path, cfg)
    log(f"model saved to {out_path}")
    n_run = max(steps - step0, 1)
    return {
        "steps": steps,
        "final_loss": final_loss,
        "losses": losses,
        "out_path": out_path,
        "lora_path": lora_path,
        "steps_per_sec": n_run / dt if dt > 0 else float("inf"),
    }
