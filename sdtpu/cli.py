"""CLI entry points, argv-compatible with the reference binaries.

sample  (reference: src/bin/sample/main.rs:36-114):
    sample <model_type(burn|dump|native|ckpt)> <model_name>
           <unconditional_guidance_scale> <n_diffusion_steps>
           <prompt> <output_image_name> [device(cpu|tpu|cuda|mps)]

convert (reference: src/bin/convert/main.rs:36-58):
    convert <dump_path> <model_name>           # npy tree -> native
    convert --ckpt <sd.ckpt> <model_name>      # torch ckpt -> native
    convert --mpk <model.mpk> <model_name>     # Burn NamedMpk -> native
    convert --to-dump <native> <dump_path>     # native -> npy tree
    convert --to-mpk <native> <mpk_path>       # native -> Burn NamedMpk

Extra (sdtpu-only) flags for `sample`: --seed N for reproducible latents
(the reference is unseeded, mod.rs:115-121), --preset sd-v1-4|sd-v1-5|
sd-v2-1, --bf16, --batch N, --negative "text" (replaces the empty-string
unconditional context in CFG), --init-image PATH [--strength F] for
img2img, --mask PATH (white = regenerate) for inpainting,
--lora ADAPTER.safetensors to apply a fine-tuned LoRA adapter,
--concept TI.safetensors to use a learned textual-inversion placeholder
(finetune --ti output) in the prompt, and --karras for Karras (2022)
sigma spacing on the sigma-ladder samplers (dpmpp/euler/euler_a/heun).

finetune (sdtpu-only, no reference equivalent — see finetune_main):
    finetune <model_type> <model_name> <data_dir|cache.npz> <out_model>
             [training flags]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _fail(msg: str) -> None:
    print(msg, file=sys.stderr)
    sys.exit(1)


def _select_device(device_arg):
    """Map the reference's device names onto JAX platforms. cuda/mps have
    no meaning on a TPU host; they select the default accelerator, cpu
    forces the CPU backend (must happen before backend init)."""
    import os

    import jax

    if device_arg and device_arg.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache, same location as bench.py: repeat CLI
    # runs skip the remote XLA compiles, and the background warm thread's
    # AOT compile seeds the cache for the main thread's jit path (the
    # two build the identical program), so the warm is not wasted even
    # though the CLI samples through the plain jit entry points.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("SDTPU_CACHE",
                                         "/tmp/sdtpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def load_model(model_type: str, model_name: str, preset: str = "sd-v1-4",
               compute_dtype=None, pad_context: bool = True):
    import jax.numpy as jnp

    from sdtpu.config import PRESETS
    from sdtpu.pipeline import StableDiffusion

    import os

    if preset not in PRESETS:
        _fail(f"Unknown preset: {preset} (choose from {', '.join(PRESETS)})")
    cfg = PRESETS[preset]
    if model_type != "dump" and not os.path.exists(model_name):
        _fail(f"Error loading model: file not found: {model_name}")
    if model_type == "dump":
        if not os.path.isdir(model_name):
            _fail(f"Error loading model dump: no such directory: {model_name}")
        from sdtpu.io.npy_tree import load_stable_diffusion_dump

        params = load_stable_diffusion_dump(model_name, cfg)
    elif model_type == "burn":
        from sdtpu.io.mpk import load_mpk

        params = load_mpk(model_name)
    elif model_type in ("native", "safetensors"):
        from sdtpu.io.native import load_native

        params, cfg = load_native(model_name)
    elif model_type == "ckpt":
        from sdtpu.io.ckpt import load_torch_ckpt

        params = load_torch_ckpt(model_name, cfg)
    else:
        _fail(f"Unknown model type: {model_type} (burn|dump|native|ckpt)")
    dtype = compute_dtype or jnp.float32
    return StableDiffusion(params, cfg, compute_dtype=dtype, pad_context=pad_context)


def sample_main(argv=None) -> None:
    argv = list(sys.argv if argv is None else argv)

    # sdtpu extras are flags so the positional surface stays identical
    seed = None
    preset = "sd-v1-4"
    bf16 = False
    batch = 1
    sampler = "ddim"
    negative = ""
    init_image = None
    strength = 0.75
    mask_path = None
    lora_path = None
    concept_path = None
    karras = False
    i = 1
    positional = [argv[0]]

    def flag_value(idx: int) -> str:
        # a value-taking flag as the final argument must produce a usage
        # message, not an IndexError (ADVICE r2)
        if idx + 1 >= len(argv):
            _fail(f"Error: {argv[idx]} requires a value")
        return argv[idx + 1]

    while i < len(argv):
        a = argv[i]
        if a == "--seed":
            seed = int(flag_value(i)); i += 2
        elif a == "--preset":
            preset = flag_value(i); i += 2
        elif a == "--bf16":
            bf16 = True; i += 1
        elif a == "--batch":
            batch = int(flag_value(i)); i += 2
        elif a == "--sampler":
            sampler = flag_value(i); i += 2
            if sampler not in ("ddim", "dpmpp", "euler", "euler_a", "heun"):
                _fail("Error: --sampler must be "
                      "ddim|dpmpp|euler|euler_a|heun")
            # --karras validity is checked after the full argv parse
        elif a == "--negative":
            negative = flag_value(i); i += 2
        elif a == "--init-image":
            init_image = flag_value(i); i += 2
        elif a == "--strength":
            strength = float(flag_value(i)); i += 2
        elif a == "--mask":
            mask_path = flag_value(i); i += 2
        elif a == "--lora":
            lora_path = flag_value(i); i += 2
        elif a == "--concept":
            concept_path = flag_value(i); i += 2
        elif a == "--karras":
            karras = True; i += 1
        else:
            positional.append(a); i += 1
    argv = positional

    if len(argv) not in (7, 8):
        _fail(
            f"Usage: {argv[0]} <model_type(burn or dump)> <model_name> "
            "<unconditional_guidance_scale> <n_diffusion_steps> <prompt> "
            "<output_image_name> [device(cuda, mps, cpu)]"
        )

    model_type, model_name = argv[1], argv[2]
    try:
        guidance_scale = float(argv[3])
    except ValueError:
        _fail("Error: Invalid unconditional guidance scale.")
    try:
        n_steps = int(argv[4])
    except ValueError:
        _fail("Error: Invalid number of diffusion steps.")
    prompt, output_name = argv[5], argv[6]
    if karras and sampler not in ("dpmpp", "euler", "euler_a", "heun"):
        _fail("Error: --karras needs --sampler dpmpp|euler|euler_a|heun")
    if concept_path is not None and init_image is not None:
        # fail in milliseconds, before tokenizer/model load (ADVICE r3)
        _fail("Error: --concept is not supported with --init-image")
    _select_device(argv[7] if len(argv) == 8 else None)

    import jax
    import jax.numpy as jnp

    from sdtpu.tokenizer import SimpleTokenizer
    from sdtpu.utils import profiling
    from sdtpu.utils.image import save_images

    # Cold-start overlap: AOT-compile + zero-execute the sampler/decode
    # graphs on a background thread while the weights load from disk and
    # upload — the compile needs only shapes (sdtpu/warm.py; the eager
    # reference pays no compile at all, so this is the path that keeps
    # first-image wall clock competitive). The CLI samples through the
    # plain jit entry points; the warm pays off via (a) the persistent
    # compile cache the AOT compile seeds (enabled in _select_device) and
    # (b) the server-side program load its zero-exec forces. Best-effort:
    # a preset/shape mismatch just wastes the warm compile; the real call
    # falls back to the jit path. Accelerator-only — on CPU the zero-exec
    # would COST a full 20-step UNet run. SDTPU_OVERLAP=0 disables.
    import os as _os

    if init_image is None and _os.environ.get("SDTPU_OVERLAP", "1") != "0":
        try:
            from sdtpu.config import PRESETS as _P
            from sdtpu.warm import NOISE_FREE_SAMPLERS, WarmStart

            if (sampler in NOISE_FREE_SAMPLERS
                    and jax.devices()[0].platform != "cpu"):
                WarmStart(_P[preset], batch=batch,
                          size=_P[preset].image_size,
                          compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
                          guidance_scale=guidance_scale, n_steps=n_steps,
                          sampler=sampler, karras_sigmas=karras).start()
                print("Warming sampler compile in the background...")
        except Exception:
            pass  # warm is an optimization, never a failure mode

    print("Loading tokenizer...")
    with profiling.phase("load_tokenizer"):
        tokenizer = SimpleTokenizer()
    print("Loading model...")
    with profiling.phase("load_model"):
        sd = load_model(model_type, model_name, preset,
                        compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    if lora_path is not None:
        # apply a LoRA adapter on top of the loaded weights (finetune
        # --lora-rank output); keeps the weight dtype, so bf16 stays bf16
        from sdtpu.lora import apply_lora, load_lora

        lora, scale, _meta = load_lora(lora_path)
        sd.params = {**sd.params,
                     "unet": apply_lora(sd.params["unet"], lora, scale)}
        print(f"Applied LoRA adapter {lora_path} (scale {scale:g})")

    print("Sampling image...")
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(seed) if seed is not None else None
    if concept_path is not None:
        # textual-inversion concept (finetune --ti output): swap in a
        # CLIP context built over the extended embedding table
        # (--concept + --init-image already rejected pre-load)
        from sdtpu.textual_inversion import generate_with_ti, load_ti

        emb, placeholder, _meta = load_ti(concept_path)
        if placeholder not in prompt:
            print(f"Warning: prompt does not contain the concept "
                  f"placeholder {placeholder!r}")
        images = generate_with_ti(
            sd, tokenizer, prompt, emb, guidance_scale, n_steps,
            n_images=batch, key=key, sampler=sampler,
            negative_prompt=negative, placeholder=placeholder,
            karras_sigmas=karras)
    elif init_image is not None:
        # img2img / inpaint: --init-image PATH [--strength F] [--mask PATH]
        from sdtpu.dataset import center_crop_resize, load_image_u8

        img = center_crop_resize(load_image_u8(init_image),
                                 sd.config.image_size)
        x = np.tile(img.astype(np.float32)[None] / 127.5 - 1.0,
                    (batch, 1, 1, 1))
        if mask_path is not None:
            # white (>=50% luma) pixels are REGENERATED, black kept
            m = center_crop_resize(load_image_u8(mask_path),
                                   sd.config.image_size)
            mask = np.tile((m.mean(axis=-1) > 127.5
                            ).astype(np.float32)[None], (batch, 1, 1))
            images = sd.inpaint(tokenizer, prompt, x, mask,
                                guidance_scale, n_steps, key=key,
                                sampler=sampler, karras_sigmas=karras,
                                negative_prompt=negative)
        else:
            images = sd.img2img(tokenizer, prompt, x, strength,
                                guidance_scale, n_steps, key=key,
                                sampler=sampler, karras_sigmas=karras,
                                negative_prompt=negative)
    else:
        images = sd.generate(tokenizer, prompt, guidance_scale, n_steps,
                             n_images=batch, key=key, sampler=sampler,
                             negative_prompt=negative, karras_sigmas=karras)
    dt = time.perf_counter() - t0
    with profiling.phase("save_png"):
        paths = save_images(images, output_name)
    print(f"Saved {paths} ({dt:.2f}s sampling, "
          f"{images.shape[0] / dt:.3f} images/sec)")
    if profiling.enabled():
        print(profiling.REGISTRY.report({
            "n_steps": n_steps, "batch": batch, "guidance_scale": guidance_scale,
            "device": str(jax.devices()[0]),
        }))


def finetune_main(argv=None) -> None:
    """sdtpu-only (the reference is inference-only):

    finetune <model_type> <model_name> <data_dir|cache.npz> <out_model>
             [--steps N] [--batch B] [--accum K] [--accum-bf16] [--lr F]
             [--ema DECAY] [--bf16] [--remat] [--remat-policy full|dots|heavy]
             [--opt adamw|adafactor] [--fast] [--save-every N]
             [--state-dir DIR] [--resume] [--preset P] [--seed N] [--tp N]
             [--device cpu|tpu] [--lora-rank R] [--lora-alpha A] [--flip]

    --fast applies the measured best-throughput full-finetune config
    (adafactor, batch 8, no remat: 29.1 img/s vs 20.7 for adamw/batch-4/
    heavy-remat on v5e-16GB, BENCHLOG r5); explicit flags override its
    pieces regardless of position.

    --lora-rank trains a LoRA adapter over the attention linears instead
    of the full UNet (sdtpu/lora.py); writes both the merged model and
    `<out_model>.lora.safetensors`.

    --ti "<placeholder>" [--ti-vectors N] [--ti-init TOKEN] [--ti-lr F]
    learns textual-inversion embedding rows instead of touching weights
    (sdtpu/textual_inversion.py); writes `<out_model>.ti.safetensors`
    for use with `sample --concept`.
    """
    argv = list(sys.argv if argv is None else argv)

    opts = {"steps": 100, "batch": 4, "accum": 1, "accum_bf16": False,
            "lr": 1e-5, "ema": None,
            "bf16": False, "remat": False, "opt": "adamw", "save_every": 0,
            "state_dir": None, "resume": False, "preset": "sd-v1-4",
            "seed": 0, "tp": 1, "device": None, "lora_rank": None,
            "lora_alpha": None, "flip": False, "ti": None, "ti_vectors": 1,
            "ti_init": None, "ti_lr": None}
    if "--fast" in argv:
        # measured fast-training preset (BENCHLOG r5 adafactor sweep):
        # the factored second moment frees AdamW's 6.9GB m/v, which buys
        # batch 8 with no remat — 29.1 img/s vs 20.7 for the r4
        # adamw/heavy config. Applied as new DEFAULTS before parsing, so
        # any explicit flag overrides its piece regardless of position.
        argv = [a for a in argv if a != "--fast"]
        opts.update({"opt": "adafactor", "batch": 8, "remat": False})
    i, positional = 1, [argv[0]]

    def flag_value(idx: int) -> str:
        if idx + 1 >= len(argv):
            _fail(f"Error: {argv[idx]} requires a value")
        return argv[idx + 1]

    while i < len(argv):
        a = argv[i]
        if a == "--steps":
            opts["steps"] = int(flag_value(i)); i += 2
        elif a == "--batch":
            opts["batch"] = int(flag_value(i)); i += 2
        elif a == "--accum":
            opts["accum"] = int(flag_value(i)); i += 2
        elif a == "--lr":
            opts["lr"] = float(flag_value(i)); i += 2
        elif a == "--ema":
            opts["ema"] = float(flag_value(i)); i += 2
        elif a == "--bf16":
            opts["bf16"] = True; i += 1
        elif a == "--remat":
            opts["remat"] = True; i += 1
        elif a == "--remat-policy":
            # full: recompute everything (min memory); dots/heavy: save
            # matmul (+conv) outputs, recompute only elementwise chains
            opts["remat"] = flag_value(i); i += 2
            if opts["remat"] not in ("full", "dots", "heavy"):
                _fail("Error: --remat-policy must be full|dots|heavy")
        elif a == "--accum-bf16":
            opts["accum_bf16"] = True; i += 1
        elif a == "--opt":
            opts["opt"] = flag_value(i); i += 2
            if opts["opt"] not in ("adamw", "adafactor"):
                _fail("Error: --opt must be adamw|adafactor")
        elif a == "--save-every":
            opts["save_every"] = int(flag_value(i)); i += 2
        elif a == "--state-dir":
            opts["state_dir"] = flag_value(i); i += 2
        elif a == "--resume":
            opts["resume"] = True; i += 1
        elif a == "--preset":
            opts["preset"] = flag_value(i); i += 2
        elif a == "--seed":
            opts["seed"] = int(flag_value(i)); i += 2
        elif a == "--tp":
            opts["tp"] = int(flag_value(i)); i += 2
        elif a == "--device":
            opts["device"] = flag_value(i); i += 2
        elif a == "--lora-rank":
            opts["lora_rank"] = int(flag_value(i)); i += 2
        elif a == "--lora-alpha":
            opts["lora_alpha"] = float(flag_value(i)); i += 2
        elif a == "--flip":
            opts["flip"] = True; i += 1
        elif a == "--ti":
            opts["ti"] = flag_value(i); i += 2
        elif a == "--ti-vectors":
            opts["ti_vectors"] = int(flag_value(i)); i += 2
        elif a == "--ti-init":
            opts["ti_init"] = flag_value(i); i += 2
        elif a == "--ti-lr":
            opts["ti_lr"] = float(flag_value(i)); i += 2
        else:
            positional.append(a); i += 1

    if len(positional) != 5:
        _fail(
            f"Usage: {positional[0]} <model_type(burn|dump|native|ckpt)> "
            "<model_name> <data_dir|cache.npz> <out_model> [flags]"
        )
    model_type, model_name, data, out_model = positional[1:5]
    _select_device(opts["device"])

    import jax.numpy as jnp

    from sdtpu.finetune import run_finetune
    from sdtpu.tokenizer import SimpleTokenizer
    from sdtpu.utils import profiling

    print("Loading tokenizer...")
    tokenizer = SimpleTokenizer()
    print("Loading model...")
    with profiling.phase("load_model"):
        sd = load_model(model_type, model_name, opts["preset"])

    if opts["ti"] is not None:
        # textual inversion: learn embedding rows for a placeholder word
        # instead of touching any model weights
        from sdtpu.finetune import run_textual_inversion

        print(f"Learning concept {opts['ti']!r} for {opts['steps']} steps "
              f"(batch {opts['batch']}, {opts['ti_vectors']} vectors)...")
        result = run_textual_inversion(
            sd, tokenizer, data, out_model,
            placeholder=opts["ti"], n_vectors=opts["ti_vectors"],
            init_token=opts["ti_init"], steps=opts["steps"],
            batch_size=opts["batch"],
            lr=opts["ti_lr"] if opts["ti_lr"] is not None else 5e-3,
            compute_dtype=jnp.bfloat16 if opts["bf16"] else jnp.float32,
            remat=opts["remat"], seed=opts["seed"],
        )
        print(f"Done: final loss {result['final_loss']:.5f}, "
              f"{result['steps_per_sec']:.2f} steps/sec, "
              f"concept at {result['out_path']}")
        return

    print(f"Fine-tuning for {opts['steps']} steps "
          f"(batch {opts['batch']}, accum {opts['accum']}, lr {opts['lr']})...")
    result = run_finetune(
        sd, tokenizer, data, out_model,
        steps=opts["steps"], batch_size=opts["batch"], accum=opts["accum"],
        accum_bf16=opts["accum_bf16"],
        lr=opts["lr"], ema_decay=opts["ema"], opt_kind=opts["opt"],
        compute_dtype=jnp.bfloat16 if opts["bf16"] else jnp.float32,
        remat=opts["remat"], tp=opts["tp"], seed=opts["seed"],
        save_every=opts["save_every"], state_dir=opts["state_dir"],
        resume=opts["resume"], lora_rank=opts["lora_rank"],
        lora_alpha=opts["lora_alpha"], flip=opts["flip"],
    )
    print(f"Done: final loss {result['final_loss']:.5f}, "
          f"{result['steps_per_sec']:.2f} steps/sec, "
          f"model at {result['out_path']}")


def convert_main(argv=None) -> None:
    argv = list(sys.argv if argv is None else argv)
    from sdtpu.config import PRESETS
    from sdtpu.io.native import load_native, save_native

    preset = "sd-v1-4"
    if "--preset" in argv:
        i = argv.index("--preset")
        preset = argv[i + 1]
        del argv[i : i + 2]
    cfg = PRESETS[preset]

    if len(argv) == 4 and argv[1] == "--ckpt":
        from sdtpu.io.ckpt import load_torch_ckpt

        params = load_torch_ckpt(argv[2], cfg)
        save_native(params, f"{argv[3]}.safetensors", cfg)
        print(f"Model saved to {argv[3]}.safetensors")
        return
    if len(argv) == 4 and argv[1] == "--mpk":
        # Burn NamedMpk -> native: the one ingest direction `sample burn`
        # could reach but convert could not (r5 review) — completes the
        # conversion matrix (every format to and from native)
        from sdtpu.io.mpk import load_mpk

        params = load_mpk(argv[2])
        save_native(params, f"{argv[3]}.safetensors", cfg)
        print(f"Model saved to {argv[3]}.safetensors")
        return
    if len(argv) == 4 and argv[1] == "--to-dump":
        from sdtpu.io.npy_tree import save_stable_diffusion_dump

        params, cfg = load_native(argv[2])
        save_stable_diffusion_dump(params, argv[3], cfg)
        print(f"Dump tree written to {argv[3]}")
        return
    if len(argv) == 4 and argv[1] == "--to-mpk":
        # the reference convert binary's sole output direction
        # (src/bin/convert/main.rs:32-37): emit a Burn NamedMpk record
        # the reference `sample burn` path can load
        from sdtpu.io.mpk import save_mpk

        params, cfg = load_native(argv[2])
        out = argv[3] if argv[3].endswith(".mpk") else f"{argv[3]}.mpk"
        save_mpk(params, out)
        print(f"Model saved to {out}")
        return
    if len(argv) != 3:
        _fail(f"Usage: {argv[0]} <dump_path> <model_name> | "
              f"{argv[0]} --ckpt <sd.ckpt> <model_name> | "
              f"{argv[0]} --mpk <model.mpk> <model_name> | "
              f"{argv[0]} --to-dump <native> <dump_path> | "
              f"{argv[0]} --to-mpk <native> <mpk_path>")

    from sdtpu.io.npy_tree import load_stable_diffusion_dump

    dump_path, model_name = argv[1], argv[2]
    params = load_stable_diffusion_dump(dump_path, cfg)
    save_native(params, f"{model_name}.safetensors", cfg)
    print(f"Model saved to {model_name}.safetensors")
