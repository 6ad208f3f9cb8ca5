#!/usr/bin/env python
"""Real-weight parity harness.

The reference demonstrates correctness by producing an image from real SD
v1.4 weights (reference: README.md:26-38, img0.png) and left activation
probes sketched-but-commented at python/dump.py:603-634 and test.py:31-41.
This tool makes both executable the moment weights appear:

  # record activation probes + a fixed-latent end-to-end image
  python tools/parity.py record --ckpt sd-v1-4.ckpt --out probes/

  # compare another copy of the weights (any format) against a recording
  python tools/parity.py compare --dump SDv1-4_dump --ref probes/

  # prove the harness end-to-end on the bundled tiny preset (no weights
  # needed): random-init -> save native -> convert to dump -> reload via
  # the independent dump loader -> probes must match bit-for-bit
  python tools/parity.py selftest

Probes (all deterministic, f32, fixed seeds):
  clip_out   — CLIP context for the reference prompt's token ids
  unet_eps   — UNet epsilon at t=500 on a fixed latent + fixed context
  vae_dec    — VAE decode of a fixed latent
  vae_enc    — VAE encode of a fixed image
  image      — end-to-end 20-step DDIM sample from a FIXED initial latent
               (the reference's own latent is unseeded libtorch noise,
               mod.rs:115-121, so cross-implementation comparison is only
               meaningful with an injected latent — BASELINE.md note)

Weight sources: --ckpt (CompVis torch), --dump (reference npy tree),
--mpk (Burn NamedMpk), --native (sdtpu safetensors).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _force_cpu_if_asked(args):
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")


def load_params(args):
    from sdtpu.config import PRESETS, SD_V1_4

    cfg = PRESETS.get(args.preset, SD_V1_4)
    n = sum(x is not None for x in (args.ckpt, args.dump, args.mpk, args.native))
    if n != 1:
        raise SystemExit("give exactly one of --ckpt/--dump/--mpk/--native")
    if args.ckpt:
        from sdtpu.io.ckpt import load_torch_ckpt

        return load_torch_ckpt(args.ckpt, cfg), cfg
    if args.dump:
        from sdtpu.io import load_stable_diffusion_dump

        return load_stable_diffusion_dump(args.dump, cfg), cfg
    if args.mpk:
        from sdtpu.io.mpk import load_mpk

        return load_mpk(args.mpk), cfg
    from sdtpu.io import load_native

    params, file_cfg = load_native(args.native)
    return params, (file_cfg if args.preset == "auto" else cfg)


def run_probes(params, cfg, n_steps: int = 20):
    """Deterministic activation + image probes (f32 pipeline)."""
    import jax
    import jax.numpy as jnp

    from sdtpu.models.clip import clip_apply
    from sdtpu.models.unet import unet_apply
    from sdtpu.models.vae import decode_latent, encode_image
    from sdtpu.pipeline import StableDiffusion
    from sdtpu.tokenizer import SimpleTokenizer

    hw = cfg.latent_size
    img_hw = cfg.image_size
    probes = {}

    tok = SimpleTokenizer()
    sd = StableDiffusion(params, cfg)
    ctx, valid = sd.context(tok, "An ancient mossy stone.")
    probes["clip_out"] = np.asarray(ctx, np.float32)

    k = jax.random.PRNGKey(1234)
    k_lat, k_ctx, k_img = jax.random.split(k, 3)
    lat = jax.random.normal(k_lat, (1, hw, hw, 4), jnp.float32)

    eps = unet_apply(params["unet"], lat, jnp.asarray([500], jnp.int32),
                     ctx.astype(jnp.float32), cfg.unet)
    probes["unet_eps"] = np.asarray(eps, np.float32)

    probes["vae_dec"] = np.asarray(
        decode_latent(params["autoencoder"], lat, cfg.vae), np.float32)
    img = jax.random.uniform(k_img, (1, img_hw, img_hw, 3), jnp.float32,
                             -1.0, 1.0)
    probes["vae_enc"] = np.asarray(
        encode_image(params["autoencoder"], img, cfg.vae), np.float32)

    unctx, unvalid = sd.unconditional_context(tok)
    probes["image"] = sd.sample_image(
        ctx, unctx, 7.5, n_steps, initial_latent=lat,
        ctx_valid=valid, uncond_valid=unvalid,
    ).astype(np.float32)
    return probes


def cmd_record(args):
    _force_cpu_if_asked(args)
    params, cfg = load_params(args)
    probes = run_probes(params, cfg, args.steps)
    os.makedirs(args.out, exist_ok=True)
    np.savez(os.path.join(args.out, "probes.npz"), **probes)
    from sdtpu.utils.image import save_images

    save_images(probes["image"].astype(np.uint8), os.path.join(args.out, "probe"))
    print(f"Recorded {len(probes)} probes to {args.out}/probes.npz "
          f"(+ probe0.png)")


def compare_probes(got: dict, ref: dict, pixel_tol: float):
    """Returns (report dict, ok bool)."""
    report, ok = {}, True
    for name in sorted(ref.keys()):
        a, b = np.asarray(got[name]), np.asarray(ref[name])
        if a.shape != b.shape:
            report[name] = {"shape_mismatch": [list(a.shape), list(b.shape)]}
            ok = False
            continue
        adiff = np.abs(a - b)
        scale = float(np.max(np.abs(b))) or 1.0
        entry = {
            "max_abs": float(adiff.max()),
            "max_rel": float(adiff.max() / scale),
            "mean_abs": float(adiff.mean()),
        }
        if name == "image":
            entry["pixel_max_diff"] = float(adiff.max())
            entry["pct_pixels_off_by_gt1"] = float((adiff > 1.0).mean() * 100)
            if adiff.max() > pixel_tol:
                ok = False
        elif entry["max_rel"] > 5e-3:
            ok = False
        report[name] = entry
    return report, ok


def cmd_compare(args):
    _force_cpu_if_asked(args)
    params, cfg = load_params(args)
    got = run_probes(params, cfg, args.steps)
    ref = dict(np.load(os.path.join(args.ref, "probes.npz")))
    report, ok = compare_probes(got, ref, args.pixel_tol)
    print(json.dumps({"ok": ok, "probes": report}, indent=2))
    return 0 if ok else 1


def cmd_selftest(args):
    """Prove the harness: tiny random weights through two independent
    format paths (native safetensors writer+reader vs npy dump
    writer+reader) must produce identical probes."""
    import tempfile

    _force_cpu_if_asked(args)
    import jax

    from sdtpu.config import SD_TINY
    from sdtpu.diffusion import scaled_linear_alphas_cumprod
    from sdtpu.io import (
        load_native,
        load_stable_diffusion_dump,
        save_native,
        save_stable_diffusion_dump,
    )
    from sdtpu.models.clip import init_clip
    from sdtpu.models.unet import init_unet
    from sdtpu.models.vae import init_autoencoder

    cfg = SD_TINY
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "clip": init_clip(k1, cfg.clip),
        "unet": init_unet(k2, cfg.unet),
        "autoencoder": init_autoencoder(k3, cfg.vae),
        "alphas_cumprod": scaled_linear_alphas_cumprod(1000),
        "n_steps": 1000,
    }
    with tempfile.TemporaryDirectory() as td:
        save_native(params, f"{td}/m.safetensors", cfg)
        save_stable_diffusion_dump(params, f"{td}/dump", cfg)
        p1, _ = load_native(f"{td}/m.safetensors")
        p2 = load_stable_diffusion_dump(f"{td}/dump", cfg)
    pr1 = run_probes(p1, cfg, n_steps=5)
    pr2 = run_probes(p2, cfg, n_steps=5)
    report, ok = compare_probes(pr1, pr2, pixel_tol=0.0)
    worst = max(v.get("max_abs", 0.0) for v in report.values())
    print(json.dumps({"ok": ok, "worst_max_abs": worst, "probes": report},
                     indent=2))
    if not ok or worst != 0.0:
        raise SystemExit("selftest FAILED: format paths disagree")
    print("selftest OK: native and dump paths produce bit-identical probes")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add_src(p):
        p.add_argument("--ckpt"), p.add_argument("--dump")
        p.add_argument("--mpk"), p.add_argument("--native")
        p.add_argument("--preset", default="sd-v1-4")
        p.add_argument("--steps", type=int, default=20)
        p.add_argument("--cpu", action="store_true")

    pr = sub.add_parser("record", help="record probes from weights")
    add_src(pr)
    pr.add_argument("--out", required=True)
    pr.set_defaults(fn=cmd_record)

    pc = sub.add_parser("compare", help="compare weights against a recording")
    add_src(pc)
    pc.add_argument("--ref", required=True)
    pc.add_argument("--pixel-tol", type=float, default=1.0,
                    help="max allowed uint8 pixel diff for the image probe")
    pc.set_defaults(fn=cmd_compare)

    ps = sub.add_parser("selftest", help="prove the harness on sd-tiny")
    ps.add_argument("--cpu", action="store_true")
    ps.set_defaults(fn=cmd_selftest)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    return rc or 0


if __name__ == "__main__":
    raise SystemExit(main())
