#!/usr/bin/env python
"""Fine-tuning CLI (sdtpu-only capability — the reference is
inference-only, SURVEY.md §0):

    python finetune.py <burn|dump|native|ckpt> <model> <data_dir|cache.npz> \
        <out_model> [--steps N --batch B --accum K --lr F --ema D --bf16 \
                     --remat --opt adamw|adafactor --save-every N \
                     --state-dir DIR --resume --preset P --seed N --tp N]

The data directory holds <stem>.png (or .npy [H,W,3] u8) images with
optional <stem>.txt captions; VAE/CLIP encodings are cached to an npz on
first run.
"""
from sdtpu.cli import finetune_main

if __name__ == "__main__":
    finetune_main()
