#!/usr/bin/env python
"""Weight converter CLI (reference: src/bin/convert/main.rs:45):

    python convert.py <dump_path> <model_name>        # npy tree -> native
    python convert.py --ckpt <sd.ckpt> <model_name>   # torch ckpt -> native
    python convert.py --to-dump <native> <dump_path>  # native -> npy tree
"""
from sdtpu.cli import convert_main

if __name__ == "__main__":
    convert_main()
