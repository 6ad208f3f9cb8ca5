#!/usr/bin/env python
"""Text-to-image CLI, argv-compatible with the reference `sample` binary
(reference: src/bin/sample/main.rs:39):

    python sample.py <burn|dump|native|ckpt> <model> <cfg_scale> <n_steps> \
        <prompt> <out_name> [device]
"""
from sdtpu.cli import sample_main

if __name__ == "__main__":
    sample_main()
