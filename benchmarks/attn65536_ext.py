#!/usr/bin/env python
"""Extension of attn65536_sweep: probe the bq>=2048 corner that won the
first sweep (bq=2048,bk=2048 = 227.8ms vs 253.9 default) before wiring
a large-S dispatch default."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.attn65536_sweep import sweep  # noqa: E402


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    sweep("unet d40 bh16", 16, 65536, 40, 8, [
        (2048, 2048),   # first-sweep winner (re-measure same window)
        (2048, 1024),
        (2048, 4096),
        (4096, 1024),
        (4096, 2048),
        (512, 1024),    # current default (same-window baseline)
    ])


if __name__ == "__main__":
    main()
