#!/bin/bash
# Round-3 TPU session 2: up2x block A/B, 65536-token attention sweep,
# cold-compile attribution probe, bench jit-init validation.
cd /root/repo
echo "== up2x bh A/B ($(date +%H:%M:%S))"
timeout 1800 python benchmarks/up2x_bh_ab.py 2>/dev/null
echo "-- exit $?"
echo "== attn 65536 sweep ($(date +%H:%M:%S))"
timeout 3000 python benchmarks/attn65536_sweep.py 2>/dev/null
echo "-- exit $?"
echo "== cold probe, empty cache ($(date +%H:%M:%S))"
rm -rf /tmp/sdtpu_probe_cache
timeout 1800 python benchmarks/cold_compile_probe.py 2>/dev/null
echo "-- exit $?"
echo "== cold probe, warm cache ($(date +%H:%M:%S))"
timeout 1800 python benchmarks/cold_compile_probe.py 2>/dev/null
echo "-- exit $?"
echo "== bench 512 (jit-init validation) ($(date +%H:%M:%S))"
timeout 2400 python bench.py 2>/dev/null
echo "-- exit $?"
echo "ALL DONE ($(date +%H:%M:%S))"
