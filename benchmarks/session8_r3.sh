#!/bin/bash
cd /root/repo
echo "== serve micro, pipelined readback ($(date +%H:%M:%S))"
timeout 3600 python benchmarks/serve_micro.py 2>/dev/null
echo "-- exit $?"
echo "== DDIM-50 batch4 (BASELINE cfg 3) ($(date +%H:%M:%S))"
timeout 2400 env SDTPU_BENCH_STEPS=50 python bench.py 2>/dev/null
echo "-- exit $?"
echo "== DPM++ 20 batch4 (BASELINE cfg 5) ($(date +%H:%M:%S))"
timeout 2400 env SDTPU_BENCH_SAMPLER=dpmpp python bench.py 2>/dev/null
echo "-- exit $?"
echo "== batch 8 DDIM-20 ($(date +%H:%M:%S))"
timeout 2400 env SDTPU_BENCH_BATCH=8 python bench.py 2>/dev/null
echo "-- exit $?"
echo "== FINAL warm 512 ($(date +%H:%M:%S))"
timeout 2400 python bench.py 2>/dev/null
echo "-- exit $?"
echo "ALL DONE ($(date +%H:%M:%S))"
