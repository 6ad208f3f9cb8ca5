#!/bin/bash
cd /root/repo
echo "== train step bench, force_xla ($(date +%H:%M:%S))"
timeout 3600 python benchmarks/train_micro.py 2>/dev/null
echo "-- exit $?"
echo "== 2048px bench, bq=4096 pick ($(date +%H:%M:%S))"
timeout 3600 env SDTPU_BENCH_SIZE=2048 SDTPU_BENCH_BATCH=1 SDTPU_BENCH_ITERS=2 python bench.py 2>/dev/null
echo "-- exit $?"
echo "ALL DONE ($(date +%H:%M:%S))"
