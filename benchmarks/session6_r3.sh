#!/bin/bash
cd /root/repo
echo "== serve micro-batcher throughput ($(date +%H:%M:%S))"
timeout 3600 python benchmarks/serve_micro.py 2>/dev/null
echo "-- exit $?"
echo "== final 512 bench, warm ($(date +%H:%M:%S))"
timeout 2400 python bench.py 2>/dev/null
echo "-- exit $?"
echo "ALL DONE ($(date +%H:%M:%S))"
