#!/bin/bash
cd /root/repo
echo "== attn 65536 ext sweep ($(date +%H:%M:%S))"
timeout 2400 python benchmarks/attn65536_ext.py 2>/dev/null
echo "-- exit $?"
echo "== train step bench ($(date +%H:%M:%S))"
timeout 3000 python benchmarks/train_micro.py 2>/dev/null
echo "-- exit $?"
echo "ALL DONE ($(date +%H:%M:%S))"
