#!/bin/bash
# Round-3 in-context A/B session (run on the real TPU, sequentially).
# Legs:
#   1024 default        — skip-fold ON, fused resblock/proj ON at 128²
#   1024 skipfold=0     — explicit concat, single-input fused resblock
#   1024 unetres OFF    — XLA resblocks at 128² (gate A/B, VERDICT weak #5)
#   1024 proj OFF       — XLA proj_in/proj_out (gate A/B)
#   512 default         — post-skip-fold-restructure baseline confirm
#   512 f32-load        — SDTPU_BENCH_F32_LOAD=1 must match 512 default
cd /root/repo
export SDTPU_BENCH_ITERS=3
run() {
  echo "== $1"
  shift
  timeout 2400 env "$@" python bench.py 2>/dev/null
  echo "-- exit $? ($(date +%H:%M:%S))"
}
run "1024 default (skip-fold ON)"        SDTPU_BENCH_SIZE=1024 SDTPU_BENCH_BATCH=2
run "1024 skip-fold OFF (explicit cat)"  SDTPU_BENCH_SIZE=1024 SDTPU_BENCH_BATCH=2 SDTPU_SKIP_FOLD=0
run "1024 fused-unet-res OFF (XLA res)"  SDTPU_BENCH_SIZE=1024 SDTPU_BENCH_BATCH=2 SDTPU_FUSED_UNET_MIN_ROWS=1073741824
run "1024 fused-proj OFF"                SDTPU_BENCH_SIZE=1024 SDTPU_BENCH_BATCH=2 SDTPU_FUSED_PROJ=0
run "512 default"                        SDTPU_BENCH_SIZE=512
run "512 f32-load (--bf16 path)"         SDTPU_BENCH_SIZE=512 SDTPU_BENCH_F32_LOAD=1
echo "ALL DONE"
