#!/bin/bash
# Round-5 chip-job queue F (after queue E):
#  1. bench A/B at bsr_block=32 with the round-5 scatter-BJ formulation
#     (the r4 bu=32 end-to-end loss was charged to the convection
#     scatter + BJ rebuild; the scatter tile build changes that cost
#     model).
#  2. 3D single-chip ceiling probe: 2 steps at ~4.4M DoF with the
#     HBM-lean diag preconditioner + G/B split (fit probe, not physics).
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queuee.pid)"
echo "=== bench bu=32 A/B ==="
NS_BENCH_OVERRIDES='{"bsr_block": 32}' python bench.py \
  > logs/bench_bu32_r5.json 2> logs/bench_bu32_r5.log
echo "=== 3D ceiling probe ~4.4M (2 steps, diag) ==="
python scripts/validate_st.py 3d1 --h 0.021 --hnear 0.0065 --projection \
  --f-precond diag --T 0.02 --csv /tmp/ceil44.csv \
  > logs/st_3d1_44M_fitprobe.log 2>&1
echo "=== queue F done ==="
