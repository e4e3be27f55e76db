#!/bin/bash
# Round-5 queue I (replaces H: the schur 2D-2 leg is dropped — the
# exact-projection option is long-horizon unstable on open channels,
# measured on CPU; see VALIDATION.md round-5 schur study).  After the
# 3.39M 3D-1Z run drains:
#   1. bench re-cut preview (warning-free headline + settled mono window)
#   2. projection dt=0.0003125 leg (limit pinning of the lift study)
#   3. monolithic dt=0.0003125 leg
#   4. monolithic h=0.0125 dt=0.000625 (spatial leg)
#   5. bench bu=32 A/B
set -u
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/run3d.pid)"
echo "=== bench re-cut preview ==="
python bench.py > BENCH_r05_preview.json 2> logs/bench_r5_preview.log
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
echo "=== queue I done ==="
