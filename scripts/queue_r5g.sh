#!/bin/bash
# Round-5 chip-job master queue G (replaces the killed E/F runners):
# after queue D (mono h=0.0125 + bench preview) —
#   1. 3.39M 3D rerun: diag + G/B split + steps_per_chunk=1 (the k=8
#      chunk variant's second executable arena was the last OOM;
#      steps 1-2 ran at 2.7 s/step)
#   2. dt=0.0003125 legs of both 2D-2 schemes at h=0.015 (limit pinning)
#   3. bench bu=32 A/B + 4.4M fit probe
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queued.pid)"
echo "=== 3D-1Z 3.39M diag steps_per_chunk=1 ==="
python scripts/validate_st.py 3d1 --h 0.023 --hnear 0.007 --projection \
  --f-precond diag --steps-per-chunk 1 \
  --csv artifacts/st_3d1_projection_34M_h023.csv \
  > logs/st_3d1_34M_diagp1.log 2>&1
echo "=== mono 2D-2 h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 \
  --csv artifacts/st_2d2_monolithic_h015_dt00003125.csv \
  > logs/st_2d2_mono_h015_dt00003125.log 2>&1
echo "=== proj 2D-2 h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h015_dt00003125.csv \
  > logs/st_2d2_proj_h015_dt00003125.log 2>&1
echo "=== bench bu=32 A/B ==="
NS_BENCH_OVERRIDES='{"bsr_block": 32}' python bench.py \
  > logs/bench_bu32_r5.json 2> logs/bench_bu32_r5.log
echo "=== 3D ceiling probe ~4.4M (2 steps, diag) ==="
python scripts/validate_st.py 3d1 --h 0.021 --hnear 0.0065 --projection \
  --f-precond diag --steps-per-chunk 1 --T 0.02 --csv /tmp/ceil44.csv \
  > logs/st_3d1_44M_fitprobe.log 2>&1
echo "=== queue G done ==="
