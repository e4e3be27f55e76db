#!/bin/bash
# Round-5 chip-job queue: waits for the 3.39M 3D run, then runs the 2D-2
# h/dt-refinement legs (VERDICT item 2) and the ADVICE trace completion,
# strictly serialized (one TPU).
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/run3d.pid)"
echo "=== 3D done, starting 2D-2 h=0.0125 dt=0.00125 ==="
python scripts/validate_st.py 2d2 --h 0.0125 --dt 0.00125 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h0125_dt00125.csv \
  > logs/st_2d2_h0125_dt00125.log 2>&1
echo "=== 2D-2 h=0.0125 dt=0.000625 ==="
python scripts/validate_st.py 2d2 --h 0.0125 --dt 0.000625 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h0125_dt0000625.csv \
  > logs/st_2d2_h0125_dt0000625.log 2>&1
echo "=== 2D-2 h=0.015 dt=0.000625 full T=8 (ADVICE trace completion) ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.000625 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h015_dt0000625.csv \
  > logs/st_2d2_dt0000625_full.log 2>&1
echo "=== queue done ==="
