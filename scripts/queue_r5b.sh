#!/bin/bash
# Round-5 chip-job queue B: after queue_r5.sh drains, run the monolithic
# BDF1 dt-refinement study at the 2D-2 validation mesh (h=0.015 + wake).
# Purpose: root-cause the Cl_max refinement anomaly — the projection
# trace family moves AWAY from the published 0.99-1.01 band under (h,dt)
# refinement (1.017 -> 1.085 at h=0.0125; 1.31 at h=0.010/dt=0.0025).
# If the monolithic (no splitting) scheme time-converges to ~1.0 the
# projection scheme carries a lift bias; if it also converges to ~1.05+
# the spatial setup is the suspect.
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queue.pid)"
echo "=== mono 2D-2 h=0.015 dt=0.00125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.00125 \
  --csv artifacts/st_2d2_monolithic_h015_dt00125.csv \
  > logs/st_2d2_mono_h015_dt00125.log 2>&1
echo "=== mono 2D-2 h=0.015 dt=0.000625 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.000625 \
  --csv artifacts/st_2d2_monolithic_h015_dt0000625.csv \
  > logs/st_2d2_mono_h015_dt0000625.log 2>&1
echo "=== queue B done ==="
