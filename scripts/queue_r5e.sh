#!/bin/bash
# Round-5 chip-job queue E: 4th dt-halving (dt=0.0003125) of BOTH
# schemes at h=0.015+wake — pins the schemes' common dt->0 limit for the
# 2D-2 lift-amplitude study (monolithic BDF1 falls 1.0414 -> 1.0320 ->
# 1.0243; projection BDF2 rises 1.019 -> 1.048; same spatial operator
# must meet at one limit).
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queued.pid)"
echo "=== mono 2D-2 h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 \
  --csv artifacts/st_2d2_monolithic_h015_dt00003125.csv \
  > logs/st_2d2_mono_h015_dt00003125.log 2>&1
echo "=== proj 2D-2 h=0.015 dt=0.0003125 ==="
python scripts/validate_st.py 2d2 --h 0.015 --dt 0.0003125 --projection \
  --csv artifacts/st_2d2_projection_bdf2_h015_dt00003125.csv \
  > logs/st_2d2_proj_h015_dt00003125.log 2>&1
echo "=== queue E done ==="
