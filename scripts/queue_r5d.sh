#!/bin/bash
# Round-5 chip-job queue D: after queue C (3.39M 3D), the monolithic
# h-refinement leg of the 2D-2 lift study, then the headline bench
# re-cut (VERDICT r4 items 2/4).
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queuec.pid)"
echo "=== mono 2D-2 h=0.0125 dt=0.000625 ==="
python scripts/validate_st.py 2d2 --h 0.0125 --dt 0.000625 \
  --csv artifacts/st_2d2_monolithic_h0125_dt0000625.csv \
  > logs/st_2d2_mono_h0125_dt0000625.log 2>&1
echo "=== bench re-cut ==="
python bench.py > BENCH_r05_preview.json 2> logs/bench_r5_preview.log
echo "=== queue D done ==="
