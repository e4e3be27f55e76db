#!/bin/bash
# Round-5 chip-job queue C: the 3.39M-DoF 3D-1Z attempt with the G/B
# overflow split (VERDICT r4 item 1), after queue B (monolithic 2D-2 dt
# study) drains.  Try the block-Jacobi preconditioner first (estimated
# peak ~13.5-15 GiB of 15.75 after the split, scripts/exp_hbm_account.py);
# fall back to the HBM-lean diag preconditioner if it OOMs.
cd /root/repo
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/queueb.pid)"
echo "=== 3D-1Z 3.39M projection bj (G/B split) ==="
python scripts/validate_st.py 3d1 --h 0.023 --hnear 0.007 --projection \
  --csv artifacts/st_3d1_projection_34M_h023.csv \
  > logs/st_3d1_34M_split.log 2>&1
if grep -q "RESOURCE_EXHAUSTED" logs/st_3d1_34M_split.log; then
  echo "=== bj OOM; retry with --f-precond diag ==="
  python scripts/validate_st.py 3d1 --h 0.023 --hnear 0.007 --projection \
    --f-precond diag \
    --csv artifacts/st_3d1_projection_34M_h023.csv \
    > logs/st_3d1_34M_diagp.log 2>&1
fi
echo "=== queue C done ==="
