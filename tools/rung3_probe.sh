#!/bin/bash
# Round-13 scale-ladder rung 3 (r12 verdict task 5): do the corrected
# curves (q158's serialized persist, the streaming family's machinery
# amortization, q71's two-phase AP) hold another 3x past rung 2?
# Probes the 5 heaviest r12 bench queries at sf10 -> sf30, all cells
# back-to-back in ONE session (the r9/r10 lesson: cross-session deltas
# are regime drift).
#   E: sf10, pinned 32 shuffle partitions (the rung-2 regime control)
#   F: sf30, pinned 32                     -> the curve at 3x
#   G: sf30, scaled partitions             -> the deployment posture
# Data: tools/gen_scale_ladder.py at COPIES=100 (sf10) / 300 (sf30).
set -u
Q=q158,q193,q250,q251,q71
ENVC="SPARK_DRIVER_MEM=60g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_ONLY=$Q"
run() { # run <label> <sfdir> <extra-env>
  echo "=== CELL $1 ($2) $3"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$2" $3 \
    timeout 3600 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run E /dev/shm/graft-sf10 ""
run F /dev/shm/graft-sf30 ""
run G /dev/shm/graft-sf30 "SPARK_GRAFT_SCALE_PARTITIONS=1"
echo "== rung 3 done"
