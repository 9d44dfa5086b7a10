#!/bin/bash
# Round-12 rung-2 resourcing/algorithm isolation matrix (verdict task 3).
# All cells measured in ONE session back-to-back so box-regime drift
# (the r9/r10 lesson) cannot masquerade as a code effect.
#   A: sf1,  HEAD, pinned 32 partitions (knob no-op at this size)
#   B: sf10, HEAD, pinned 32 partitions      -> isolates knob (vs C)
#   C: sf10, HEAD, scaled partitions (~217)  -> the deployment posture
#   D: sf10, pre-b5c14b3 worktree, pinned 32 -> isolates algorithm (vs B):
#      old q173 (full adjacency), old q158 (MEMORY_AND_DISK persist),
#      q168 UNCHANGED between the trees = the regime control.
set -u
Q=q158,q168,q173
ENVC="SPARK_DRIVER_MEM=60g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_ONLY=$Q"
run() { # run <label> <dir> <sfdir> <extra-env>
  echo "=== CELL $1 ($3) $4"
  (cd "$2" && env $ENVC SPARK_GRAFT_SF_DIR="$3" $4 \
    timeout 2400 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== precompile both trees (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "repo compiled"
(cd /tmp/graft-old-q173 && sbt -batch compile >/dev/null 2>&1) && echo "worktree compiled"
run A /root/repo           /dev/shm/graft-sf1  ""
run B /root/repo           /dev/shm/graft-sf10 ""
run C /root/repo           /dev/shm/graft-sf10 "SPARK_GRAFT_SCALE_PARTITIONS=1"
run D /tmp/graft-old-q173  /dev/shm/graft-sf10 ""
echo "== matrix done"
