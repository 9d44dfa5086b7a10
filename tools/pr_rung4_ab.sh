#!/bin/bash
# Round-15 verdict task 2: isolate q158's rung-4 above-linear term
# (6.9x on 3.33x rows at sf100, attributed to persisted loop-invariant
# state outgrowing one box's memory but never A/B'd — q193 got its
# isolating A/B, q158 didn't). Three variants, interleaved twice at
# sf100, deployment posture (the rung-4 regime):
#   B = base  (shipped: e0+deg+ed all MEMORY_AND_DISK_SER, lazy)
#   F = free0 (materialize deg/ed eagerly, then FREE the raw-pair
#              cache e0 — ~1/3 of the cached loop-invariant bytes)
#   C = ckpt  (localCheckpoint deg/ed: lineage cut, upstream caches
#              freed, but deserialized block storage)
# A set of sf30 reference cells recomputes the rung ratio per variant.
set -u
ENVC="SPARK_DRIVER_MEM=80g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_SCALE_PARTITIONS=1 SPARK_GRAFT_ONLY=q158_pagerank"
run() { # run <label> <sfdir> <extra-env>
  echo "=== CELL $1 ($2 : $3)"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$2" $3 \
    timeout 3600 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run B1 /dev/shm/graft-sf100 ""
run F1 /dev/shm/graft-sf100 "SPARK_GRAFT_PR_VARIANT=free0"
run C1 /dev/shm/graft-sf100 "SPARK_GRAFT_PR_VARIANT=ckpt"
run B2 /dev/shm/graft-sf100 ""
run F2 /dev/shm/graft-sf100 "SPARK_GRAFT_PR_VARIANT=free0"
run C2 /dev/shm/graft-sf100 "SPARK_GRAFT_PR_VARIANT=ckpt"
run B3 /dev/shm/graft-sf30 ""
run F3 /dev/shm/graft-sf30 "SPARK_GRAFT_PR_VARIANT=free0"
run C3 /dev/shm/graft-sf30 "SPARK_GRAFT_PR_VARIANT=ckpt"
echo "== pr rung-4 A/B done"
