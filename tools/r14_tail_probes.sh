#!/bin/bash
# Round-14 tail probes, serialized: (1) rung-4 q173 cells re-run with
# the broadcast hints removed (the forced out-adjacency broadcast
# exceeded driver.maxResultSize at rung 3 — the defect the first
# rung-4 attempt found); (2) the decontamination rung at 100x, where
# the gram economics should separate naive from composed.
# q173 runs with DISK scratch and a 48g heap: its unhinted plan now
# shuffles the adjacency, and tmpfs scratch + an 80g heap + 22 GB of
# resident ladder corpora exceed one box's RAM (the first attempt
# died on tmpfs ENOSPC — shuffle spill and JVM heap compete for the
# same physical memory when scratch is tmpfs).
set -u
ENVC="SPARK_DRIVER_MEM=48g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_SCALE_PARTITIONS=1"
run() { # run <label> <sfdir> <queries> <timeout-s>
  echo "=== CELL $1 ($2 : $3)"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_ONLY="$3" \
    timeout "$4" sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
run F2 /dev/shm/graft-sf30  q173_triangle_count 5400
run I2 /dev/shm/graft-sf100 q173_triangle_count 5400
echo "== rung-4 q173 cells done"
GRAFT_DECON_COPIES=100 bash tools/decon_rung_probe.sh /dev/shm/graft-dedup100
echo "== tail probes done"
