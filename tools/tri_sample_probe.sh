#!/bin/bash
# Round-15 verdict task 1 (second half): the rung-2/rung-3 numbers for
# q278's SAMPLED triangle path (p = 1/5, pinned hash). Exact q173's
# wedge mass at sf30 (~270 GB) exceeds this box's scratch — the
# sampled plan's wedge mass is ~p² of that (~11 GB) and must be
# measurable where the exact plan is not. Cells back-to-back in ONE
# script (the interleave lesson); deployment posture (scaled shuffle
# partitions); disk scratch irrelevant (no sink writes).
set -u
run() { # run <label> <sfdir> <parts>
  echo "=== CELL $1 ($2)"
  (cd /root/repo && env SPARK_DRIVER_MEM=60g SPARK_GRAFT_SF_DIR="$2" \
    SPARK_GRAFT_SHUFFLE_PARTITIONS="$3" \
    timeout 5400 sbt -batch 'runMain graft.TriSampleProbe' 2>&1 \
    | grep -E '"metric"')
}
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run S10a /dev/shm/graft-sf10 64
run S30a /dev/shm/graft-sf30 224
run S10b /dev/shm/graft-sf10 64
run S30b /dev/shm/graft-sf30 224
echo "== tri-sample probe done"
