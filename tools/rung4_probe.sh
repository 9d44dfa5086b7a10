#!/bin/bash
# Round-14 verdict task 7: scale-ladder rung 4 (sf30 -> sf100, 3.33x)
# for the heaviest post-fix queries — q158 (PageRank, serialized
# persist + rank-only shuffles), q173 (oriented triangles), q193
# (stream-stream LEFT OUTER, after the task-2 state-store A/B).
# Both rungs run in the DEPLOYMENT posture (scaled shuffle
# partitions) — rung 3 already recorded the pinned-32 regime's
# breakdown and the partition-knob sign change; rung 4 asks whether
# the corrected curves hold a third decade, not how a deliberately
# undersized knob fails.
# q173 runs as its OWN cell pair: it is the known-heaviest entry
# (972 s at sf10 pinned, rung 2), and a timeout there must not starve
# q158/q193's numbers out of the shared Bench invocation.
# Data: tools/gen_scale_ladder.py at COPIES=300 (sf30) / 1000 (sf100).
# Cells back-to-back in ONE script (the r9/r10 interleave lesson).
set -u
ENVC="SPARK_DRIVER_MEM=80g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_SCALE_PARTITIONS=1"
run() { # run <label> <sfdir> <queries> <timeout-s>
  echo "=== CELL $1 ($2 : $3)"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_ONLY="$3" \
    timeout "$4" sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run F1 /dev/shm/graft-sf30  q158_pagerank,q193_stream_outer 7200
run I1 /dev/shm/graft-sf100 q158_pagerank,q193_stream_outer 7200
run F2 /dev/shm/graft-sf30  q173_triangle_count 7200
run I2 /dev/shm/graft-sf100 q173_triangle_count 7200
echo "== rung 4 done"
