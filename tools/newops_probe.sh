#!/bin/bash
# Round-17 new-operator scale check: the q267-q273 pack at sf10/sf30
# (same ladder data and regime as tools/rung3_probe.sh, both cells in
# one session). The ladder corpus is 100x/300x near-duplicate-rich
# documents and 10x/30x fact tables - the harsh case for the
# token-stream operators (q267-q270) and the co-purchase graph (q271).
set -u
Q=q267_dsir_resample,q268_misra_gries,q269_tv_drift,q270_context_pack,q271_kcore,q272_curriculum_interleave,q273_pareto_frontier
ENVC="SPARK_DRIVER_MEM=60g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_ONLY=$Q"
run() {
  echo "=== CELL $1 ($2)"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$2" \
    timeout 3600 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run N10 /dev/shm/graft-sf10
run N30 /dev/shm/graft-sf30
echo "== newops probe done"
