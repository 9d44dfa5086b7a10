#!/bin/bash
# Round-14 verdict task 2: attack the one above-linear rung-3 curve
# left — q193's stream-stream state-store cost. Rung 3 measured q193
# at 5.5x on 3x data while q250 (same machinery) holds 3.0x,
# localized to per-batch state-store commit/rescan with resident
# state. A/B the RocksDB provider (already proven by q199's
# transformWithState) against the default HDFS-backed in-memory map
# for the whole drained stream-stream family at rung 3 — ONE script,
# all cells back-to-back, each cell pair interleaved twice (the
# r9/r10 lesson: cross-session deltas are regime drift).
#   H: sf30, default provider   (the rung-3 baseline regime)
#   R: sf30, RocksDB provider
set -u
Q=q193_stream_outer,q250_stream_full_outer,q251_stream_chain,q274_stream_semi
ENVC="SPARK_DRIVER_MEM=60g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1 SPARK_GRAFT_ONLY=$Q"
run() { # run <label> <extra-env>
  echo "=== CELL $1 $2"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR=/dev/shm/graft-sf30 $2 \
    timeout 3600 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run H1 ""
run R1 "SPARK_GRAFT_STATE_PROVIDER=rocksdb"
run H2 ""
run R2 "SPARK_GRAFT_STATE_PROVIDER=rocksdb"
echo "== state-provider A/B done"
