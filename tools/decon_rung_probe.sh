#!/bin/bash
# Round-14 verdict task 3: record the q261 dedup-first DECONTAMINATION
# rung — the q244-style measurement applied to q115 (whose rung-2
# curve was the 36x semantics-driven entry). Same corpus as the dedup
# composition rung (tools/gen_dedup_rung.py at COPIES=10: 5x exact
# copies inside 2 near-variant groups per source doc), one session,
# cells back-to-back:
#   N: q115 naive bloom decontamination (every duplicate pays the
#      gram explode + probe + benchmark join)
#   X: q24 exact dedup alone (the composition's first stage)
#   C: q261 composed (md5-collapse to representatives, decontaminate
#      distinct texts only; per-doc output exactly recoverable —
#      DeconCompositionSpec pins the expansion identity)
set -u
OUT=${1:-/dev/shm/graft-dedup10}
COPIES=${GRAFT_DECON_COPIES:-10}
if [ ! -f "$OUT/documents.parquet" ]; then
  echo "== generating ${COPIES}x dedup corpus"
  GRAFT_DEDUP_COPIES=$COPIES python3 tools/gen_dedup_rung.py "$OUT"
fi
ENVC="SPARK_DRIVER_MEM=60g SPARK_GRAFT_ONESHOT=1 SPARK_GRAFT_TMPFS_SCRATCH=1"
run() { # run <label> <queries>
  echo "=== CELL $1 ($2)"
  (cd /root/repo && env $ENVC SPARK_GRAFT_SF_DIR="$OUT" SPARK_GRAFT_ONLY="$2" \
    timeout 3600 sbt -batch 'runMain graft.Bench' 2>&1 \
    | grep -E '\[bench\]|metric')
}
echo "== gram-probe row accounting (DuckDB, the pair-count analog)"
python3 - "$OUT" <<'EOF'
import duckdb, sys
out = sys.argv[1]
con = duckdb.connect()
con.sql(f"CREATE VIEW d AS SELECT * FROM '{out}/documents.parquet'")
# 3-gram occurrences on the corpus side that a benchmark (source='src2')
# gram join must process: naive = every doc, composed = distinct texts
q = """
WITH g AS (
  SELECT doc_id, text, source,
    len(regexp_split_to_array(trim(text), '\\s+')) AS nw FROM d),
occ AS (SELECT source, sum(greatest(nw - 2, 0)) AS grams FROM g GROUP BY source),
reps AS (
  SELECT min(doc_id) AS rep_id, any_value(source) AS source,
    len(regexp_split_to_array(trim(any_value(text)), '\\s+')) AS nw
  FROM d GROUP BY md5(text)),
rocc AS (SELECT sum(greatest(nw - 2, 0)) AS grams FROM reps)
SELECT (SELECT count(*) FROM d) AS rows,
       (SELECT count(*) FROM reps) AS distinct_texts,
       (SELECT sum(grams) FROM occ) AS naive_gram_occurrences,
       (SELECT grams FROM rocc) AS composed_gram_occurrences
"""
print(con.sql(q).fetchall())
EOF
echo "== precompile (untimed)"
(cd /root/repo && sbt -batch compile >/dev/null 2>&1) && echo "compiled"
run N q115_bloom_decontaminate
run X q24_dedup_exact
run C q261_decon_compose
echo "== decon rung done"
