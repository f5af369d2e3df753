#!/bin/bash
# Tail-rehearsal timing matrix: one JVM per (query, scale) so every cell
# is measured under identical JVM-freshness conditions (TimeQ prints
# cold+warm; the fitter uses warm). Scales are replication factors
# relative to sf0.1. Usage: tools/tail_matrix.sh OUT.tsv
set -u
OUT="$1"; : > "$OUT"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

run_cell() { # scale dir query
  local scale="$1" dir="$2" q="$3"
  local line
  line=$(java $OPENS -cp "$CP" -Xmx48g graft.tools.TimeQ "$dir" "$q" 2>/dev/null | grep '\[timeq\]')
  echo -e "$scale\t$q\t$line" | tee -a "$OUT"
}

# q194 runs at EVERY scale on default conf + the standard heap: the
# round-11 draft of this script hand-excluded it past 10x claiming
# "needs 128 shuffle partitions + 64g at 300x" — an untested rule that
# contradicts GlobalRank's partitions-from-rows derivation (round-9
# task 2). The matrix settles it by measurement.
for spec in "1:/root/testdata/sf0.1" "10:/tmp/graft-sf1" "100:/tmp/graft-sf10b"; do
  scale="${spec%%:*}"; dir="${spec#*:}"
  for q in q194_sa_append q199_quantile_sketch_eval q188_selection_pipeline \
           q201_mg_heavy_hitters q158_dense_threshold q132_jaccard_containment \
           q58_pipeline_clean; do
    run_cell "$scale" "$dir" "$q"
  done
done
# 300x fixture holds lineitem/documents/embeddings only; q158's exact
# N^2 tile shuffle at 600k vectors (~170 GB) exceeds local disk -- its
# 1/10/100 points already pin the quadratic contract.
# q194 last: the 300x SA build is the longest cell and the one with
# disk-pressure history (round-11's pre-serRound build died mid-round);
# a runaway there must not block the rest of the matrix.
for q in q199_quantile_sketch_eval q188_selection_pipeline \
         q201_mg_heavy_hitters q132_jaccard_containment q58_pipeline_clean \
         q194_sa_append; do
  run_cell 300 /tmp/graft-sf30 "$q"
done
