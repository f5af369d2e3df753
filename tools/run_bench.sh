#!/bin/bash
# Run graft.Bench outside sbt (no project lock) with build.sbt's JVM opts.
# Usage: tools/run_bench.sh <sf-dir> <out-json> [heap]
set -u
SF="$1"; OUT="$2"; HEAP="${3:-48g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$HEAP" -Xms"$HEAP" \
  -Xlog:gc*:file=/tmp/gc-bench.log:time,uptime:filecount=1,filesize=50m \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench > "$OUT"
