#!/bin/bash
# Run graft.Bench from the packaged jar (no sbt lock).
# Usage: run_bench.sh <sf_dir> <out_json> [mem]
set -e
SF=${1:?sf_dir}
OUT=${2:?out_json}
MEM=${3:-90g}
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" \
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp /root/repo/target/scala-2.13/duckdbagespark_2.13-0.1.0.jar:'/opt/spark/jars/*' \
  graft.Bench
