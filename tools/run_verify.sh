#!/bin/bash
# Run graft.Verify (or another main) from the packaged jar without the sbt
# lock. Usage: run_verify.sh <sf_dir> <out_dir> [mem] [main-class] [filter]
#   filter: comma-separated query names, forwarded as the main's 3rd arg
#   (graft.Verify runs only those queries — local iteration)
set -e
SF=${1:?sf_dir}
OUT=${2:?out_dir}
MEM=${3:-8g}
MAIN=${4:-graft.Verify}
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
# optional 5th arg: comma-separated query-name filter (Verify's 3rd arg)
exec java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"$MEM" \
  -cp /root/repo/target/scala-2.13/duckdbagespark_2.13-0.1.0.jar:'/opt/spark/jars/*' \
  "$MAIN" "$SF" "$OUT" ${5:+"$5"}
