#!/bin/bash
# Standalone-cluster harness for the cluster-mode validation lane (CLUSTER.md).
#
# Stands up a REAL multi-process Spark cluster on this machine — a Master JVM
# plus N Worker JVMs, each launching separate executor JVMs — so every gate
# query executes across process boundaries: closure/Kryo serialization of the
# custom expressions and aggregates, broadcast over the block manager, shuffle
# over the network stack, executor-side class loading of the graft jar. This is
# the execution model of a 1000-executor cluster, minus the second machine.
#
#   tools/cluster.sh start [n_workers] [cores_per_worker] [mem_per_worker]
#   tools/cluster.sh stop
#
# Then run any graft main against it by overriding the session master:
#   SPARK_GRAFT_MASTER=spark://127.0.0.1:7077 /opt/spark/bin/spark-submit \
#     --master spark://127.0.0.1:7077 --class graft.Verify \
#     --driver-memory 8g --executor-memory 12g \
#     target/scala-2.13/duckdbagespark_2.13-0.1.0.jar /root/testdata/sf0.01 /tmp/v_cluster
set -e
export SPARK_HOME=/opt/spark
# workers launch executors through the launcher's command builder, which
# resolves the scala-suffixed jars dir from this (normally set by
# load-spark-env.sh; we launch raw JVMs, so set it explicitly)
export SPARK_SCALA_VERSION=2.13
CMD=${1:-start}
N=${2:-2}
CORES=${3:-8}
MEM=${4:-14g}
RUN=/tmp/graft-cluster
CP="/opt/spark/jars/*"

case "$CMD" in
  start)
    mkdir -p "$RUN"
    java -cp "$CP" -Xmx1g org.apache.spark.deploy.master.Master \
      --host 127.0.0.1 --port 7077 --webui-port 8091 \
      > "$RUN/master.log" 2>&1 &
    echo $! > "$RUN/master.pid"
    for i in $(seq 1 "$N"); do
      mkdir -p "$RUN/worker$i"
      java -cp "$CP" -Xmx1g org.apache.spark.deploy.worker.Worker \
        spark://127.0.0.1:7077 --host 127.0.0.1 --cores "$CORES" --memory "$MEM" \
        --work-dir "$RUN/worker$i" --webui-port $((8100 + i)) \
        > "$RUN/worker$i.log" 2>&1 &
      echo $! > "$RUN/worker$i.pid"
    done
    sleep 4
    grep -h "registered\|Registering worker\|Starting Spark master" \
      "$RUN"/master.log | tail -n $((N + 1))
    ;;
  stop)
    for f in "$RUN"/*.pid; do
      [ -f "$f" ] && kill "$(cat "$f")" 2>/dev/null || true
      rm -f "$f"
    done
    echo "cluster stopped"
    ;;
  *) echo "usage: tools/cluster.sh start|stop [n] [cores] [mem]"; exit 1 ;;
esac
