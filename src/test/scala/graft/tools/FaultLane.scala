package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fault-injection lane: prove that executor LOSS mid-query — the routine
  * event on a 1000-executor cluster — is survived with a byte-identical
  * result. Runs a gate query on the standalone cluster (tools/cluster.sh)
  * twice: once healthy (baseline fingerprint), once with one executor JVM
  * SIGKILLed mid-flight. Spark must retry the lost tasks (and, when the
  * kill lands after a shuffle-map stage, recompute the lost map outputs on
  * FetchFailed), the standalone worker must relaunch a replacement
  * executor, and the result fingerprint (row count + sum of per-row
  * xxhash64) must equal the baseline. Driver-side harness — the query
  * classes ship to executors via spark.jars, exactly like spark-submit.
  *
  *   tools/cluster.sh start 4 8 14g
  *   java -cp "target/scala-2.13/test-classes:<jar>:<spark jars dir glob>"
  *     graft.FaultLane dd24_cdc_chunk_dedup 8000
  */
object FaultLane {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val qname = args.headOption.getOrElse("dd24_cdc_chunk_dedup")
    val killAtMs = args.lift(1).map(_.toLong).getOrElse(8000L)
    val jar = "/root/repo/target/scala-2.13/duckdbagespark_2.13-0.1.0.jar"
    val spark = SparkSession.builder().master(master)
      .appName("graft-fault-lane")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.jars", jar)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "12g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val removed = new AtomicInteger(0)
    val failedTasks = new AtomicInteger(0)
    val stageRetries = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        // taskInfo.successful misses executor-loss task deaths (no clean
        // TaskEnd arrives from a SIGKILLed JVM) — the end REASON is the
        // authoritative record of retried work
        if (t.reason != org.apache.spark.Success)
          failedTasks.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        // a stage re-submission (attempt > 0) is the FetchFailed path:
        // lost shuffle-map output recomputed after the executor died
        if (s.stageInfo.attemptNumber() > 0) stageRetries.incrementAndGet()
    })

    // fingerprint + kill-target discovery shared with StarCcFaultLane
    def fingerprint(df: DataFrame): (Long, BigDecimal) = graft.tools.LaneKit.fingerprint(df)
    def executorPids(): Set[Long] = graft.tools.LaneKit.executorPids()

    val mk = () => SparkEntry.queries(qname)(spark, sfDir)
    val baseline = fingerprint(mk()) // warm pass doubles as the baseline
    // the record must attribute ONLY fault-run events: let the async
    // listener bus drain the baseline's tail, then zero the counters so
    // healthy-run churn can't leak into the fault record
    Thread.sleep(2000)
    removed.set(0); failedTasks.set(0); stageRetries.set(0)
    val before = executorPids()
    println(s"[fault] baseline rows=${baseline._1} hashsum=${baseline._2} " +
      s"executors=${before.size}")

    @volatile var killedPid = -1L
    @volatile var killedAtNs = -1L
    val t0 = System.nanoTime()
    val killer = new Thread(() => {
      Thread.sleep(killAtMs)
      val pids = executorPids()
      if (pids.nonEmpty) {
        killedPid = pids.max
        killedAtNs = System.nanoTime()
        Runtime.getRuntime.exec(
          Array("kill", "-9", killedPid.toString)).waitFor()
        println(s"[fault] SIGKILL executor pid=$killedPid at +${killAtMs}ms")
      }
    })
    killer.setDaemon(true)
    killer.start()
    val fault = fingerprint(mk())
    val wallNs = System.nanoTime() - t0
    killer.join(1000)
    Thread.sleep(3000) // let the worker relaunch the replacement executor
    val after = executorPids()
    // the kill must land INSIDE the query, not after it finished
    val landed = killedAtNs > t0 && killedAtNs < t0 + wallNs
    val ok = fault == baseline && killedPid > 0 && landed
    println(
      s"""{"lane":"fault","query":"$qname","match":${fault == baseline},""" +
        s""""killed_pid":$killedPid,"kill_landed_mid_query":$landed,""" +
        s""""executors_removed":${removed.get},""" +
        s""""failed_tasks":${failedTasks.get},""" +
        s""""stage_retries":${stageRetries.get},"rows":${fault._1},""" +
        f""""wall_sec":${wallNs / 1e9}%.2f,""" +
        s""""executors_before":${before.size},""" +
        s""""executors_after":${after.size},"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
