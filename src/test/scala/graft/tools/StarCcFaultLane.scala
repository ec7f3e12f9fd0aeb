package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fault lane for the ITERATIVE StarCC operator (the FaultLane pattern,
  * specialized). `reliable = true` must survive an executor SIGKILL
  * mid-fixpoint deterministically — each round's edge frame is in the
  * checkpoint dir, so retried tasks re-read it. The default
  * localCheckpoint mode persists rounds at 2× replication, so its
  * survival is probabilistic (this lane's boundary control kills TWO of
  * four executors and records the outcome — measured byte-identical
  * survival; losing both replicas of a live block would fail loudly,
  * never silently wrong). Runs StarCC over the sf0.1 co-purchase graph
  * on the standalone cluster (tools/cluster.sh), healthy baseline first,
  * then the kill runs; asserts byte-identical labels.
  *
  *   tools/cluster.sh start 4 8 14g
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 java -cp "<test-classes>:<jar>:<spark jars>"
  *     graft.tools.StarCcFaultLane [killAtMs]
  */
object StarCcFaultLane {
  def main(args: Array[String]): Unit = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val killAtMs = args.headOption.map(_.toLong).getOrElse(6000L)
    val jar = "/root/repo/target/scala-2.13/duckdbagespark_2.13-0.1.0.jar"
    val spark = SparkSession.builder().master(master)
      .appName("graft-starcc-fault-lane")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.jars", jar)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "12g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir("/tmp/graft-starcc-ckpt")

    val removed = new AtomicInteger(0)
    val stageRetries = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        if (s.stageInfo.attemptNumber() > 0) stageRetries.incrementAndGet()
    })

    def fingerprint(df: DataFrame): (Long, BigDecimal) = LaneKit.fingerprint(df)
    def executorPids(): Set[Long] = LaneKit.executorPids()

    // the expensive projection once; both runs consume the same relation
    val pairs = graft.graph.GraphOps.coPurchasePairs(spark, sfDir)
      .select(col("src"), col("dst")).checkpoint()
    println(s"[starcc-fault] edges=${pairs.count()}")

    val mk = () => graft.graph.StarCC.labels(pairs, reliable = true)
    val baseline = fingerprint(mk())
    Thread.sleep(2000)
    removed.set(0); stageRetries.set(0)
    println(s"[starcc-fault] baseline nodes=${baseline._1} hashsum=${baseline._2} " +
      s"executors=${executorPids().size}")

    @volatile var killedPid = -1L
    @volatile var killedAtNs = -1L
    val t0 = System.nanoTime()
    val killer = new Thread(() => {
      Thread.sleep(killAtMs)
      val pids = executorPids()
      if (pids.nonEmpty) {
        killedPid = pids.max
        killedAtNs = System.nanoTime()
        Runtime.getRuntime.exec(Array("kill", "-9", killedPid.toString)).waitFor()
        println(s"[starcc-fault] SIGKILL executor pid=$killedPid at +${killAtMs}ms")
      }
    })
    killer.setDaemon(true)
    killer.start()
    val fault = fingerprint(mk())
    val wallNs = System.nanoTime() - t0
    killer.join(1000)
    val landed = killedAtNs > t0 && killedAtNs < t0 + wallNs
    val ok = fault == baseline && killedPid > 0 && landed
    println(
      s"""{"lane":"starcc-fault","match":${fault == baseline},""" +
        s""""killed_pid":$killedPid,"kill_landed_mid_run":$landed,""" +
        s""""executors_removed":${removed.get},""" +
        s""""stage_retries":${stageRetries.get},"nodes":${fault._1},""" +
        f""""wall_sec":${wallNs / 1e9}%.2f,"ok":$ok}""")

    // boundary control: Dataset.localCheckpoint persists round state with
    // 2× replication, so a SINGLE executor kill is typically survived
    // (measured here first); killing TWO executors at once can take both
    // replicas of a block, and then the only acceptable outcome is a LOUD
    // failure (lineage truncated — no silent wrong answer).
    Thread.sleep(3000) // replacement executor registers
    @volatile var killedPid2 = -1L
    @volatile var killedAtNs2 = -1L
    val t1 = System.nanoTime()
    val killer2 = new Thread(() => {
      Thread.sleep(killAtMs)
      val pids = executorPids()
      if (pids.nonEmpty) {
        val victims = pids.toSeq.sorted.takeRight(2)
        killedPid2 = victims.max
        killedAtNs2 = System.nanoTime()
        victims.foreach(p =>
          Runtime.getRuntime.exec(Array("kill", "-9", p.toString)).waitFor())
        println(s"[starcc-fault] SIGKILL executors ${victims.mkString(",")} (local mode run)")
      }
    })
    killer2.setDaemon(true)
    killer2.start()
    val localOutcome =
      try {
        val fp = fingerprint(graft.graph.StarCC.labels(pairs)) // localCheckpoint
        if (fp == baseline) "survived_byte_identical" else "WRONG_ANSWER"
      } catch { case e: Throwable => s"failed_loudly(${e.getClass.getSimpleName})" }
    val wall2 = System.nanoTime() - t1
    killer2.join(1000)
    // a survival claim is only evidence if the kill actually landed inside
    // the run — otherwise record it as such (phase-1's `landed` discipline)
    val landed2 = killedPid2 > 0 && killedAtNs2 > t1 && killedAtNs2 < t1 + wall2
    val outcome2 = if (landed2) localOutcome else s"kill_not_landed($localOutcome)"
    println(s"""{"lane":"starcc-fault-localckpt","killed_pid":$killedPid2,""" +
      s""""kill_landed_mid_run":$landed2,"outcome":"$outcome2"}""")
    spark.stop()
    if (!ok || localOutcome == "WRONG_ANSWER") sys.exit(1)
  }
}
