package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r17 measurement probe for VERDICT r16 #1/#2 — one JVM, interleaved
  * reps, per-stage task-metrics decomposition (SpillLane's listener).
  *
  * Part A (q25/q08 class): name the 0.15-0.33 s zero-column events-scan
  * floor. Ladder: count(*) → count under DSv2 + parquet aggregate pushdown
  * (footer-only) → single-long-column sum → the three q25 input columns →
  * full q25/q08. Plus: is the vectorized reader active (ColumnarToRow in
  * the executed plan), and where does task time go (run vs shuffle vs GC)?
  *
  * Part B (q05/q03 class): decompose the orderkey fact-fact exchange —
  * shuffle write bytes/time and fetch-wait per stage — and A/B the three
  * join shapes same-sitting, interleaved:
  *   cur   — shipped shuffle_hash-hinted shape
  *   noh   — no hint, AQE free to convert to broadcast at runtime
  *   bcast — date-filtered orders + customer broadcast from plan time
  *           (the shape a cost-based planner with real stats picks at
  *           sf10m; at 100 TB the same statistic flips it back)
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-stage task metric sums (attempt 0 only: retries would double-count)
    case class St(tasks: AtomicLong = new AtomicLong, run: AtomicLong = new AtomicLong,
                  gc: AtomicLong = new AtomicLong, swB: AtomicLong = new AtomicLong,
                  swT: AtomicLong = new AtomicLong, srB: AtomicLong = new AtomicLong,
                  fetchW: AtomicLong = new AtomicLong, maxT: AtomicLong = new AtomicLong)
    val stages = new ConcurrentHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val st = stages.computeIfAbsent(t.stageId, _ => St())
        Option(t.taskMetrics).foreach { m =>
          st.tasks.incrementAndGet()
          st.run.addAndGet(m.executorRunTime)
          st.gc.addAndGet(m.jvmGCTime)
          st.swB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          st.swT.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000L)
          st.srB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          st.fetchW.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
          st.maxT.getAndUpdate(v => math.max(v, m.executorRunTime))
        }
      }
    })
    def drain(): Unit = Thread.sleep(1200)
    def snap(): Map[Int, (Long, Long, Long, Long, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      stages.asScala.map { case (k, s) => k ->
        (s.tasks.get, s.run.get, s.gc.get, s.swB.get, s.swT.get, s.srB.get,
          s.fetchW.get, s.maxT.get) }.toMap
    }
    def stageReport(before: Map[Int, (Long, Long, Long, Long, Long, Long, Long, Long)]): String = {
      val after = snap()
      val rows = after.toSeq.filterNot { case (k, v) => before.get(k).contains(v) }
        .sortBy(_._1).map { case (k, (n, run, gc, swB, swT, srB, fw, mx)) =>
          val p = before.getOrElse(k, (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
          s"""{"stage":$k,"tasks":${n - p._1},"run_ms":${run - p._2},"gc_ms":${gc - p._3},""" +
            s""""sw_mb":${(swB - p._4) / 1048576},"sw_ms":${swT - p._5},""" +
            s""""sr_mb":${(srB - p._6) / 1048576},"fetch_ms":${fw - p._7},"max_task_ms":$mx}"""
        }
      rows.mkString("[", ",", "]")
    }
    def timed(label: String, reps: Int = 3, withStages: Boolean = false)(f: => DataFrame): Double = {
      val ts = (1 to reps).map { i =>
        drain(); val b = snap()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (withStages && i == reps) { drain()
          println(s"""{"probe":"$label","rep":$i,"sec":${"%.3f".format(sec)},"stages":${stageReport(b)}}""") }
        sec
      }
      println(f"""{"probe":"$label","best":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f}""")
      ts.min
    }

    val qs = SparkEntry.queries
    val ev = s"$sfDir/events.parquet"

    // ---------- Part A: the events-scan floor ----------
    println("=== A: events scan floor ===")
    val scanPlan = spark.read.parquet(ev).queryExecution.executedPlan.toString
    println(s"""{"probe":"vectorized_reader_active","columnar_to_row":${scanPlan.contains("ColumnarToRow")}}""")
    timed("a1_count_v1") { spark.read.parquet(ev).groupBy().count() }
    // DSv2 + aggregate pushdown: COUNT answered from footers, no row iteration
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val v2cnt = s2.read.parquet(ev).groupBy().count()
    timed("a2_count_v2_aggpush") { v2cnt }
    println(s"""{"probe":"a2_plan_pushed","pushed_count":${v2cnt.queryExecution.executedPlan.toString.contains("PushedAggregation")}}""")
    timed("a3_sum_one_long") { spark.read.parquet(ev).agg(sum("event_id")) }
    timed("a4_q25_input_cols") {
      // same three input columns as q25; hour-bucket before summing (a
      // straight sum of raw timestamp values overflows long). Handles both
      // ts encodings (testdata nanos-long / gen_sf micros-NTZ), like q25.
      val raw = spark.read.parquet(ev)
      val hb =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          expr("ts div 3600000000000")
        else expr("unix_micros(cast(ts as timestamp)) div 3600000000")
      raw.agg(sum(hb), count(col("event_type")), sum(col("value")))
    }
    timed("a5_q25_full", withStages = true) { qs("q25_events_hourly")(spark, sfDir) }
    timed("a6_q08_full", withStages = true) { qs("q08_window_running")(spark, sfDir) }

    // ---------- Part B: q05 shapes, interleaved ----------
    println("=== B: q05 exchange decomposition + shapes ===")
    import graft.queries.{Tables => T}
    def q05Shape(kind: String): DataFrame = {
      val t = (n: String) => T.load(spark, sfDir, n)
      val r = t("region"); val n = t("nation"); val su = t("supplier")
      val oBase = t("orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cBase = t("customer").select(col("c_custkey"), col("c_nationkey"))
      val (o, c) = kind match {
        case "cur" => (oBase.hint("shuffle_hash"), cBase.hint("shuffle_hash"))
        case "noh" => (oBase, cBase)
        case "bcast" => (broadcast(oBase), broadcast(cBase))
      }
      val l = t("lineitem").select(col("l_orderkey"), col("l_suppkey"),
        (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100))
          .cast("long").as("rev_cents"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
          su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }
    // warm all shapes once, then interleave
    Seq("cur", "noh", "bcast").foreach(k =>
      q05Shape(k).write.format("noop").mode("overwrite").save())
    val acc = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (rep <- 1 to 4; k <- Seq("cur", "noh", "bcast")) {
      drain(); val b = snap()
      val t0 = System.nanoTime()
      q05Shape(k).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      acc(k) = sec :: acc(k)
      if (rep == 4) { drain()
        println(s"""{"probe":"q05_$k","rep":$rep,"sec":${"%.3f".format(sec)},"stages":${stageReport(b)}}""") }
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"""{"probe":"q05_$k","best":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f,"reps":${ts.size}}""")
    }
    // shipped q05 for reference (same sitting)
    timed("q05_shipped", withStages = true) { qs("q05_join5_agg")(spark, sfDir) }
    timed("q03_shipped", withStages = true) { qs("q03_join_topn")(spark, sfDir) }
    spark.stop()
  }
}
