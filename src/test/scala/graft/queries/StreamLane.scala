package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** VERDICT r15 #7: the streaming admission/funnel queries driven at sf1
  * volumes under real micro-batch pressure (12+ batches), not the gate's
  * sf0.01 4-batch feeds. For each lane it prints per-batch wall times and
  * state sizes and writes the ledger plus the Spark-computed band/fp
  * relations to SPARK_GRAFT_STREAM_OUT; tools/stream_lane_oracle.py then
  * replays the same order-dependent admission chain ITERATIVELY in DuckDB
  * (independent engine, same greedy semantics as the gate oracles' CTE
  * chains — which stop scaling past a handful of batches) and re-runs the
  * funnel SQL directly against the sf1 events table.
  *
  * The fp/band relations are Spark-computed on purpose: fingerprinting is
  * already cross-engine-gated (stream16/stream20/dd03/dd25 oracles); the
  * claim THIS lane adds is the sequential admission discipline at volume.
  */
object StreamLane {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "/tmp/stream_lane_sf1")
    val nBatches = sys.env.getOrElse("STREAM_BATCHES", "12").toInt
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def dirBytes(p: String): Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(sz).sum).getOrElse(0L) else f.length
      sz(new java.io.File(p))
    }
    def writeLedger(name: String, rows: Seq[(Long, Long, Long, Double, Long)]): Unit = {
      val js = rows.map { case (b, a, r, t, ib) =>
        f"""{"batch":$b,"n_arrived":$a,"n_rejected":$r,"batch_sec":$t%.3f,"index_bytes":$ib}"""
      }.mkString("[", ",", "]")
      java.nio.file.Files.write(java.nio.file.Paths.get(outDir, s"$name.json"),
        js.getBytes("UTF-8"))
      val ts = rows.map(_._4)
      println(f"$name: ${rows.size} batches, batch_sec min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f max=${ts.max}%.3f, final index ${rows.last._5 / 1e6}%.1f MB")
    }

    // ---------- lane 16: MinHash-LSH band admission over ALL sf1 docs ----------
    {
      val feed = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      // dump the band relation once for the oracle's replay
      TextDedup.bandKeysOfSig(TextDedup.minhashSigRaw(
        feed.toDF("doc_id", "text")))
        .write.mode("overwrite").parquet(s"$outDir/bands.parquet")
      val idxRoot = TempDirs.create("graft-lane16-idx")
      val mem = MemoryStream[(Long, String)]
      val idxPaths = scala.collection.mutable.ArrayBuffer[String]()
      val ledger = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Long)]()
      val q = mem.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val t0 = System.nanoTime()
          val bands = TextDedup.bandKeysOfSig(
            TextDedup.minhashSigRaw(batch.toDF())).persist()
          val hits =
            if (idxPaths.isEmpty) bands.filter(lit(false)).select("doc_id")
            else bands.join(spark.read.parquet(idxPaths.toSeq: _*), Seq("band", "key"), "left_semi")
              .select("doc_id").distinct()
          val nArrived = batch.count()
          val nRejected = hits.count()
          val dout = s"$idxRoot/b$batchId"
          bands.join(hits, Seq("doc_id"), "left_anti")
            .select("band", "key").distinct()
            .write.mode("overwrite").parquet(dout)
          idxPaths += dout
          bands.unpersist()
          ledger += ((batchId, nArrived, nRejected,
            (System.nanoTime() - t0) / 1e9, dirBytes(idxRoot)))
          ()
        }.start()
      try {
        (0 until nBatches).foreach { k =>
          mem.addData(feed.filter(_._1 % nBatches == k)); q.processAllAvailable()
        }
      } finally q.stop()
      writeLedger("lane16_ledger", ledger.toSeq)
    }

    // ---------- lane 20: exact-substring-run admission over ALL sf1 docs ----------
    {
      val feed = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      feed.toDF("doc_id", "text")
        .select(col("doc_id"), posexplode(graft.functions.SubstringRunFps
          .substring_run_fps(col("text"), 50)).as(Seq("i", "fp")))
        .select("doc_id", "fp").distinct()
        .write.mode("overwrite").parquet(s"$outDir/fps.parquet")
      val idxRoot = TempDirs.create("graft-lane20-idx")
      val mem = MemoryStream[(Long, String)]
      val idxPaths = scala.collection.mutable.ArrayBuffer[String]()
      val ledger = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Double, Long)]()
      val q = mem.toDF().toDF("doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val t0 = System.nanoTime()
          val wins = batch.toDF().select(col("doc_id"),
            posexplode(graft.functions.SubstringRunFps
              .substring_run_fps(col("text"), 50)).as(Seq("i", "fp")))
            .select("doc_id", "fp").persist()
          val hits =
            if (idxPaths.isEmpty) wins.filter(lit(false)).select("doc_id")
            else wins.join(spark.read.parquet(idxPaths.toSeq: _*), Seq("fp"), "left_semi")
              .select("doc_id").distinct()
          val nArrived = batch.count()
          val nRejected = hits.count()
          val dout = s"$idxRoot/b$batchId"
          wins.join(hits, Seq("doc_id"), "left_anti")
            .select("fp").distinct()
            .write.mode("overwrite").parquet(dout)
          idxPaths += dout
          wins.unpersist()
          ledger += ((batchId, nArrived, nRejected,
            (System.nanoTime() - t0) / 1e9, dirBytes(idxRoot)))
          ()
        }.start()
      try {
        (0 until nBatches).foreach { k =>
          mem.addData(feed.filter(_._1 % nBatches == k)); q.processAllAvailable()
        }
      } finally q.stop()
      writeLedger("lane20_ledger", ledger.toSeq)
    }

    // ---------- lane 19: funnel stages at sf1 event volume, time-sliced batches ----------
    {
      val userCap = sys.env.getOrElse("STREAM_USER_CAP", "2000").toLong
      val ev = Tables.load(spark, sfDir, "events")
        .filter(col("user_id") <= userCap)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("tms"),
          col("event_type").as("etype"))
        .as[graft.streaming.StreamingOps.FunnelEvent]
        .collect().toSeq
      println(s"lane19 feed: ${ev.size} events (user_id <= $userCap)")
      val ts = ev.map(_.tms); val (minT, maxT) = (ts.min, ts.max)
      val cuts = (1 until nBatches).map(i => minT + (maxT - minT) * i / nBatches)
      val horizonMs = (maxT - minT) / 1000L + 60000L
      val mem = MemoryStream[graft.streaming.StreamingOps.FunnelEvent]
      val out = graft.streaming.StreamingOps.funnelStages(mem.toDS(), horizonMs)
      val sink = s"lane19_mem"
      val q = out.toDF().writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      val batchTimes = scala.collection.mutable.ArrayBuffer[Double]()
      try {
        val bounds = (Seq(minT - 1) ++ cuts ++ Seq(maxT)).sliding(2).toSeq
        bounds.foreach { case Seq(lo, hi) =>
          val t0 = System.nanoTime()
          mem.addData(ev.filter(e => e.tms > lo && e.tms <= hi))
          q.processAllAvailable()
          batchTimes += (System.nanoTime() - t0) / 1e9
        }
        mem.addData(graft.streaming.StreamingOps.FunnelEvent(-1L, -1L,
          maxT + 3 * horizonMs * 1000L, "x"))
        q.processAllAvailable()
        mem.addData(graft.streaming.StreamingOps.FunnelEvent(-1L, -2L,
          maxT + 4 * horizonMs * 1000L, "x"))
        q.processAllAvailable()
      } finally q.stop()
      val stages = spark.table(sink)
      val tiers = stages.filter(col("user_id") >= 0)
        .select(col("user_id"), explode(sequence(lit(1), col("stage"))).as("stage"))
      val res = spark.range(1, 4).select(col("id").cast("int").as("stage"))
        .join(tiers, Seq("stage"), "left")
        .groupBy(col("stage"))
        .agg(count(col("user_id")).as("n_users"), sum(col("user_id")).as("user_sum"))
        .orderBy("stage")
        .collect().map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
      val js = res.map { case (st, n, su) =>
        s"""{"stage":$st,"n_users":$n,"user_sum":$su}""" }.mkString("[", ",", "]")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, "lane19_stages.json"), js.getBytes("UTF-8"))
      val bt = batchTimes.toSeq
      println(f"lane19: ${bt.size} batches, batch_sec min=${bt.min}%.3f med=${bt.sorted.apply(bt.size / 2)}%.3f max=${bt.max}%.3f; stages=$js")
    }
    spark.stop()
  }
}
