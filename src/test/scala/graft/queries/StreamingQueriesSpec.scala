package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-gated streaming queries must equal their batch twins exactly
  * (same engine, so this locks the stream/batch equivalence independently
  * of the DuckDB oracle). */
class StreamingQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    StreamingQueries.defs.find(_.name == name).get.run(spark, sf)

  test("stream01 candidate pairs == batch LSH candidate pairs") {
    val stream = run("stream01_lsh_candidates")
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 200)
    val batch = Similarity.lshCandidatePairs(spark, e)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  test("stream02 complete-mode rollup == batch q25 aggregation") {
    val stream = run("stream02_hourly_rollup")
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  // The fault-tolerance contract every long-running 100 TB pipeline rests
  // on, which the drain()-based gate queries never exercise: stop a
  // stateful stream mid-corpus, restart it against the SAME checkpoint,
  // and require (a) already-processed input is not re-emitted (source
  // offsets + file-sink commit log) and (b) the dedup STATE is recovered,
  // so a post-restart duplicate of a pre-restart document is suppressed.
  test("checkpoint recovery: dedup state and offsets survive a restart") {
    import spark.implicits._
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("graft_ckpt_src_"); val out = tmp("graft_ckpt_out_")
    val ckpt = tmp("graft_ckpt_log_")
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    def feed(rows: Seq[(Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(src)
      val q = graft.streaming.StreamingOps.dedupStream(stream)
        .select(col("doc_id"), col("fp"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    val t0 = 60000L
    feed((0L until 50L).map(i => (i, s"doc-$i", ts(t0 + i))))
    runOnce() // run 1: 50 distinct docs
    // run 2, same checkpoint: 25 duplicates of run-1 texts (fresh doc_ids,
    // inside the 1 h watermark) + 25 genuinely new texts
    feed((0L until 25L).map(i => (100 + i, s"doc-$i", ts(t0 + 1000 + i))) ++
      (25L until 50L).map(i => (100 + i, s"new-$i", ts(t0 + 1000 + i))))
    runOnce()
    val res = spark.read.parquet(out)
    assert(res.count() == 75, "run-1 rows re-emitted or run-2 dups not suppressed")
    assert(res.select("fp").distinct().count() == 75)
    // the suppressed 25 are exactly the run-1 duplicates: no doc_id in
    // [100, 125) may appear (their fps were claimed in run 1)
    assert(res.filter(col("doc_id") >= 100 && col("doc_id") < 125).count() == 0)
  }

  // The state backend that actually runs at 100 TB: HDFSBackedStateStore
  // (the default every other test uses) holds state on the JVM heap;
  // production stateful streaming runs RocksDB. Same dedup, same inputs,
  // same results — on the RocksDB provider, proving none of our stateful
  // operators depend on default-provider behavior.
  test("stateful dedup is backend-agnostic: RocksDB state store provider") {
    val sess = spark.newSession()
    sess.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import sess.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_rocks_src_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rocks_out_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_ckpt_").toString
    val rows = (0L until 40L).map(i =>
      (i, s"doc-${i % 20}", new java.sql.Timestamp(60000L + i))) // every text twice
    rows.toDF("doc_id", "text", "ts").coalesce(1)
      .write.mode("overwrite").parquet(src)
    val stream = sess.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(src)
    val q = graft.streaming.StreamingOps.dedupStream(stream)
      .select(col("fp"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val res = sess.read.parquet(out)
    assert(res.count() == 20 && res.distinct().count() == 20)
  }

  test("stream10 JSONL ingest rollup == batch documents aggregation") {
    val stream = run("stream10_jsonl_ingest")
    val batch = Tables.load(spark, sf, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        min(col("doc_id")).as("first_doc"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  test("FpIndex bucketed merge: correct cross-batch state, untouched buckets bitwise untouched") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .withColumn("fp", md5(col("text").cast("binary")))
        .groupBy("fp")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("copies"))
    // batch 0: a spread of texts filling many buckets
    val b0 = (0L until 64L).map(i => (i, s"text-${i % 32}"))
    FpIndex.mergeBatch(spark, root, manifest, delta(b0), 0L)
    val bucketsAfter0 = manifest.current.toMap
    assert(bucketsAfter0.nonEmpty, "batch 0 must populate buckets")
    // snapshot every bucket's file list + mtime + size before batch 1
    def snapshot(): Map[Int, Seq[(String, Long, Long)]] =
      manifest.current.toMap.map { case (b, p) =>
        val dir = new java.io.File(p)
        b -> dir.listFiles().toSeq.sortBy(_.getName)
          .map(f => (f.getName, f.lastModified(), f.length()))
      }
    val snap0 = snapshot()
    // batch 1: ONE repeated text — touches exactly one bucket
    val oneText = "text-7" // dup of batch 0: forces a real read-merge of its bucket
    val b1 = Seq((100L, oneText), (101L, oneText))
    FpIndex.mergeBatch(spark, root, manifest, delta(b1), 1L)
    val oneBucket = spark.range(1)
      .select(FpIndex.bucketOf(md5(lit(oneText).cast("binary")))).collect()(0).getInt(0)
    // exactly the touched bucket's manifest entry flipped to v1 …
    assert(manifest.current(oneBucket).contains("/v1/"),
      "touched bucket must point at the new version")
    manifest.current.toMap.foreach { case (b, p) =>
      if (b != oneBucket)
        assert(p == bucketsAfter0(b), s"untouched bucket $b path changed")
    }
    // … and every untouched bucket's FILES are bitwise untouched (name,
    // mtime, size all identical — no rewrite, no append, not even opened
    // for write)
    snapshot().foreach { case (b, files) =>
      if (b != oneBucket)
        assert(files == snap0(b), s"untouched bucket $b files changed on disk")
    }
    // cross-batch semantics: keeper kept from batch 0, copies summed
    val merged = FpIndex.read(spark, manifest)
      .filter(col("fp") === md5(lit(oneText).cast("binary")))
      .collect()(0)
    assert(merged.getLong(1) == 7L, "keeper must stay the batch-0 min doc_id")
    assert(merged.getLong(2) == 4L, "copies must sum across batches (2 in b0 + 2 in b1)")
    // and the whole index equals the one-pass batch derivation
    val all = delta(b0 ++ b1)
    val idx = FpIndex.read(spark, manifest)
    assert(idx.exceptAll(all).count() == 0 && all.exceptAll(idx).count() == 0)
  }
}
