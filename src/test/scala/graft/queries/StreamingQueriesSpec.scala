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

  test("FpIndex LSM: batch-sized appends, threshold compaction, exact cross-batch state") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_").toString
    val manifest = new FpIndex.Manifest
    // raw NON-unique rows (stream15's relaxed contract: duplicate fps in
    // one batch are legal — merge-on-read folds them)
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    def wantOf(rows: Seq[(Long, String)]) =
      delta(rows).groupBy("fp")
        .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
    def filesUnder(p: String): Seq[(String, Long, Long)] = {
      val dir = new java.io.File(p)
      if (!dir.isDirectory) Seq.empty
      else dir.listFiles().toSeq.sortBy(_.getName)
        .map(f => (f.getName, f.lastModified(), f.length()))
    }
    def snapshotAll(): Map[String, Seq[(String, Long, Long)]] =
      manifest.allPaths.map(p => p -> filesUnder(p)).toMap

    // batches 0..2: same text universe — every batch touches the same
    // buckets, the uniform-fp regime where merge-on-write degenerates
    val batches = (0 until 3).map { k =>
      (0L until 64L).map(i => (k * 100L + i, s"text-${i % 32}"))
    }
    var fed: Seq[(Long, String)] = Seq.empty
    batches.zipWithIndex.foreach { case (b, k) =>
      val before = snapshotAll()
      FpIndex.mergeBatch(spark, root, manifest, delta(b), k.toLong)
      fed ++= b
      // ingest is append-only: every previously-existing file set is
      // bitwise untouched (name/mtime/size) — nothing rewritten in place
      val after = snapshotAll()
      before.foreach { case (p, fs) =>
        assert(after.getOrElse(p, filesUnder(p)) == fs,
          s"batch $k rewrote pre-existing files under $p")
      }
      // below the threshold nothing compacts: no base yet, k+1 deltas
      assert(manifest.base.isEmpty, s"batch $k compacted below threshold")
      assert(manifest.deltas.values.forall(_.size == k + 1))
      // the index equals the one-pass derivation after EVERY batch
      val want = wantOf(fed)
      val got = FpIndex.read(spark, manifest)
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"index diverged after batch $k")
    }
    // batch 3 pushes every pile to the threshold (4): compaction fires,
    // folds base ∪ deltas into a fresh base, clears the piles
    val preCompactPaths = manifest.allPaths
    FpIndex.mergeBatch(spark, root, manifest, delta(batches(0)), 3L)
    fed ++= batches(0)
    assert(manifest.base.nonEmpty, "threshold reached but nothing compacted")
    assert(manifest.deltas.values.forall(_.isEmpty), "compaction must clear piles")
    assert(manifest.base.values.forall(_.contains("/c3/")))
    // compaction GCs what it superseded: every pre-compaction live path is
    // now both unreferenced and deleted — storage is O(live), not O(history)
    preCompactPaths.foreach { p =>
      assert(!manifest.allPaths.contains(p), s"superseded path still referenced: $p")
      assert(!new java.io.File(p).exists(), s"superseded path not GC'd: $p")
    }
    // cross-batch semantics survive compaction: keeper is the global min
    // doc_id, copies the global count (text-7 appears once per batch ×
    // i=7 and i=39 per batch half… verify via the one-pass derivation)
    val want = wantOf(fed)
    val got = FpIndex.read(spark, manifest)
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "index diverged after compaction")
    // a post-compaction batch appends next to the compacted base without
    // touching it
    val baseSnap = manifest.base.toMap.map { case (b, p) => b -> filesUnder(p) }
    FpIndex.mergeBatch(spark, root, manifest, delta(batches(1)), 4L)
    fed ++= batches(1)
    manifest.base.toMap.foreach { case (b, p) =>
      assert(filesUnder(p) == baseSnap(b), s"post-compaction ingest rewrote base $b")
    }
    val finalGot = FpIndex.read(spark, manifest)
    val finalWant = wantOf(fed)
    assert(finalGot.exceptAll(finalWant).count() == 0 &&
      finalWant.exceptAll(finalGot).count() == 0)
  }

  test("FpIndex: replayed batchIds are idempotent (the at-least-once foreachBatch contract)") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_rp_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    val b0 = (0L until 64L).map(i => (i, s"rp-${i % 16}"))
    val b1 = (100L until 164L).map(i => (i, s"rp-${i % 16}"))
    FpIndex.mergeBatch(spark, root, manifest, delta(b0), 0L)
    val want = FpIndex.read(spark, manifest).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    // full re-delivery of a committed batch: short-circuits, nothing changes
    FpIndex.mergeBatch(spark, root, manifest, delta(b0), 0L)
    assert(manifest.deltas.values.forall(_.size <= 1), "replay re-appended delta paths")
    val got = FpIndex.read(spark, manifest).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == want, "replayed batch changed the index")
    // mid-ingest retry: simulate a batch that wrote its delta + manifest
    // entries but died before the commit mark, then re-ran — path dedupe
    // makes the second run converge to the same state
    manifest.committed -= 0L
    FpIndex.mergeBatch(spark, root, manifest, delta(b0), 0L)
    assert(manifest.deltas.values.forall(_.size <= 1), "retry duplicated delta paths")
    assert(FpIndex.read(spark, manifest).collect().toSeq.map(_.toSeq).sortBy(_.toString) == want)
    // and a NEW batch after the replays behaves normally
    FpIndex.mergeBatch(spark, root, manifest, delta(b1), 1L)
    val want01 = delta(b0 ++ b1).groupBy("fp")
      .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
    val got01 = FpIndex.read(spark, manifest)
    assert(got01.exceptAll(want01).count() == 0 && want01.exceptAll(got01).count() == 0)
  }

  test("FpIndex: the committed manifest recovers the index (and its replay guard) after restart") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_rec_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    // 5 batches over a shared universe: crosses the compaction threshold,
    // so recovery must see base + post-compaction deltas, not just piles
    val batches = (0 until 5).map { k =>
      (0L until 48L).map(i => (k * 100L + i, s"rec-${i % 24}"))
    }
    batches.zipWithIndex.foreach { case (b, k) =>
      FpIndex.mergeBatch(spark, root, manifest, delta(b), k.toLong)
    }
    assert(manifest.base.nonEmpty, "test setup must cross the compaction threshold")
    val want = FpIndex.read(spark, manifest).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    // restart: all driver state gone, only the directory remains
    val recovered = FpIndex.recover(spark, root)
    assert(recovered.committed == manifest.committed, "committed batchIds lost on recovery")
    assert(recovered.base.toMap == manifest.base.toMap)
    assert(recovered.deltas.toMap == manifest.deltas.toMap)
    val got = FpIndex.read(spark, recovered).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got == want, "recovered index diverged")
    // the replay guard survives the restart: re-delivering the last batch
    // through the RECOVERED manifest is a no-op
    FpIndex.mergeBatch(spark, root, recovered, delta(batches(4)), 4L)
    val got2 = FpIndex.read(spark, recovered).collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(got2 == want, "post-recovery replay changed the index")
    // and ingest continues normally from the recovered state
    val b5 = (500L until 548L).map(i => (i, s"rec-${i % 24}"))
    FpIndex.mergeBatch(spark, root, recovered, delta(b5), 5L)
    val wantAll = delta(batches.flatten ++ b5).groupBy("fp")
      .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
    val gotAll = FpIndex.read(spark, recovered)
    assert(gotAll.exceptAll(wantAll).count() == 0 && wantAll.exceptAll(gotAll).count() == 0)
    // an index root that never existed recovers as the empty index
    val none = FpIndex.recover(spark, root + "-never-existed")
    assert(none.allPaths.isEmpty && none.committed.isEmpty)
  }

  test("FpIndex: an empty (never-ingested) index reads as the empty relation") {
    import graft.streaming.FpIndex
    val got = FpIndex.read(spark, new FpIndex.Manifest)
    assert(got.columns.toSeq == Seq("fp", "keeper", "copies"))
    assert(got.count() == 0)
  }

  test("FpIndex: a pinned reader snapshot survives a concurrent compaction byte-identically") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_pin_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    val batches = (0 until 4).map { k =>
      (0L until 48L).map(i => (k * 100L + i, s"pin-${i % 24}"))
    }
    // three batches below the threshold, then PIN a reader snapshot
    (0 until 3).foreach(k => FpIndex.mergeBatch(spark, root, manifest, delta(batches(k)), k.toLong))
    val snap = FpIndex.pin(manifest, 2L)
    val want = FpIndex.readSnapshot(spark, snap)
      .collect().toSeq.map(_.toSeq).sortBy(_.toString)
    // batch 3 fires the compaction that supersedes every pinned delta;
    // GC must DEFER those paths (a reader is iterating), not delete them
    FpIndex.mergeBatch(spark, root, manifest, delta(batches(3)), 3L)
    assert(manifest.base.nonEmpty, "setup must cross the compaction threshold")
    snap.paths.foreach(p => assert(new java.io.File(p).exists(),
      s"pinned path GC'd under a live reader: $p"))
    assert(manifest.deferredGc.nonEmpty, "compaction should have deferred pinned paths")
    // the reader re-resolves the SAME bytes mid/post-compaction
    val gotDuring = FpIndex.readSnapshot(spark, snap)
      .collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(gotDuring == want, "pinned snapshot changed under compaction")
    // a fresh (unpinned) read sees the post-compaction state, exact
    val wantAll = delta(batches.flatten).groupBy("fp")
      .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
    val gotAll = FpIndex.read(spark, manifest)
    assert(gotAll.exceptAll(wantAll).count() == 0 && wantAll.exceptAll(gotAll).count() == 0)
    // unpin reclaims exactly the deferred superseded files
    FpIndex.unpin(spark, manifest, snap)
    assert(manifest.deferredGc.isEmpty && manifest.pinned.isEmpty)
    snap.paths.filterNot(manifest.allPaths.contains).foreach(p =>
      assert(!new java.io.File(p).exists(), s"deferred GC not reclaimed on unpin: $p"))
  }

  test("FpIndex: a persist-time crash during compaction retries without double-counting (ADVICE r14)") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_flt_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    val batches = (0 until 4).map { k =>
      (0L until 48L).map(i => (k * 100L + i, s"flt-${i % 24}"))
    }
    (0 until 3).foreach(k => FpIndex.mergeBatch(spark, root, manifest, delta(batches(k)), k.toLong))
    // inject: the COMPACTING batch's persist write itself throws — the
    // exact window ADVICE r14 named (old code had already emptied the
    // delta piles, so the retry re-appended a consumed delta and
    // double-counted its copies in every later read)
    FpIndex.persistFault = v => if (v == 3L) throw new java.io.IOException("injected persist fault")
    try {
      intercept[java.io.IOException] {
        FpIndex.mergeBatch(spark, root, manifest, delta(batches(3)), 3L)
      }
    } finally FpIndex.persistFault = _ => ()
    // the live manifest must still be the PRE-compaction state: piles
    // intact (4 deltas incl. the re-appended-safe batch-3 path), no base
    assert(manifest.base.isEmpty, "persist fault leaked a half-compacted manifest")
    assert(!manifest.committed.contains(3L))
    // foreachBatch re-delivers batch 3: the retry compacts and commits
    FpIndex.mergeBatch(spark, root, manifest, delta(batches(3)), 3L)
    assert(manifest.base.nonEmpty && manifest.committed.contains(3L))
    val wantAll = delta(batches.flatten).groupBy("fp")
      .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
    val gotAll = FpIndex.read(spark, manifest)
    assert(gotAll.exceptAll(wantAll).count() == 0 && wantAll.exceptAll(gotAll).count() == 0,
      "retry after persist fault double-counted a batch")
  }

  test("FpIndex: a double unpin of the same snapshot is a no-op (ADVICE r15)") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_dup_").toString
    val manifest = new FpIndex.Manifest
    def delta(rows: Seq[(Long, String)]) =
      rows.toDF("doc_id", "text")
        .select(md5(col("text").cast("binary")).as("fp"),
          col("doc_id").as("keeper"), lit(1L).as("copies"))
    val batches = (0 until 4).map { k =>
      (0L until 48L).map(i => (k * 100L + i, s"dup-${i % 24}"))
    }
    (0 until 3).foreach(k => FpIndex.mergeBatch(spark, root, manifest, delta(batches(k)), k.toLong))
    // TWO independent readers pin the same committed version
    val snapA = FpIndex.pin(manifest, 2L)
    val snapB = FpIndex.pin(manifest, 2L)
    FpIndex.mergeBatch(spark, root, manifest, delta(batches(3)), 3L)
    assert(manifest.deferredGc.nonEmpty, "setup: compaction must defer pinned paths")
    // releasing A twice must NOT steal B's pins: the old over-decrement
    // would drop shared refcounts to 0 and GC files B still reads
    FpIndex.unpin(spark, manifest, snapA)
    FpIndex.unpin(spark, manifest, snapA)
    snapB.paths.foreach(p => assert(new java.io.File(p).exists(),
      s"double unpin of A reclaimed a file still pinned by B: $p"))
    val want = delta(batches.take(3).flatten).groupBy("fp")
      .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
      .collect().toSeq.map(_.toSeq).sortBy(_.toString)
    val gotB = FpIndex.readSnapshot(spark, snapB)
      .collect().toSeq.map(_.toSeq).sortBy(_.toString)
    assert(gotB == want, "reader B's snapshot corrupted by A's double release")
    FpIndex.unpin(spark, manifest, snapB)
    assert(manifest.deferredGc.isEmpty && manifest.pinned.isEmpty)
  }

  test("FpIndex: a second concurrent in-process writer fails loudly (VERDICT r15 #8)") {
    import graft.streaming.FpIndex
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_wr_").toString
    val manifest = new FpIndex.Manifest
    val delta = Seq((1L, "w-a"), (2L, "w-b")).toDF("doc_id", "text")
      .select(md5(col("text").cast("binary")).as("fp"),
        col("doc_id").as("keeper"), lit(1L).as("copies"))
    // simulate an in-flight writer holding the guard
    assert(manifest.writing.compareAndSet(false, true))
    val e = intercept[IllegalStateException] {
      FpIndex.mergeBatch(spark, root, manifest, delta, 0L)
    }
    assert(e.getMessage.contains("single-writer"))
    manifest.writing.set(false)
    // the real writer proceeds normally afterwards
    FpIndex.mergeBatch(spark, root, manifest, delta, 0L)
    assert(manifest.committed.contains(0L))
  }

  test("FpIndex: the cross-process writer lease is exclusive and releasable (VERDICT r15 #8)") {
    import graft.streaming.FpIndex
    val root = java.nio.file.Files.createTempDirectory("graft_fpidx_lease_").toString
    FpIndex.acquireWriterLease(spark, root, "writer-1")
    val e = intercept[IllegalStateException] {
      FpIndex.acquireWriterLease(spark, root, "writer-2")
    }
    assert(e.getMessage.contains("writer-1"), s"lease error must name the holder: ${e.getMessage}")
    FpIndex.releaseWriterLease(spark, root)
    FpIndex.acquireWriterLease(spark, root, "writer-2") // now free
    FpIndex.releaseWriterLease(spark, root)
    // the lock file is metadata, not index state: recovery ignores it
    val m = FpIndex.recover(spark, root)
    assert(m.allPaths.isEmpty && m.committed.isEmpty)
  }
}
