package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.tools.LaneKit

/** VERDICT r16 #3 — the DRIVER-RESTART recovery drill the MemoryStream
  * gates can't express: stream16/stream20/stream21's admission discipline
  * re-hosted on a real FileStreamSource with a checkpointLocation, run in a
  * CHILD JVM that `Runtime.halt()`s itself mid-stream (a genuine driver
  * crash: no shutdown hooks, no finally blocks), restarted from the same
  * checkpoint, and required to produce a ledger and admitted-key index
  * BYTE-EQUAL to an uninterrupted run.
  *
  * Two crash points are drilled in one interrupted sequence per lane:
  *   - "post": after the lane's own ledger commit but BEFORE Spark's
  *     commit-log entry for the batch — Spark must replay the batch, and
  *     the lane's committed-batchId guard (ledger file exists) must no-op.
  *   - "mid": after the index delta write but BEFORE the ledger commit —
  *     replay must overwrite the delta idempotently and commit once.
  *
  * Recovery contract under test (streaming/FpIndex.scala discipline, here
  * in the gates' inline parquet-delta shape): the FileStreamSource offsets
  * log replays exactly the crashed batch's files; per-batch artifacts are
  * (1) delta parquet at a batchId-derived path, overwrite-idempotent, then
  * (2) the ledger row as an atomic rename — write order IS the commit
  * marker. State rebuild on restart = list committed ledger rows.
  *
  *   parent: Test/runMain graft.queries.RestartLane drive [sfDir] [outJson]
  *   child:  (spawned) RestartLane child <lane> <feed> <ckpt> <idx> <led>
  *             <killAfter> <killPoint>
  */
object RestartLane {

  // ---------- per-lane fingerprinting: batch df -> (doc_id, key cols) ----------
  private def keysOf(lane: String, s: SparkSession, batch: DataFrame): (DataFrame, Seq[String]) =
    lane match {
      case "lane16" => // minhash band admission (stream16 shape)
        (TextDedup.bandKeysOfSig(TextDedup.minhashSigRaw(batch.select("doc_id", "text"))),
          Seq("band", "key"))
      case "lane20" => // exact-substring 50-token run admission (stream20 shape)
        (batch.select(col("doc_id"),
          posexplode(graft.functions.SubstringRunFps.substring_run_fps(col("text"), 50))
            .as(Seq("i", "fp"))).select("doc_id", "fp"),
          Seq("fp"))
      case "lane21" => // media audio-fp admission (stream21 shape)
        import s.implicits._
        val rows = batch.select(col("doc_id")).as[Long]
          .map(id => graft.ops.Multimodal.MediaRow(id,
            graft.ops.Multimodal.syntheticTrackPcm(id)))
          .toDF("doc_id", "payload")
        (rows.select(col("doc_id"),
          graft.functions.AudioFp.audio_fp(col("payload"), 8, 32, 11200000L).as("fp")),
          Seq("fp"))
      case other => sys.error(s"unknown lane $other")
    }

  // ---------- child: run the admission stream, optionally crash ----------
  private def runChild(args: Array[String]): Unit = {
    val Array(lane, feedDir, ckptDir, idxRoot, ledgerDir, killAfterS, killPoint) = args
    val killAfter = killAfterS.toLong
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName(s"restart-drill-$lane")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(ledgerDir))

    // recovery: committed batches are exactly the ledger rows on disk
    def committedIds(): Set[Long] =
      Option(new java.io.File(ledgerDir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("b\\d+\\.json")).map(_.getName.drop(1).dropRight(5).toLong).toSet
    val committed = scala.collection.mutable.Set[Long]() ++ committedIds()
    val idxPaths = scala.collection.mutable.ArrayBuffer[String]() ++
      committed.toSeq.sorted.map(b => s"$idxRoot/b$b")
        .filter(p => new java.io.File(p).exists)

    val feed = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(feedDir)
    val q = feed.writeStream.outputMode("append")
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (committed.contains(batchId) || batch.isEmpty) () // replay no-op
        else {
          val (keys, keyCols) = keysOf(lane, spark, batch)
          val k = keys.persist()
          val hits =
            if (idxPaths.isEmpty) k.filter(lit(false)).select("doc_id")
            else k.join(spark.read.parquet(idxPaths.toSeq: _*), keyCols, "left_semi")
              .select("doc_id").distinct()
          val nArrived = batch.select("doc_id").distinct().count()
          val nRejected = hits.count()
          val dout = s"$idxRoot/b$batchId"
          k.join(hits, Seq("doc_id"), "left_anti")
            .select(keyCols.map(col): _*).distinct()
            .write.mode("overwrite").parquet(dout) // (1) delta — idempotent
          val nNewKeys = spark.read.parquet(dout).count()
          if (killAfter == batchId && killPoint == "mid")
            Runtime.getRuntime.halt(137) // crash BETWEEN delta and ledger commit
          if (!idxPaths.contains(dout)) idxPaths += dout
          val row = s"""{"batch":$batchId,"n_arrived":$nArrived,"n_rejected":$nRejected,"n_admitted":${nArrived - nRejected},"n_new_keys":$nNewKeys}"""
          val tmp = Paths.get(ledgerDir, s"b$batchId.json.tmp")
          Files.write(tmp, row.getBytes("UTF-8")) // (2) ledger — atomic rename commit
          Files.move(tmp, Paths.get(ledgerDir, s"b$batchId.json"),
            StandardCopyOption.ATOMIC_MOVE)
          committed += batchId
          k.unpersist()
          if (killAfter == batchId && killPoint == "post")
            Runtime.getRuntime.halt(137) // crash AFTER our commit, BEFORE Spark's
          ()
        }
      }.start()
    q.awaitTermination()
    spark.stop()
  }

  // ---------- parent: feeds, child spawning, equality adjudication ----------
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(args: Seq[String]): Int = {
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++
      Seq("-Xmx6g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.queries.RestartLane", "child") ++ args
    val pb = new ProcessBuilder(cmd: _*).inheritIO()
    pb.start().waitFor()
  }

  private def readLedger(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("b\\d+\\.json")).sortBy(_.getName.drop(1).dropRight(5).toLong)
      .map(f => new String(Files.readAllBytes(f.toPath), "UTF-8")).toSeq

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("child")) { runChild(args.drop(1)); return }
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1"))
    val outJson = args.lift(2).getOrElse("/root/repo/bench/restart_drill_r17.json")
    val root = "/tmp/restart_drill"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one feed per lane: 8 single-file batches, modTimes pin the order
    def buildFeed(lane: String): String = {
      val dir = s"$root/$lane/feed"
      val docs = Tables.load(spark, sfDir, "documents")
        .filter(if (lane == "lane21") col("doc_id") % 10 === 5 && col("doc_id") < 4000
                else col("doc_id") < 2000)
        .select(col("doc_id").cast("long").as("doc_id"),
          (if (lane == "lane21") lit("") else col("text")).as("text"))
      // lane21's media ids are ≡5 (mod 10) — always odd — so a plain %8
      // slice leaves half the feed files EMPTY and the kill batches never
      // fire; dividing by 10 first spreads the slice over all 8 files
      // (stream21's gate comment documents the same trap)
      val sliceKey = // integer div: Column./ is DOUBLE division and never === an int
        if (lane == "lane21") expr("(doc_id div 10) % 8") else col("doc_id") % 8
      (0 until 8).foreach { i =>
        val tmp = s"$dir/_stage$i"
        docs.filter(sliceKey === i).coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(s"$dir/batch_$i.parquet")
        Files.move(part.toPath, dst.toPath)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        dst.setLastModified(1700000000000L + i * 2000L) // strict arrival order
      }
      dir
    }

    val results = scala.collection.mutable.ArrayBuffer[String]()
    var ok = true
    for (lane <- Seq("lane16", "lane20", "lane21")) {
      val feed = buildFeed(lane)
      def dirs(run: String) =
        (s"$root/$lane/$run/ckpt", s"$root/$lane/$run/idx", s"$root/$lane/$run/ledger")
      // A: uninterrupted baseline
      val (ckA, ixA, ldA) = dirs("A")
      val rcA = spawn(Seq(lane, feed, ckA, ixA, ldA, "-1", "none"))
      // B: crash post-commit at batch 2, resume, crash mid-batch at 5, resume
      val (ckB, ixB, ldB) = dirs("B")
      val rc1 = spawn(Seq(lane, feed, ckB, ixB, ldB, "2", "post"))
      val rc2 = spawn(Seq(lane, feed, ckB, ixB, ldB, "5", "mid"))
      val rc3 = spawn(Seq(lane, feed, ckB, ixB, ldB, "-1", "none"))
      val ledgerEq = readLedger(ldA) == readLedger(ldB) && readLedger(ldA).size == 8
      val fpA = LaneKit.fingerprint(spark.read.parquet(s"$ixA/*"))
      val fpB = LaneKit.fingerprint(spark.read.parquet(s"$ixB/*"))
      val laneOk = rcA == 0 && rc1 == 137 && rc2 == 137 && rc3 == 0 &&
        ledgerEq && fpA == fpB
      ok &= laneOk
      val r = s"""{"lane":"$lane","rc":[$rcA,$rc1,$rc2,$rc3],"ledger_rows":${readLedger(ldA).size},"ledger_equal":$ledgerEq,"index_fp_equal":${fpA == fpB},"index_rows":${fpA._1},"ok":$laneOk}"""
      println(s"[restart-drill] $r")
      results += r
    }
    val out = s"""{"drill":"driver-restart","sf":"$sfDir","crash_points":["post-commit@2","mid-batch@5"],"lanes":[${results.mkString(",")}],"ok":$ok}"""
    Files.write(Paths.get(outJson), out.getBytes("UTF-8"))
    println(s"[restart-drill] $out")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
