package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B of dd08's band self-join strategy (guide §3.1):
  * A = production (hint("merge") — the r21 scale-safety pin) vs
  * B = hint("shuffle_hash") (skips both partition sorts; build side is one
  * partition of the band frame, spill-graceful via AQE skew split).
  * Run at SPARK_GRAFT_SF_DIR via
  * `tools/run_tool.sh graft.tools.R22TuneDd08 80g`. Per-pair steal
  * metering, results asserted identical. Measurement tooling only.
  */
object R22TuneDd08 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty).map(sizeOf).sum
      else f.length
    val totalBytes = {
      val fs = Option(new java.io.File(sfDir).listFiles)
        .map(_.toSeq).getOrElse(Seq.empty)
      fs.filter(_.getName.endsWith(".parquet")).map(sizeOf).sum
    }
    val sp = math.max(4L, math.min(totalBytes / (8L << 20), cpus.toInt * 2L))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", (totalBytes > (256L << 20)).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes",
        math.max(8L << 20, totalBytes / (cpus.toInt * 3L)).toString)
      .config("spark.sql.files.minPartitionNum",
        math.max(1L, math.min(totalBytes / (4L << 20), cpus.toLong)).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"tune-dd08 sf=$sfDir sp=$sp bytes=$totalBytes")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")

    // dd08's exact pipeline, parameterized by the self-join hint
    def dd08(hint: String): DataFrame = {
      val sigs = tbl("documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
          graft.functions.MinHashSig.minhash_sig(col("text")).as("sig"))
        .groupBy("fp").agg(min(struct(col("doc_id"), col("sig"))).as("k"))
        .select(col("k.doc_id").as("doc_id"), col("k.sig").as("sig"))
      val bands = sigs.select(col("doc_id"),
        explode(when(col("sig").isNotNull, array((0 until 4).map(bi =>
          struct(lit(bi).as("band"),
            concat_ws("_", element_at(col("sig"), 2 * bi + 1),
              element_at(col("sig"), 2 * bi + 2)).as("key"))): _*))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val x = bands.as("x")
      val y = bands.as("y").hint(hint)
      x.join(y, col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
        .agg(count(lit(1)).as("shared_bands"))
        .groupBy("shared_bands")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("shared_bands")
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def steal(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }

    val ra = dd08("merge").collect().map(_.toString).sorted
    val rb = dd08("shuffle_hash").collect().map(_.toString).sorted
    require(ra.sameElements(rb), "dd08 A/B results differ!")
    println(s"dd08 results identical (${ra.length} rows)")
    // plan fingerprints
    Seq("merge" -> "A", "shuffle_hash" -> "B").foreach { case (h, t) =>
      val p = dd08(h).queryExecution.executedPlan.toString
      println(s"dd08 $t($h) plan: SMJ=${p.contains("SortMergeJoin")} " +
        s"SHJ=${p.contains("ShuffledHashJoin")} " +
        s"exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size}")
    }
    noop(dd08("merge")); noop(dd08("shuffle_hash"))
    noop(dd08("merge")); noop(dd08("shuffle_hash"))
    val pairs = scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]()
    for (_ <- 1 to 12) {
      val s0 = steal()
      var t0 = System.nanoTime(); noop(dd08("merge")); val tA = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(dd08("shuffle_hash")); val tB = (System.nanoTime() - t0) / 1e9
      pairs += ((tA, tB, steal() - s0))
    }
    pairs.foreach { case (a, b, s) => println(f"dd08 pair A=$a%.3f B=$b%.3f steal=$s") }
    val quiet = pairs.filter(_._3 <= 100)
    def st(xs: Seq[Double]) =
      if (xs.isEmpty) "n/a"
      else f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"dd08 A merge:        all ${st(pairs.map(_._1).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._1).toSeq)}")
    println(s"dd08 B shuffle_hash: all ${st(pairs.map(_._2).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._2).toSeq)}")
    spark.stop()
  }
}
