package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B of dd08's r20 two-scan formulation (md5 keep
  * pass + keep-join + signatures over survivors) vs the r21 single-scan
  * one (md5 AND minhash_sig in one text pass, survivor picked by
  * min(struct(doc_id, sig)) inside the same exchange that dedups).
  * Also prints both variants' result fingerprints — the histograms must
  * be identical. `Test/runMain graft.tools.R21TuneDd08` at
  * SPARK_GRAFT_SF_DIR. Measurement tooling only.
  */
object R21TuneDd08 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
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
    println(s"tune sf=$sfDir sp=$sp bytes=$totalBytes")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")

    def bandsOf(sigs: DataFrame): DataFrame =
      sigs.select(col("doc_id"),
        explode(when(col("sig").isNotNull, array((0 until 4).map(bi =>
          struct(lit(bi).as("band"),
            concat_ws("_", element_at(col("sig"), 2 * bi + 1),
              element_at(col("sig"), 2 * bi + 2)).as("key"))): _*))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    def pairsHist(bands: DataFrame): DataFrame = {
      val x = bands.as("x"); val y = bands.as("y")
      x.join(y, col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
        .agg(count(lit(1)).as("shared_bands"))
        .groupBy("shared_bands")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("shared_bands")
    }

    // A: the r20 two-scan shape
    def oldShape(): DataFrame = {
      val doc = tbl("documents")
      val keep = doc
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
        .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      pairsHist(bandsOf(doc.join(keep, "doc_id").select(col("doc_id"),
        graft.functions.MinHashSig.minhash_sig(col("text")).as("sig"))))
    }
    // B: the r21 single-scan shape
    def newShape(): DataFrame = {
      val sigs = tbl("documents")
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"),
          graft.functions.MinHashSig.minhash_sig(col("text")).as("sig"))
        .groupBy("fp").agg(min(struct(col("doc_id"), col("sig"))).as("k"))
        .select(col("k.doc_id").as("doc_id"), col("k.sig").as("sig"))
      pairsHist(bandsOf(sigs))
    }

    // result equality first (order-insensitive fingerprint)
    def fp(df: DataFrame): String =
      df.collect().map(_.toSeq.mkString(",")).sorted.mkString(";")
    val fa = fp(oldShape()); val fb = fp(newShape())
    println(s"results equal: ${fa == fb}  (A=$fa)")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(oldShape()); noop(newShape()); noop(oldShape()); noop(newShape())
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 8) {
      var t0 = System.nanoTime(); noop(oldShape()); ta += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(newShape()); tb += (System.nanoTime() - t0) / 1e9
    }
    def st(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"dd08 A two-scan   : ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}")
    println(s"dd08 B single-scan: ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
