package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B of q05's runtime bloom filter at sf10 (VERDICT r20 #1:
  * decompose the natural-q05 residual): A = production path (bloom ON via
  * bloomChildSession's 256 MB recalibrated gate), B = bloom suppressed by
  * pinning the application-side threshold to 1PB on the root session (the
  * child honors caller-pinned non-default values). Both run the REAL
  * SparkEntry query. `Test/runMain graft.tools.R21TuneQ05Sf10`.
  * Measurement tooling only.
  */
object R21TuneQ05Sf10 {
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions",
        math.max(4L, math.min(totalBytes / (8L << 20), cpus.toInt * 2L)).toString)
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

    val rootA = spark // bloom fires through the child's 256MB gate
    val rootB = spark.newSession()
    rootB.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1PB") // pinned non-default rides into the child -> bloom never fires

    val q = graft.SparkEntry.queries("q05_join5_agg")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(q(rootA, sfDir)); noop(q(rootB, sfDir))
    noop(q(rootA, sfDir)); noop(q(rootB, sfDir))
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 6) {
      var t0 = System.nanoTime(); noop(q(rootA, sfDir)); ta += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(q(rootB, sfDir)); tb += (System.nanoTime() - t0) / 1e9
    }
    def st(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"A bloom-on : ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}")
    println(s"B bloom-off: ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
