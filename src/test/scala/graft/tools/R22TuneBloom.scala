package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of q05's runtime-bloom bitmap size at sf10 (r22): the
  * stage ladder shows a ~1.2 s single-task bitmap merge on the critical
  * path (orders scan → 8 partial 15 MB bitmaps → merge → lineitem probe).
  * Spark sizes numBits from the creation side's UNFILTERED row count
  * (15M at sf10 → 120M bits, capped 134M) because the date filter's
  * selectivity is unknown without CBO stats; the actual key count is
  * ~4.5M. A = production 134217728 maxNumBits; B/C = smaller caps.
  * The bloom is advisory (false positives drop at the join), so this
  * cannot change results — asserted anyway. Measurement tooling only:
  * `tools/run_tool.sh graft.tools.R22TuneBloom 80g`.
  */
object R22TuneBloom {
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
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "256MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "512MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "5000000")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "134217728")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"tune-bloom sf=$sfDir sp=$sp bytes=$totalBytes")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: Column) = floor(c * 100).cast("long")
    def big(n: String): Boolean = sizeOf(new java.io.File(s"$sfDir/$n.parquet")) > (64L << 20)
    def shjIfBig(n: String): DataFrame = {
      val df = tbl(n); if (big(n)) df.hint("shuffle_hash") else df
    }
    // the committed r22 q05 shape
    def q05(): DataFrame = {
      val r = tbl("region"); val n = tbl("nation")
      val c = shjIfBig("customer"); val o = shjIfBig("orders")
      val su = tbl("supplier")
      val l = tbl("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
      val nr = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c,
          o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("c_nationkey"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("revenue_cents"))
        .orderBy(col("n_name"))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val variants = Seq(
      "A-134Mbits" -> "134217728",
      "B-33.5Mbits" -> "33554432",
      "C-16.8Mbits" -> "16777216")
    def withBits(bits: String)(f: => Unit): Unit = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
      f
    }
    // plan fingerprints per variant: does the injection survive the cap,
    // and what numBits literal does bloom_filter_agg carry?
    variants.foreach { case (nm, b) =>
      withBits(b) {
        val p = q05().queryExecution.executedPlan.toString
        val agg = "bloom_filter_agg\\([^)]*\\)".r.findFirstIn(p).getOrElse("ABSENT")
        println(s"$nm might_contain=${p.contains("might_contain")} agg=$agg")
      }
    }
    if (args.headOption.contains("plans")) { spark.stop(); return }
    // sanity: identical results across variants
    val ref = withBits(variants.head._2) { }
    val rows = variants.map { case (nm, b) =>
      var r: Array[String] = null
      withBits(b) { r = q05().collect().map(_.toString).sorted }
      nm -> r
    }
    require(rows.forall(_._2.sameElements(rows.head._2)), "bloom variants differ!")
    println(s"results identical across ${variants.size} variants (${rows.head._2.length} rows)")
    variants.foreach { case (_, b) => withBits(b) { noop(q05()) } } // warm
    def steal(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    val acc = variants.map(_._1).map(_ -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
    for (i <- 1 to 10) {
      val s0 = steal()
      val line = variants.map { case (nm, b) =>
        var t = 0.0
        withBits(b) {
          val t0 = System.nanoTime(); noop(q05()); t = (System.nanoTime() - t0) / 1e9
        }
        acc(nm) += t
        f"$nm=$t%.3f"
      }.mkString(" ")
      println(s"round $i $line steal=${steal() - s0}")
    }
    acc.toSeq.sortBy(_._1).foreach { case (nm, xs) =>
      println(f"$nm min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
