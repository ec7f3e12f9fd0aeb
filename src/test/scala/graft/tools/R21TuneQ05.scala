package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of q05 join shapes in ONE JVM (cross-invocation sbt
  * timings vary 2x with host noise): A = dims joined after the fact join
  * (r20 shape), B = nation/region pre-joined into customer (r21 shape).
  * `Test/runMain graft.tools.R21TuneQ05` at SPARK_GRAFT_SF_DIR.
  * Measurement tooling only.
  */
object R21TuneQ05 {
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

    def tbl(n: String): DataFrame =
      spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100).cast("long")

    def mk(preJoinDims: Boolean): DataFrame = {
      val r = tbl("region"); val n = tbl("nation")
      val su = tbl("supplier"); val o = tbl("orders")
      val l = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
      val base =
        if (preJoinDims) {
          val c = tbl("customer")
            .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
            .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
            .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
          l.join(o, l("l_orderkey") === o("o_orderkey"))
            .join(su, l("l_suppkey") === su("s_suppkey"))
            .join(c, o("o_custkey") === c("c_custkey") &&
              su("s_nationkey") === c("c_nationkey"))
        } else {
          val c = tbl("customer")
          l.join(o, l("l_orderkey") === o("o_orderkey"))
            .join(su, l("l_suppkey") === su("s_suppkey"))
            .join(c, o("o_custkey") === c("c_custkey") &&
              su("s_nationkey") === c("c_nationkey"))
            .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
            .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        }
      base
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm both
    noop(mk(false)); noop(mk(true)); noop(mk(false)); noop(mk(true))
    val reps = 8
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) {
      var t0 = System.nanoTime(); noop(mk(false)); ta += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(mk(true)); tb += (System.nanoTime() - t0) / 1e9
    }
    def st(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"""A dims-after-fact : ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}""")
    println(s"""B dims-into-cust  : ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}""")
    spark.stop()
  }
}
