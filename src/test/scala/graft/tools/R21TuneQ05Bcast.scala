package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B at sf10 for VERDICT r20 #1 (natural-q05 residual):
  * A = production q05 (bloom child session, SHJ hints — two fact
  * exchanges: orderkey then custkey), B = zero-fact-exchange shape —
  * the date-filtered orders and customer sides PROJECTED to their join
  * columns and broadcast explicitly, so lineitem is never shuffled at
  * all (guide §3.1: broadcast the side that fits; the projected builds
  * are ~72 MB and ~24 MB at sf10). `Test/runMain ...R21TuneQ05Bcast`.
  * Measurement tooling only.
  */
object R21TuneQ05Bcast {
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

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: Column) = floor(c * 100).cast("long")

    val qA = graft.SparkEntry.queries("q05_join5_agg")
    def mkB(): DataFrame = {
      val r = tbl("region"); val n = tbl("nation"); val su = tbl("supplier")
      val o = tbl("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val c = tbl("customer").select(col("c_custkey"), col("c_nationkey"))
      val l = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
      l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    // C: orders stays SHJ on orderkey; only CUSTOMER broadcast-projected
    // (1.5M x 16 B build) so the second fact exchange (custkey) disappears
    def mkC(): DataFrame = {
      val r = tbl("region"); val n = tbl("nation"); val su = tbl("supplier")
      val o = tbl("orders").hint("shuffle_hash")
      val c = tbl("customer").select(col("c_custkey"), col("c_nationkey"))
      val l = tbl("lineitem").select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev_cents"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(c),
          o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_cents")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    noop(qA(spark, sfDir)); noop(mkB()); noop(mkC())
    noop(qA(spark, sfDir)); noop(mkB()); noop(mkC())
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    val tc = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 6) {
      var t0 = System.nanoTime(); noop(qA(spark, sfDir)); ta += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(mkB()); tb += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); noop(mkC()); tc += (System.nanoTime() - t0) / 1e9
    }
    def st(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"A production (2 fact exchanges): ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}")
    println(s"B broadcast-projected (0 fact) : ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}")
    println(s"C cust-broadcast (1 fact exch) : ${st(tc.toSeq)} runs=${tc.map(t => f"$t%.3f").mkString(",")}")
    // result parity check (order-insensitive fingerprint)
    val fa = LaneKit.fingerprint(qA(spark, sfDir))
    val fb = LaneKit.fingerprint(mkB())
    val fc = LaneKit.fingerprint(mkC())
    println(s"parity: A=$fa B=$fb C=$fc equal=${fa == fb && fb == fc}")
    spark.stop()
  }
}
