package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 measurement for VERDICT r4 ask #5: (a) does a SHUFFLE_HASH hint
  * on q03's orders⨝pre-agg join skip a useful sort, and (b) does q05 move
  * under an AQE advisoryPartitionSizeInBytes sweep (the default 64 MB may
  * mis-size the 60M-row fact shuffles at sf10 under the 2×-cores partition
  * cap)? Session conf mirrors Bench's sf10 derivation. Not part of the
  * driver contract; results recorded in BENCH_SCALING.md.
  */
object R8Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (18L << 20).toString)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = graft.queries.Tables.load(spark, sfDir, n)
    def cents(c: org.apache.spark.sql.Column) = floor(c * 100).cast("long")

    def q03(hintOrders: Boolean): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val o0 = t("orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val o = if (hintOrders) o0.hint("shuffle_hash") else o0
      val lrev = t("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      lrev.join(o, col("l_orderkey") === o0("o_orderkey"))
        .join(broadcast(c), o0("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    def q05(): DataFrame = {
      val r = t("region"); val n = t("nation"); val c = t("customer")
      val o = t("orders"); val l = t("lineitem"); val su = t("supplier")
      l.join(o.hint("shuffle_hash"), l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c.hint("shuffle_hash"),
          o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    def time(label: String, f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      f().write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[r8tune] $label%-28s best=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    time("q03_preagg_smj", () => q03(hintOrders = false))
    time("q03_preagg_shuffle_hash", () => q03(hintOrders = true))
    for (mb <- Seq(16, 64, 128)) {
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${mb}m")
      time(s"q05_advisory_${mb}m", () => q05())
    }
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    // Runtime bloom-filter pruning: let the date-filtered orders side build
    // a bloom that prunes lineitem BEFORE its shuffle (default creation-side
    // threshold 10 MB is far below filtered-orders' size, so it never fires
    // out of the box — raise it and measure).
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1g")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1g")
    time("q05_bloom_pruned", () => q05())
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    time("q05_bloom_off", () => q05())
    spark.stop()
  }
}
