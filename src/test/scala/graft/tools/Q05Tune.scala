package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for VERDICT r10 item 6: the remaining q05 shapes not
  * covered by the r8 negatives (Q03Tune measured pre-agg on
  * (l_orderkey, s_nationkey) with a broadcast supplier — negative).
  *
  *  - preagg_ok_sk: partial-agg lineitem revenue by (l_orderkey, l_suppkey)
  *    BEFORE the orders join (the verdict's literal ask). Shrinks the big
  *    exchange only if (orderkey, suppkey) repeats, and inserts a second
  *    exchange on the composite key ahead of the orderkey join.
  *  - preagg_cust_nat: run l ⨝ orders ⨝ supplier as shipped, then
  *    partial-agg revenue by (o_custkey, s_nationkey) BEFORE the customer
  *    join. The aggregate's exchange is on exactly the customer-join keys,
  *    so the join reuses that partitioning (no extra exchange on the fact
  *    side) and the exchanged rows narrow to 3 columns.
  * Not part of the driver contract.
  */
object Q05Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String) = graft.queries.Tables.load(spark, sfDir, n)
    def cents(c: org.apache.spark.sql.Column) = floor(c * 100).cast("long")

    // shipped q05 (Relational.scala): shuffle_hash on both fact joins
    def q05_current(): DataFrame = {
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

    // verdict ask: collapse lineitem to one row per (orderkey, suppkey)
    def q05_preagg_ok_sk(): DataFrame = {
      val r = t("region"); val n = t("nation"); val c = t("customer")
      val su = t("supplier")
      val o = t("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val lrev = t("lineitem")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
      lrev.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c.hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    // partial-agg by the CUSTOMER-join keys after the orders join: the agg
    // exchange doubles as the join distribution and narrows the rows
    def q05_preagg_cust_nat(): DataFrame = {
      val r = t("region"); val n = t("nation"); val c = t("customer")
      val o = t("orders"); val l = t("lineitem"); val su = t("supplier")
      val joined = l.join(o.hint("shuffle_hash"), l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"), col("s_nationkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev"))
      joined.join(c.hint("shuffle_hash"),
          col("o_custkey") === col("c_custkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_cents"))
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
      println(f"$label%-20s min=${times.min}%.3f  runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    val a = q05_current().collect().map(_.toSeq).toSeq
    println(s"preagg_ok_sk equal: ${a == q05_preagg_ok_sk().collect().map(_.toSeq).toSeq}")
    println(s"preagg_cust_nat equal: ${a == q05_preagg_cust_nat().collect().map(_.toSeq).toSeq}")
    time("q05_current", q05_current _)
    time("q05_preagg_ok_sk", q05_preagg_ok_sk _)
    time("q05_preagg_cust_nat", q05_preagg_cust_nat _)
    spark.stop()
  }
}
