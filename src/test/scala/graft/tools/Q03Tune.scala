package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement for VERDICT r2 item 7: does pre-aggregating lineitem
  * revenue by orderkey BEFORE the orders join (narrower shuffle) close any
  * of q03's gap? Both variants keep the fact-fact shuffle on orderkey (the
  * 100 TB-safe shape). Also measures the q05 equivalent. Not part of the
  * driver contract.
  */
object Q03Tune {
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
    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100).cast("long")

    // current q03: join full lineitem to orders, then aggregate
    def q03_current(): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t("orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = t("lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    // pre-agg variant: collapse lineitem to one row per orderkey first
    def q03_preagg(): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t("orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val lrev = t("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      lrev.join(o, col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    def time(label: String, f: () => DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      f().write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-14s min=${times.min}%.3f  runs=${times.map(x => f"$x%.3f").mkString(",")}")
    }

    // current q05: all joins then filter/agg (Catalyst pushes the filter)
    def q05_current(): DataFrame = {
      val r = t("region"); val n = t("nation"); val c = t("customer")
      val o = t("orders"); val l = t("lineitem"); val su = t("supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") && su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    // variant: broadcast supplier into lineitem, pre-agg revenue by
    // (orderkey, supplier nation) before the orderkey shuffle
    def q05_preagg(): DataFrame = {
      val r = t("region"); val n = t("nation"); val c = t("customer")
      val su = t("supplier").select(col("s_suppkey"), col("s_nationkey"))
      val o = t("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val lrev = t("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("s_nationkey"))
        .agg(sum(col("rev")).as("rev"))
      lrev.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    // preagg + orders side hinted SHUFFLE_HASH (skip both sort passes of
    // the lrev-orders sort-merge; lrev reuses the aggregate partitioning)
    def q03_preagg_sh(): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t("orders").filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val lrev = t("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
      lrev.join(o.hint("shuffle_hash"), col("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    // variant: identical join tree, but the two fact-side joins hinted to
    // SHUFFLE_HASH — skips the sort on both sides of each sort-merge join
    // (build side must fit a partition's memory; with AQE partition sizing
    // that holds at any scale where the hash side is the smaller fact)
    def q05_shufflehash(): DataFrame = {
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

    // r12 variant: REDUCE the orders side before the fact-fact shuffle —
    // o ⨝ broadcast(customer BUILDING) first (1/5 survivors), THEN the
    // orderkey shuffle join, THEN aggregate. The post-join groupBy rides
    // the join's hash partitioning (no extra exchange), and the
    // shuffle_hash hint builds on the small filtered-orders side so
    // NEITHER side is ever sorted. Catalyst can't discover this plan from
    // the shipped tree: join reorder across a user-specified tree needs
    // CBO stats it doesn't have here.
    def q03_joinfirst_sh(): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o2 = t("orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
      val l2 = t("lineitem").select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      l2.join(o2.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    // same join-first tree without the hint (sort-merge baseline)
    def q03_joinfirst(): DataFrame = {
      val c = t("customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o2 = t("orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
      val l2 = t("lineitem").select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      l2.join(o2, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    // equality check first
    val a = q03_current().collect().map(_.toSeq).toSeq
    val b = q03_preagg().collect().map(_.toSeq).toSeq
    println(s"q03 results equal: ${a == b}")
    val jf = q03_joinfirst_sh().collect().map(_.toSeq).toSeq
    val jf2 = q03_joinfirst().collect().map(_.toSeq).toSeq
    println(s"q03 joinfirst_sh equal: ${a == jf}; joinfirst equal: ${a == jf2}")
    time("q03_joinfirst_sh", q03_joinfirst_sh _)
    time("q03_joinfirst", q03_joinfirst _)
    val a5 = q05_current().collect().map(_.toSeq).toSeq
    val b5 = q05_preagg().collect().map(_.toSeq).toSeq
    println(s"q05 results equal: ${a5 == b5}")
    val b2 = q03_preagg_sh().collect().map(_.toSeq).toSeq
    println(s"q03 preagg_sh equal: ${a == b2}")
    time("q03_current", q03_current _)
    time("q03_preagg", q03_preagg _)
    time("q03_preagg_sh", q03_preagg_sh _)
    val c5 = q05_shufflehash().collect().map(_.toSeq).toSeq
    println(s"q05 shuffle_hash equal: ${a5 == c5}")
    time("q05_current", q05_current _)
    time("q05_preagg", q05_preagg _)
    time("q05_shufflehash", q05_shufflehash _)
    spark.stop()
  }
}
