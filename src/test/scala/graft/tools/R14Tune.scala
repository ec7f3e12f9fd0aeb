package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 sf10 measurement harness (VERDICT r13 #1/#4/#5/#3):
  *
  *  - q03/q05 shipped vs their bucketed variants' QUERY phase (q59/q60),
  *    with the one-time bucketed build timed separately — the
  *    amortization decomposition BENCH_SCALING records;
  *  - tx01 re-pair (the only r12→r13 regression) and tx28 after the
  *    native repetition_stats rewrite;
  *  - stream15 after the bucketed FpIndex rework.
  *
  * Conventions: local[32], shuffle.partitions=64, noop sink, warmed
  * best-of-3 (stream15: single timed run — it is itself a multi-batch
  * loop). Not part of the driver contract.
  */
object R14Tune {
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
      .config("spark.locality.wait", "0")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_r14_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cents(c: org.apache.spark.sql.Column) =
      floor(c * 100).cast("long")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(mk: => DataFrame): Unit = {
      noop(mk) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"q":"$name","best":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    def once(name: String)(mk: => DataFrame): Unit = {
      val t0 = System.nanoTime(); noop(mk)
      println(f"""{"q":"$name","best":${(System.nanoTime() - t0) / 1e9}%.3f,"runs":1}""")
    }

    val qs = SparkEntry.queries

    // shipped baselines, same session
    best3("q01_agg_pricing") { qs("q01_agg_pricing")(spark, sfDir) }
    best3("q03_join_topn") { qs("q03_join_topn")(spark, sfDir) }
    best3("q05_join5_agg") { qs("q05_join5_agg")(spark, sfDir) }

    // one-time bucketed build (the amortized cost), then query-only phases
    val tb0 = System.nanoTime()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .repartition(64, col("l_orderkey"))
      .write.bucketBy(64, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .repartition(64, col("o_orderkey"))
      .write.bucketBy(64, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    println(f"""{"q":"bucketed_build","best":${(System.nanoTime() - tb0) / 1e9}%.3f,"runs":1}""")

    // q59 query phase (tables pre-built)
    best3("q59_query_only") {
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = spark.table("b_orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val lrev = spark.table("b_lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      lrev.join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }
    // q60 query phase
    best3("q60_query_only") {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val c = spark.read.parquet(s"$sfDir/customer.parquet")
      val su = spark.read.parquet(s"$sfDir/supplier.parquet")
      val o = spark.table("b_orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      spark.table("b_lineitem")
        .join(o.hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .join(c.hint("shuffle_hash"),
          col("o_custkey") === c("c_custkey") &&
            su("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("n_name"))
    }

    best3("tx01_tokens") { qs("tx01_tokens")(spark, sfDir) }
    best3("tx28_repetition_filter") { qs("tx28_repetition_filter")(spark, sfDir) }
    once("stream15_incremental_index") { qs("stream15_incremental_index")(spark, sfDir) }

    spark.stop()
  }
}
