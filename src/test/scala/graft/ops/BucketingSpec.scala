package graft.ops

import graft.TestSpark
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the 100 TB shuffle-elimination lever: two
  * fact tables bucketed (and sorted) on the join key join WITHOUT any
  * shuffle exchange, because the bucketing guarantees matching partitioning
  * on both sides. Asserted against the physical plan, not assumed.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    Tables.load(spark, sf, "orders").write.mode("overwrite")
      .format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    Tables.load(spark, sf, "lineitem").write.mode("overwrite")
      .format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      // force the sort-merge path so the assertion is about bucketing,
      // not about a broadcast hiding the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val o = spark.table("orders_bucketed")
      val l = spark.table("lineitem_bucketed")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "expected sort-merge join")
      // the join itself introduces no exchange; only the final tiny
      // group-by (3 statuses) shuffles
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        "bucketed join should not shuffle either side")
      // result parity with the unbucketed plan
      val expect = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
