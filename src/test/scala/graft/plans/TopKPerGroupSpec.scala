package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TopKPerGroupSpecData {
  final case class Scored(g: Long, id: Long, score: Double)
}

/** The custom TopKPerGroup operator (logical node → injected strategy →
  * partial/final physical pair): results match the window-function
  * formulation on every shape that matters — many partitions, ties broken
  * by the id column, groups smaller than k, k = 1. */
class TopKPerGroupSpec extends AnyFunSuite {
  import TopKPerGroupSpecData._
  lazy val spark = TestSpark.spark

  private def viaOperator(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopKPerGroup.topKPerGroup(df,
        groups = Seq(col("g")), order = Seq(col("score").desc, col("id").asc), k = k)
      .select("g", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("g", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def fixture(n: Int, groups: Int, parts: Int) = {
    import spark.implicits._
    // deterministic pseudo-random scores with deliberate ties (score is
    // quantized to 8 levels so the id tiebreaker genuinely decides)
    (0 until n).map { i =>
      Scored(i % groups, i.toLong, (i * 2654435761L % 8).toDouble)
    }.toDF().repartition(parts)
  }

  test("matches window row_number across partitions, with ties") {
    val df = fixture(n = 1000, groups = 7, parts = 13)
    for (k <- Seq(1, 3, 10)) {
      assert(viaOperator(df, k) == viaWindow(df, k), s"mismatch at k=$k")
    }
  }

  test("groups smaller than k come through whole") {
    val df = fixture(n = 20, groups = 9, parts = 5) // 2-3 rows per group
    assert(viaOperator(df, 5) == viaWindow(df, 5))
  }

  test("plan shows the partial/final pair around one exchange, no sort") {
    val df = fixture(n = 100, groups = 4, parts = 8)
    val planned = TopKPerGroup.topKPerGroup(df,
      groups = Seq(col("g")), order = Seq(col("score").desc, col("id").asc), k = 3)
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerGroup"), "map-side prune missing")
    assert("(?<!Partial)TopKPerGroup".r.findFirstIn(plan).isDefined, "final phase missing")
    assert(plan.contains("Exchange"), "no exchange between phases")
    assert(!plan.contains("Sort"), "the operator must not plan a sort")
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[Scored].toDF()
    assert(viaOperator(df, 3).isEmpty)
  }

  test("partial phase flushes past the group threshold without losing rows") {
    // One input partition with 2× PartialFlushGroups distinct groups, each
    // appearing twice — once before the flush point, once after — so the
    // flush path AND the group-reappears-after-flush path both execute.
    // k=1 with score asc keeps the smaller id (= g) for every group.
    val groups = TopKPerGroupExec.PartialFlushGroups * 2
    val df = spark.range(groups * 2L).toDF("id")
      .select((col("id") % groups).as("g"), col("id"))
      .coalesce(1)
    val kept = TopKPerGroup.topKPerGroup(df,
        groups = Seq(col("g")), order = Seq(col("id").asc), k = 1)
      .agg(count(lit(1)), sum(col("id")))
      .collect()(0)
    assert(kept.getLong(0) == groups.toLong, "one row per group")
    assert(kept.getLong(1) == groups.toLong * (groups - 1) / 2,
      "kept row of group g must be id=g (the pre-flush minimum)")
  }
}
