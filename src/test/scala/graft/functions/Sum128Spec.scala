package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Sum128Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("carry adder: random longs (incl. negatives) match BigInteger exactly") {
    val rnd = new scala.util.Random(42)
    // mixes that force lo-word overflow both ways: huge positives, huge
    // negatives, alternating signs, and long runs near Long.MaxValue
    val cases = Seq(
      Seq.fill(1000)(rnd.nextLong()),
      Seq.fill(500)(Long.MaxValue) ++ Seq.fill(3)(Long.MinValue),
      Seq.fill(500)(Long.MinValue / 2) ++ Seq.fill(500)(Long.MaxValue / 3),
      Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue),
      Seq.fill(2000)(Long.MaxValue / 2 + rnd.nextInt(1000))
    )
    val agg = Sum128Agg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false))
    cases.foreach { xs =>
      val buf = agg.createAggregationBuffer()
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      xs.foreach { x => row.update(0, x); agg.update(buf, row) }
      val expect = xs.map(java.math.BigInteger.valueOf).reduce(_ add _)
      assert(Sum128Agg.toBigInteger(buf(0), buf(1)) == expect,
        s"direct update drifted for a ${xs.size}-element mix")
    }
  }

  test("merge is the same adder: split-and-merge equals direct sum") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(4000)(rnd.nextLong())
    val bound = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.LongType, nullable = false)
    val agg = Sum128Agg(bound)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    def sumOf(part: Seq[Long]): Array[Long] = {
      val b = agg.createAggregationBuffer()
      part.foreach { x => row.update(0, x); agg.update(b, row) }
      b
    }
    val merged = xs.grouped(137).map(sumOf).reduce(agg.merge)
    val expect = xs.map(java.math.BigInteger.valueOf).reduce(_ add _)
    assert(Sum128Agg.toBigInteger(merged(0), merged(1)) == expect)
    // serialize round-trip preserves the pair
    val ser = agg.deserialize(agg.serialize(merged))
    assert(ser.toSeq == merged.toSeq)
  }

  test("q58 == q56: the custom adder reproduces Spark's Decimal(38) sum") {
    // sf0.01, not sf0.001: the group totals must actually exceed int64
    // for the final assertion to exercise the 128-bit carry path
    val d = "/root/testdata/sf0.01"
    val q56 = graft.SparkEntry.queries("q56_decimal_exact_sum")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val q58 = graft.SparkEntry.queries("q58_int128_exact_sum")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(q56.toSeq == q58.toSeq)
    // and the totals really exceed int64 (the reason this family exists)
    assert(q56.exists(r => new java.math.BigInteger(r._3)
      .compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) > 0))
  }

  test("sum128_agg is reachable from pure SQL and rejects non-BIGINT input") {
    val got = spark.sql(
      "SELECT sum128_agg(x) FROM VALUES (9223372036854775807L), (1L) AS t(x)")
      .collect()(0).getString(0)
    assert(got == "9223372036854775808")
    val err = intercept[Exception] {
      spark.sql("SELECT sum128_agg(CAST(1 AS INT)) FROM VALUES (1) AS t(x)").collect()
    }
    assert(err.getMessage.contains("BIGINT"))
  }

  test("SQL SUM semantics: empty / all-NULL group yields NULL, not 0 (ADVICE r13)") {
    val allNull = spark.sql(
      "SELECT sum128_agg(x) FROM VALUES (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT)) AS t(x)")
      .collect()(0)
    assert(allNull.isNullAt(0), "all-NULL group must sum to NULL")
    val empty = spark.sql(
      "SELECT sum128_agg(x) FROM (SELECT CAST(1 AS BIGINT) AS x WHERE false)")
      .collect()(0)
    assert(empty.isNullAt(0), "empty input must sum to NULL")
    // and NULLs interleaved with values are simply skipped
    val mixed = spark.sql(
      "SELECT sum128_agg(x) FROM VALUES (1L), (CAST(NULL AS BIGINT)), (2L) AS t(x)")
      .collect()(0).getString(0)
    assert(mixed == "3")
  }
}
