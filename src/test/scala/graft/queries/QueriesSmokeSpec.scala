package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run at sf0.001 and produce a stable schema;
  * full value correctness is the driver's DuckDB gate (tools/compare_oracle.py
  * mimics it locally at sf0.01). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("every query has an oracle or a documented reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  // Schema-drift canary (VERDICT r10 #3): the driver has regenerated
  // /root/testdata with different parquet timestamp shapes twice (nanos →
  // NTZ micros); each time every event-time query broke at analysis. This
  // pins the ONE invariant all of them rely on: after Tables.load, ts is a
  // true UTC-adjusted TimestampType — whatever the writer produced.
  test("events.ts loads as TimestampType at every sf") {
    import org.apache.spark.sql.types.TimestampType
    for (sfn <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sfn"
      if (new java.io.File(dir).isDirectory) {
        val dt = Tables.load(spark, dir, "events").schema("ts").dataType
        assert(dt == TimestampType, s"sf$sfn events.ts loaded as $dt")
      }
    }
  }

  // Same canary class for the vector column: every sim/dd embedding
  // derivation quantizes FLOAT32 coordinates (floor(x*1000)); a writer
  // drift to float64 would move values at quantization boundaries and
  // break oracle parity subtly rather than loudly. Pin the element type.
  test("embeddings.embedding loads as array<float> at every sf") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    for (sfn <- Seq("0.001", "0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sfn"
      if (new java.io.File(dir).isDirectory) {
        val dt = Tables.load(spark, dir, "embeddings").schema("embedding").dataType
        assert(dt == ArrayType(FloatType, containsNull = true) ||
          dt == ArrayType(FloatType, containsNull = false),
          s"sf$sfn embedding loaded as $dt")
      }
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      assert(df.schema.fieldNames.nonEmpty)
      // aggregate/flag queries must not be empty (pair queries may be)
      if (!Set("dd02_jaccard_pairs", "dd04_simhash_hamming", "dd05_embed_neardup",
        "dd06_neardup_exact200", "q09_setops_except", "q18_anti_join").contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
