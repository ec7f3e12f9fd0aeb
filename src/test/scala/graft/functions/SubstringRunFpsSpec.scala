package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** substring_run_fps's contract is BIT-EQUALITY with the staged
  * `transform(sequence(...), i -> md5(array_join(slice(ws, i+1, w), ' ')))`
  * derivation (which is, word for word, dd25's DuckDB oracle pipeline):
  * the zero-copy span hashing is only legal because split's separator is
  * the single space array_join re-inserts. Pinned on a real corpus slice
  * plus the separator/UTF-8 boundary cases the offset walker must get
  * right. */
class SubstringRunFpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def staged(df: org.apache.spark.sql.DataFrame, w: Int) =
    df.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(ws) - $w), " +
          s"i -> md5(array_join(slice(ws, i + 1, $w), ' ')))")).as(Seq("i", "fp")))

  private def native(df: org.apache.spark.sql.DataFrame, w: Int) =
    df.select(col("doc_id"),
      posexplode(SubstringRunFps.substring_run_fps(col("text"), w))
        .as(Seq("i", "fp")))

  test("matches the staged transform derivation on a real corpus slice (w=50 and w=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (w <- Seq(50, 3)) {
      val a = native(docs, w); val b = staged(docs, w)
      assert(a.count() === b.count(), s"w=$w row count")
      assert(a.exceptAll(b).count() === 0L, s"w=$w native-only rows")
      assert(b.exceptAll(a).count() === 0L, s"w=$w staged-only rows")
    }
  }

  test("edge cases: separator runs, leading/trailing spaces, UTF-8, short docs") {
    val tricky = Seq(
      (1L, "a b c d"), (2L, "a  b  c"), (3L, " a b c "),
      (4L, ""), (5L, "one"), (6L, "  "),
      (7L, "ünïcödé tëxt wïth ümläüts ünïcödé"),
      (8L, "x x x x x"), (9L, "ab")).toDF("doc_id", "text")
    for (w <- Seq(2, 3)) {
      val a = native(tricky, w); val b = staged(tricky, w)
      assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L,
        s"w=$w mismatch")
      assert(a.count() === b.count())
    }
    // sub-w docs yield NULL (→ nothing after posexplode)
    val nulls = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(SubstringRunFps.substring_run_fps(col("text"), 3))
      .collect()(0)
    assert(nulls.isNullAt(0))
  }

  test("binary variant is the unhex bijection of the hex fps (real corpus slice)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val paired = docs.select(col("doc_id"),
        SubstringRunFps.substring_run_fps(col("text"), 50).as("hex"),
        SubstringRunFps.substring_run_fps_bin(col("text"), 50).as("bin"))
      .filter(col("hex").isNotNull)
      .select(posexplode(arrays_zip(col("hex"), col("bin"))).as(Seq("i", "z")))
      .select(col("z.hex").as("hex"), col("z.bin").as("bin"))
    assert(paired.filter(unhex(col("hex")) =!= col("bin")).count() === 0L)
    assert(paired.count() > 0L)
  }

  test("SQL registration: substring_run_fps callable from pure SQL, literal-w enforced") {
    Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .createOrReplaceTempView("srf_probe")
    val viaSql = spark.sql(
      "SELECT substring_run_fps(text, 2) AS fps FROM srf_probe")
      .collect()(0).getSeq[String](0)
    val viaDsl = Seq("alpha beta gamma delta").toDF("text")
      .select(SubstringRunFps.substring_run_fps(col("text"), 2))
      .collect()(0).getSeq[String](0)
    assert(viaSql === viaDsl && viaSql.length === 3)
    val err = intercept[Exception] {
      spark.sql("SELECT substring_run_fps(text, doc_id) FROM srf_probe").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
