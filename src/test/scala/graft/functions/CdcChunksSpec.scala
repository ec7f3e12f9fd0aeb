package graft.functions

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** cdc_chunks's contract is BIT-EQUALITY with the staged dd24 pipeline
  * (posexplode split-on-space words, drop empties, h28-mod-8 boundary
  * flag, doc-window prefix sum with boundary-ends-chunk, per-chunk
  * sorted concat_ws + md5 + length) — which is, stage for stage, dd24's
  * DuckDB oracle. Pinned on a real corpus slice plus separator/UTF-8/
  * degenerate cases the byte walker must get right. */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h28(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")

  /** The pre-r16b dd24 derivation, verbatim. */
  private def staged(df: org.apache.spark.sql.DataFrame, mod: Int) = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos")).rowsBetween(Window.unboundedPreceding, 0)
    df.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(length(col("word")) >= 1)
      .withColumn("b", when(h28(col("word")) % mod === 0, 1L).otherwise(0L))
      .withColumn("chunk", sum(col("b")).over(w) - col("b"))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(concat_ws(" ", expr(
        "transform(sort_array(collect_list(struct(pos, word))), s -> s.word)")).as("ctext"))
      .select(col("doc_id"), col("chunk"),
        md5(col("ctext").cast("binary")).as("fp"),
        length(col("ctext")).as("n_chars"))
  }

  private def native(df: org.apache.spark.sql.DataFrame, mod: Int) =
    df.select(col("doc_id"),
        explode(CdcChunks.cdc_chunks(col("text"), mod)).as("c"))
      .select(col("doc_id"), col("c.chunk").as("chunk"),
        col("c.fp").as("fp"), col("c.n_chars").as("n_chars"))

  test("matches the staged dd24 derivation on a real corpus slice (mod=8 and mod=3)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (m <- Seq(8, 3)) {
      val a = native(docs, m); val b = staged(docs, m)
      assert(a.count() === b.count(), s"mod=$m row count")
      assert(a.exceptAll(b).count() === 0L, s"mod=$m native-only rows")
      assert(b.exceptAll(a).count() === 0L, s"mod=$m staged-only rows")
    }
  }

  test("edge cases: separator runs, leading/trailing spaces, UTF-8, empty docs") {
    val tricky = Seq(
      (1L, "a b c d e f g h"), (2L, "a  b  c"), (3L, " a b c "),
      (4L, ""), (5L, "one"), (6L, "   "),
      (7L, "ünïcödé tëxt wïth ümläüts ünïcödé tëxt wïth ümläüts"),
      (8L, "x x x x x x x x x x"), (9L, "ab cd ab cd ab cd")).toDF("doc_id", "text")
    for (m <- Seq(1, 2, 8)) { // mod=1: every word is a boundary (1-word chunks)
      val a = native(tricky, m); val b = staged(tricky, m)
      assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L,
        s"mod=$m mismatch")
      assert(a.count() === b.count())
    }
    // no non-empty words → empty ledger (explode drops the row)
    assert(native(Seq((1L, "  ")).toDF("doc_id", "text"), 8).count() === 0L)
    // chunk ids are consecutive 0..C-1 in document order
    val ids = native(Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text"), 2)
      .orderBy("chunk").select("chunk").as[Long].collect()
    assert(ids === ids.indices.map(_.toLong).toArray)
  }

  test("SQL registration: cdc_chunks callable from pure SQL, literal-mod enforced") {
    Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
      .createOrReplaceTempView("cdc_probe")
    val viaSql = spark.sql(
      "SELECT inline(cdc_chunks(text, 2)) FROM cdc_probe")
    val viaDsl = native(
      Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"), 2)
      .select("chunk", "fp", "n_chars")
    assert(viaSql.collect().toSeq === viaDsl.collect().toSeq)
    val err = intercept[Exception] {
      spark.sql("SELECT cdc_chunks(text, doc_id) FROM cdc_probe").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
