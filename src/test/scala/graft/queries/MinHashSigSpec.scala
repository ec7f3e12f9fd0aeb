package graft.queries

import graft.TestSpark
import graft.functions.{MinHashAgg, MinHashSig}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** minhash_sig's contract is BIT-EQUALITY with the staged
  * shingle-explode → md5-prefix → minhash_agg derivation (which is also,
  * word for word, the DuckDB oracle pipeline): the fusion is only legal
  * because duplicate shingles cannot change a minimum. This spec pins
  * that equality on a real corpus slice plus the boundary cases the byte
  * walker must get right (empty/short docs, consecutive/leading/trailing
  * separators, multi-byte UTF-8). */
class MinHashSigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stagedSig(docs: org.apache.spark.sql.DataFrame) =
    TextDedup.minhashSignaturesStaged(TextDedup.shinglesRawOf(docs))

  test("matches the staged explode+agg derivation on a real corpus slice") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the wide frame carries <3-word docs as all-null rows (no Filter by
    // design — see minhashSignatures scaladoc); drop them spec-side to
    // compare against the staged pipeline's size(ws)>=3 semantics
    val fused = TextDedup.minhashSignatures(docs).filter(col("m0").isNotNull)
    val staged = stagedSig(docs)
    assert(fused.count() === staged.count())
    assert(fused.exceptAll(staged).count() === 0L)
    assert(staged.exceptAll(fused).count() === 0L)
  }

  test("edge cases: short docs null, separator runs and UTF-8 match staged") {
    // < 3 words (after split-on-space) → null, like the staged size filter
    val nulls = Seq((1L, ""), (2L, "one"), (3L, "two words"),
      (4L, " "), (5L, "  ")) // " " → 2 empty words; "  " → 3 empty words
      .toDF("doc_id", "text")
      .select(col("doc_id"), MinHashSig.minhash_sig(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nulls(1L) && nulls(2L) && nulls(3L) && nulls(4L))
    assert(!nulls(5L)) // three empty words = one shingle "  "
    val tricky = Seq(
      (10L, "a b c"), (11L, "a  b  c"), (12L, " a b c "),
      (13L, "a b c d e f"), (14L, "ünïcödé tëxt wïth ümläüts ünïcödé tëxt wïth"),
      (15L, "x x x x x"), (16L, "tab\tis not a separator here"),
      (17L, "  leading and trailing  ")).toDF("doc_id", "text")
    val fused = TextDedup.minhashSignatures(tricky).filter(col("m0").isNotNull)
    val staged = stagedSig(tricky)
    assert(fused.exceptAll(staged).count() === 0L)
    assert(staged.exceptAll(fused).count() === 0L)
    assert(fused.count() === staged.count())
  }

  test("bandKeysOf guards null signatures: sub-3-word docs never band-collide (ADVICE r14)") {
    // two shingle-less docs carry all-null m0..m7; without the guard,
    // concat_ws maps BOTH to key "" in every band → 4 spurious agree=0
    // candidate pairs the staged oracle (size(ws)>=3 drop) never emits
    val docs = Seq(
      (1L, "one"), (2L, ""),                         // shingle-less pair
      (3L, "alpha beta gamma"), (4L, "alpha beta gamma") // a real dup pair
    ).toDF("doc_id", "text")
    val pairs = TextDedup.bandPairsFromSignatures(TextDedup.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((3L, 4L)),
      s"expected only the real dup pair, got $pairs")
  }

  test("SQL registration: minhash_sig callable from pure SQL") {
    Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
      .createOrReplaceTempView("mh_sql_probe")
    val viaSql = spark.sql(
      "SELECT minhash_sig(text) AS sig FROM mh_sql_probe").collect()(0)
      .getSeq[Long](0)
    val viaDsl = Seq("alpha beta gamma delta").toDF("text")
      .select(MinHashSig.minhash_sig(col("text"))).collect()(0).getSeq[Long](0)
    assert(viaSql === viaDsl)
    assert(viaSql.length === MinHashAgg.K)
  }
}
