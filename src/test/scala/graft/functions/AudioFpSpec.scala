package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** audio_fp's contract is BIT-EQUALITY with the staged derivation mm15
  * originally shipped (ops.Multimodal.frameEnergy row fan-out → threshold
  * → shiftleft sum), which is word-for-word the DuckDB oracle arithmetic:
  * the single-pass byte walker must parse the same 16-bit LE samples,
  * accumulate the same exact integer energies, and pack the same bits.
  * Pinned on the synthetic track fixtures (shared signals + loudness
  * offsets + doc tails) plus the short-payload and frame-boundary edges.
  */
class AudioFpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixtureRows(ids: Seq[Long]) =
    ids.map(id => graft.ops.Multimodal.MediaRow(id, graft.ops.Multimodal.syntheticTrackPcm(id)))

  test("matches the staged frameEnergy derivation on the track fixtures") {
    val ids = (0L until 300L).filter(_ % 10 == 5)
    val rows = spark.createDataset(fixtureRows(ids))
    val staged = graft.ops.Multimodal.frameEnergy(rows, 8).toDF()
      .filter(col("frame_idx") < 32)
      .groupBy("doc_id")
      .agg(sum(when(col("energy") > 11200000L,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(frame_idx AS INT))"))
        .otherwise(0L)).as("fp"))
      .as[(Long, Long)].collect().toMap
    val native = rows.toDF("doc_id", "payload")
      .select(col("doc_id"),
        AudioFp.audio_fp(col("payload"), 8, 32, 11200000L).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(native.nonEmpty && native == staged,
      s"native fp diverges from staged (native ${native.size}, staged ${staged.size})")
  }

  test("short payloads (fewer than frameSamples*nFrames samples) are NULL") {
    // 100 samples < 8*32 = 256 required
    val short = Seq((1L, Array.fill[Byte](200)(3))).toDF("doc_id", "payload")
    val got = short.select(AudioFp.audio_fp(col("payload"), 8, 32, 0L)).collect()(0)
    assert(got.isNullAt(0))
    // exactly at the boundary: 256 samples = 512 bytes is NOT null
    val exact = Seq((1L, new Array[Byte](512))).toDF("doc_id", "payload")
    assert(!exact.select(AudioFp.audio_fp(col("payload"), 8, 32, 0L)).collect()(0).isNullAt(0))
  }

  test("all-silent payload with threshold 0 has no bits; negative samples square positive") {
    // samples all -1 (0xFFFF LE): energy per 8-sample frame = 8 > 0 → all 32 bits
    val neg = Array.fill[Byte](512)(0xFF.toByte)
    val df = Seq((1L, neg)).toDF("doc_id", "payload")
    val fp = df.select(AudioFp.audio_fp(col("payload"), 8, 32, 0L)).as[Long].collect()(0)
    assert(fp == (1L << 32) - 1, s"expected 32 set bits, got $fp")
    val zero = Seq((1L, new Array[Byte](512))).toDF("doc_id", "payload")
    assert(zero.select(AudioFp.audio_fp(col("payload"), 8, 32, 0L)).as[Long].collect()(0) == 0L)
  }

  test("SQL registration: audio_fp callable from pure SQL") {
    val rows = spark.createDataset(fixtureRows(Seq(5L, 15L)))
    rows.toDF("doc_id", "payload").createOrReplaceTempView("audio_fixture")
    val viaSql = spark.sql(
      "SELECT doc_id, audio_fp(payload, 8, 32, 11200000) AS fp FROM audio_fixture")
      .as[(Long, Long)].collect().toMap
    val viaCol = rows.toDF("doc_id", "payload")
      .select(col("doc_id"), AudioFp.audio_fp(col("payload"), 8, 32, 11200000L).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql == viaCol && viaSql.size == 2)
  }
}
