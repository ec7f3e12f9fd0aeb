package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native audio fingerprint: `audio_fp(pcm, frameSamples, nFrames,
  * threshold)` parses a 16-bit little-endian PCM binary payload and
  * returns the packed-bits LONG fingerprint — bit f set iff frame f's
  * energy (exact integer Σ sample² over `frameSamples` samples) exceeds
  * `threshold` — in ONE pass over the row's bytes. This is mm15's
  * fingerprint stage as a single codegen expression (the 16th
  * SQL-registered native function, the token_stats/minhash_sig/
  * substring_run_fps/cdc_chunks pattern applied to a BINARY payload):
  * media feature extraction stays inside WholeStageCodegen on the scan —
  * no typed Dataset hop, no per-frame row fan-out, no exchange before
  * the per-doc fingerprint exists.
  *
  * Semantics are bit-identical to the staged derivation (ops.Multimodal
  * frameEnergy → threshold → shiftleft sum) and to mm15's DuckDB oracle
  * arithmetic. Payloads with fewer than `frameSamples * nFrames` samples
  * return NULL (the staged pipeline's frame filter would emit fewer
  * bits — conservative, loud at the gate). `nFrames` is capped at 63 so
  * the fp fits a signed long with no sign games.
  */
case class AudioFp(child: Expression, frameSamples: Int, nFrames: Int,
                   threshold: Long)
    extends UnaryExpression with Serializable {
  require(frameSamples >= 1, "audio_fp: frameSamples must be >= 1")
  require(nFrames >= 1 && nFrames <= 63, "audio_fp: nFrames must be in [1, 63]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_fp"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"audio_fp expects a binary input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    AudioFp.compute(input.asInstanceOf[Array[Byte]], frameSamples, nFrames, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |Object r = graft.functions.AudioFp$$.MODULE$$.compute(
         |  $a, $frameSamples, $nFrames, ${threshold}L);
         |${ev.isNull} = (r == null);
         |${ev.value} = ${ev.isNull} ? -1L : ((Long) r).longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioFp =
    copy(child = newChild)
}

object AudioFp {
  /** Shared by interpreted eval and codegen: null for short payloads,
    * else the packed threshold-bit fingerprint. Returns java.lang.Long
    * (boxed) so codegen can branch on null. */
  def compute(b: Array[Byte], frameSamples: Int, nFrames: Int,
              threshold: Long): java.lang.Long = {
    // long math: frameSamples has no upper bound, so an Int product could
    // overflow, skip the short-payload guard, and run the loop off the
    // array (AIOOBE) instead of returning the contract NULL
    val need = frameSamples.toLong * nFrames
    if (b == null || b.length / 2 < need) return null
    var fp = 0L
    var f = 0
    var k = 0
    while (f < nFrames) {
      var e = 0L
      val end = k + frameSamples
      while (k < end) {
        val lo = b(2 * k) & 0xFF
        val hi = b(2 * k + 1).toInt // sign carries from the high byte
        val s = (hi << 8) | lo
        e += s.toLong * s
        k += 1
      }
      if (e > threshold) fp |= 1L << f
      f += 1
    }
    java.lang.Long.valueOf(fp)
  }

  /** Column-level entry point: `audio_fp($"payload", 8, 32, 11200000L)`. */
  def audio_fp(c: Column, frameSamples: Int, nFrames: Int, threshold: Long): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.columnOf(AudioFp(GraftShims.expressionOf(c), frameSamples, nFrames, threshold))
  }
}
