package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-row token statistics over a
  * space-separated string: returns `array<bigint>` of
  * `[n_tokens, n_subwords, n_chars]` where tokens are the
  * `split(text, ' ')` fields (consecutive/leading/trailing separators
  * yield empty tokens, exactly like Spark `split` and DuckDB
  * `string_split`), each token contributes `floor((charlen + 3) / 4)`
  * BPE-ish subwords, and `n_chars` is the whole string's character
  * count (== Spark `length(text)`), folded into the same pass so tx01
  * never re-scans the document for it.
  *
  * This replaces the explode + two-phase hash-aggregate derivation in
  * tx01: one tight byte loop per row inside WholeStageCodegen, no
  * Generate, no exchange — token counting over 100 TB becomes a pure
  * scan-side map. Character length is computed from UTF-8 directly
  * (count non-continuation bytes), so multi-byte text matches
  * `length(token)` semantics without decoding; bytes are read through
  * UTF8String's indexed accessor, so the document is never copied out
  * of the scan buffer.
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_stats expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var ntok = 1L; var nsub = 0L; var len = 0L; var nchars = 0L
    var i = 0
    while (i < n) {
      val c = u.getByte(i)
      if ((c & 0xC0) != 0x80) { // non-continuation byte = one character
        nchars += 1
        if (c == ' ') { ntok += 1; nsub += (len + 3) >> 2; len = 0 }
        else len += 1
      }
      i += 1
    }
    nsub += (len + 3) >> 2
    new GenericArrayData(Array(ntok, nsub, nchars))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ntok = ctx.freshName("ntok")
      val nsub = ctx.freshName("nsub")
      val len = ctx.freshName("len")
      val nchars = ctx.freshName("nchars")
      s"""
         |int $n = $a.numBytes();
         |long $ntok = 1L; long $nsub = 0L; long $len = 0L; long $nchars = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte c = $a.getByte($i);
         |  if ((c & 0xC0) != 0x80) {
         |    $nchars++;
         |    if (c == (byte) 32) { $ntok++; $nsub += ($len + 3) >> 2; $len = 0; }
         |    else { $len++; }
         |  }
         |}
         |$nsub += ($len + 3) >> 2;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{$ntok, $nsub, $nchars});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  import org.apache.spark.sql.GraftShims

  /** Column-level entry point: `token_stats($"text")` →
    * `array(n_tokens, n_subwords, n_chars)`. */
  def token_stats(c: Column): Column =
    GraftShims.columnOf(TokenStats(GraftShims.expressionOf(c)))
}
