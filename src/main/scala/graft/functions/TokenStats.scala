package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-row token statistics over a
  * space-separated string: returns `array<bigint>` of
  * `[n_tokens, n_subwords]` where tokens are the `split(text, ' ')`
  * fields (consecutive/leading/trailing separators yield empty tokens,
  * exactly like Spark `split` and DuckDB `string_split`) and each token
  * contributes `floor((charlen + 3) / 4)` BPE-ish subwords.
  *
  * This replaces the explode + two-phase hash-aggregate derivation in
  * tx01: one tight byte loop per row inside WholeStageCodegen, no
  * Generate, no exchange — token counting over 100 TB becomes a pure
  * scan-side map. Character length is computed from UTF-8 directly
  * (count non-continuation bytes), so multi-byte text matches
  * `length(token)` semantics without decoding.
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
    val bs = input.asInstanceOf[UTF8String].getBytes
    var ntok = 1L; var nsub = 0L; var len = 0L
    var i = 0
    while (i < bs.length) {
      val c = bs(i)
      if (c == ' ') { ntok += 1; nsub += (len + 3) >> 2; len = 0 }
      else if ((c & 0xC0) != 0x80) len += 1 // count chars, skip continuations
      i += 1
    }
    nsub += (len + 3) >> 2
    new GenericArrayData(Array(ntok, nsub))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bs = ctx.freshName("bs")
      val i = ctx.freshName("i")
      val ntok = ctx.freshName("ntok")
      val nsub = ctx.freshName("nsub")
      val len = ctx.freshName("len")
      s"""
         |byte[] $bs = $a.getBytes();
         |long $ntok = 1L; long $nsub = 0L; long $len = 0L;
         |for (int $i = 0; $i < $bs.length; $i++) {
         |  byte c = $bs[$i];
         |  if (c == (byte) 32) { $ntok++; $nsub += ($len + 3) >> 2; $len = 0; }
         |  else if ((c & 0xC0) != 0x80) { $len++; }
         |}
         |$nsub += ($len + 3) >> 2;
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{$ntok, $nsub});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {
  import org.apache.spark.sql.GraftShims

  /** Column-level entry point: `token_stats($"text")` →
    * `array(n_tokens, n_subwords)`. */
  def token_stats(c: Column): Column =
    GraftShims.columnOf(TokenStats(GraftShims.expressionOf(c)))
}
