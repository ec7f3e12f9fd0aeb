package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused full+prefix cosine similarity: one pass over a vector pair
  * computes BOTH the full-dimension cosine and the cosine of the first
  * `prefixLen` dimensions, returned as `struct<full: double,
  * prefix: double>`.
  *
  * This is the Matryoshka-retrieval kernel (sim11): certifying
  * truncated-prefix recall needs the full score and the prefix score for
  * every candidate pair. Composing `cosine_sim(a, b)` with
  * `cosine_sim(slice(a, 1, p), slice(b, 1, p))` materializes two sliced
  * array copies and walks the common prefix twice; here the prefix
  * accumulators are snapshot mid-loop at element `prefixLen`, so the pair
  * costs exactly one traversal and zero allocations. At 100 TB the
  * candidate-pair scan is the dominant cost and this halves its vector
  * math.
  *
  * Accumulation is the same left-to-right double fold as [[CosineSim]],
  * so `full` is bit-identical to `cosine_sim(a, b)` and `prefix` is
  * bit-identical to `cosine_sim` over the sliced prefixes (a prefix
  * snapshot of a sequential fold IS the fold of the prefix).
  */
case class CosineSimPair(left: Expression, right: Expression, prefixLen: Int)
    extends BinaryExpression with Serializable {
  require(prefixLen > 0, s"prefix length must be positive, got $prefixLen")

  override def dataType: DataType = StructType(Seq(
    StructField("full", DoubleType, nullable = false),
    StructField("prefix", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim_pair expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var pdot = 0.0; var pna = 0.0; var pnb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
      if (i == prefixLen) { pdot = dot; pna = na; pnb = nb }
    }
    if (n < prefixLen) { pdot = dot; pna = na; pnb = nb }
    InternalRow(
      dot / (math.sqrt(na) * math.sqrt(nb)),
      pdot / (math.sqrt(pna) * math.sqrt(pnb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val pdot = ctx.freshName("pdot")
      val pna = ctx.freshName("pna")
      val pnb = ctx.freshName("pnb")
      val vals = ctx.freshName("vals")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |double $pdot = 0.0, $pna = 0.0, $pnb = 0.0;
         |for (int $i = 0; $i < $n; ) {
         |  double x = (double) $a.$lGet($i);
         |  double y = (double) $b.$rGet($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |  $i++;
         |  if ($i == $prefixLen) { $pdot = $dot; $pna = $na; $pnb = $nb; }
         |}
         |if ($n < $prefixLen) { $pdot = $dot; $pna = $na; $pnb = $nb; }
         |Object[] $vals = new Object[2];
         |$vals[0] = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |$vals[1] = $pdot / (java.lang.Math.sqrt($pna) * java.lang.Math.sqrt($pnb));
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimPair {
  import org.apache.spark.sql.GraftShims

  /** `cosine_sim_pair($"a", $"b", 16)` → struct<full, prefix>. */
  def cosine_sim_pair(a: Column, b: Column, prefixLen: Int): Column =
    GraftShims.columnOf(CosineSimPair(
      GraftShims.expressionOf(a), GraftShims.expressionOf(b), prefixLen))
}
