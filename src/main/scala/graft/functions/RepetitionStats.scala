package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-row n-gram repetition statistics —
  * `token_stats`' sibling for the Gopher self-repetition rules (tx28).
  * Returns `array<bigint>` of `[top2, n2, top3, n3]` where `n2`/`n3` are
  * the word 2-/3-gram counts of `split(text, ' ')` (empty fields kept,
  * exactly like Spark `split` and DuckDB `string_split`) and `top2`/`top3`
  * are the occurrence counts of the single most frequent 2-/3-gram.
  *
  * This replaces tx28's two corpus-sized gram explodes + doc-keyed
  * hash-aggregates with one pass per row inside WholeStageCodegen: no
  * Generate, no doc-keyed exchange — the gram stream never leaves the
  * scan task, which at 100 TB is the difference between shuffling the
  * corpus twice (every gram row) and shuffling a few bytes per SOURCE.
  *
  * Exactness: words are interned to dense int ids (byte-equality via
  * UTF8String views — no hash-collision regime), 2-grams are counted
  * under the exact id-pair key packed into one long, and 3-grams under
  * (2-gram id, third-word id) — both components < 2^31, so the packing
  * cannot collide at any document size. Word tuples and the joined
  * `w[i] || ' ' || w[i+1]` gram strings are in bijection (words contain
  * no spaces), so the counts equal the explode-based ones exactly.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])

  // the per-row loop lives in a static method: the generated code stays a
  // single call inside WholeStageCodegen (no CodegenFallback interpreted
  // path), same technique Spark uses for its own non-trivial kernels
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  import org.apache.spark.sql.GraftShims

  /** One-pass exact [top2, n2, top3, n3] over a space-separated row. */
  def compute(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    // split on ' ' bytes (UTF-8 is self-synchronizing: 0x20 never occurs
    // inside a multi-byte sequence), interning each word span to a dense
    // id by exact byte equality
    var nWords = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') nWords += 1; i += 1 }
    val ids = new Array[Int](nWords)
    val wordIds = new java.util.HashMap[UTF8String, Integer](nWords * 2)
    var w = 0; var st = 0; i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val u = UTF8String.fromBytes(b, st, i - st) // view, no copy
        var id = wordIds.get(u)
        if (id == null) { id = Integer.valueOf(wordIds.size()); wordIds.put(u, id) }
        ids(w) = id.intValue(); w += 1; st = i + 1
      }
      i += 1
    }
    val n2 = if (nWords >= 2) nWords - 1 else 0
    val n3 = if (nWords >= 3) nWords - 2 else 0
    var top2 = 0L; var top3 = 0L
    if (n2 > 0) {
      // value = {count, dense pair id}; the pair id keys the 3-gram map
      val pairs = new java.util.HashMap[java.lang.Long, Array[Int]](n2 * 2)
      var k = 0
      while (k < n2) {
        val key = java.lang.Long.valueOf(
          (ids(k).toLong << 32) | (ids(k + 1).toLong & 0xFFFFFFFFL))
        var v = pairs.get(key)
        if (v == null) { v = Array(0, pairs.size()); pairs.put(key, v) }
        v(0) += 1
        if (v(0) > top2) top2 = v(0).toLong
        k += 1
      }
      if (n3 > 0) {
        val tris = new java.util.HashMap[java.lang.Long, Array[Int]](n3 * 2)
        k = 0
        while (k < n3) {
          val pairId = pairs.get(java.lang.Long.valueOf(
            (ids(k).toLong << 32) | (ids(k + 1).toLong & 0xFFFFFFFFL)))(1)
          val tkey = java.lang.Long.valueOf(
            (pairId.toLong << 32) | (ids(k + 2).toLong & 0xFFFFFFFFL))
          var v = tris.get(tkey)
          if (v == null) { v = Array(0); tris.put(tkey, v) }
          v(0) += 1
          if (v(0) > top3) top3 = v(0).toLong
          k += 1
        }
      }
    }
    new GenericArrayData(Array(top2, n2.toLong, top3, n3.toLong))
  }

  /** `repetition_stats($"text")` → `array(top2, n2, top3, n3)`. */
  def repetition_stats(c: Column): Column =
    GraftShims.columnOf(RepetitionStats(GraftShims.expressionOf(c)))
}
