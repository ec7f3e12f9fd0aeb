package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature: `minhash_sig(text)` returns the
  * `array<bigint>` K=8 signature of a document's 3-word shingle set in a
  * single traversal of the document bytes — the scan-side fusion of the
  * whole `shingles → md5 → minhash_agg` pipeline.
  *
  * Semantics are bit-identical to the staged derivation (and its DuckDB
  * oracle): words are `split(text, ' ')` fields (consecutive/leading/
  * trailing separators yield empty words), each consecutive word triple
  * forms the shingle `w[i] || ' ' || w[i+1] || ' ' || w[i+2]`, the
  * shingle hash is its md5 hex prefix as a 28-bit integer
  * (`('0x' || substr(md5(sh),1,7))::BIGINT`), and the signature is the
  * K running minima of `(a_j·h + b_j) mod p` over all shingles
  * (coefficients shared with [[MinHashAgg]] — one source of truth).
  * Because a single space joins the words, every shingle is a contiguous
  * byte slice of the original document, so the md5 updates run directly
  * over slices of one buffer: no shingle strings are ever materialized.
  * Documents with fewer than 3 words have no shingles and return NULL
  * (the staged pipeline drops them at its `size(ws) >= 3` filter).
  *
  * Scale shape: the staged derivation explodes one row per shingle
  * (corpus word count ≈ 100× row blow-up at 100 TB) and funnels them
  * back through a doc-keyed hash aggregate; this expression keeps the
  * whole computation inside WholeStageCodegen on the scan — no Generate,
  * no aggregation hash map, no signature exchange, and it works
  * unchanged on streaming relations (stateless map vs a stateful
  * streaming aggregate). MinHash itself makes the fusion legal:
  * duplicate shingles cannot change a minimum, so the staged pipeline's
  * non-distinct shingle feed and this one-pass fold agree by
  * construction.
  */
case class MinHashSig(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.MinHashSig$$.MODULE$$.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val localMd: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val localOut: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))

  /** One pass over the document bytes; null when the document has fewer
    * than 3 words (no shingles). Called from both interpreted eval and
    * generated code. */
  def compute(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val md = localMd.get()
    val out = localOut.get()
    val K = MinHashAgg.K
    val A = MinHashAgg.A
    val B = MinHashAgg.B
    val P = MinHashAgg.P
    val mins = Array.fill(K)(Long.MaxValue)
    // Word k's start offset ride a 3-slot slide: when word k closes at
    // offset i, the shingle for words (k-2, k-1, k) is bytes
    // [start(k-2), i) — contiguous because the separator IS the
    // shingle's joining space.
    var prev2 = 0; var prev1 = 0; var cur = 0
    var k = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (k >= 2) {
          md.reset()
          md.update(b, prev2, i - prev2)
          md.digest(out, 0, 16)
          val h = ((out(0) & 0xffL) << 20) | ((out(1) & 0xffL) << 12) |
            ((out(2) & 0xffL) << 4) | ((out(3) & 0xffL) >>> 4)
          var j = 0
          while (j < K) {
            val m = (h * A(j) + B(j)) % P
            if (m < mins(j)) mins(j) = m
            j += 1
          }
        }
        prev2 = prev1; prev1 = cur; cur = i + 1; k += 1
      }
      i += 1
    }
    if (k < 3) null else new GenericArrayData(mins)
  }

  /** Column-level entry point: `minhash_sig($"text")` → 8-long signature
    * array (null for documents with fewer than 3 words). */
  def minhash_sig(c: Column): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.columnOf(MinHashSig(GraftShims.expressionOf(c)))
  }
}
