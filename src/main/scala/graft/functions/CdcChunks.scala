package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking ledger: `cdc_chunks(text, mod)`
  * returns `array<struct<chunk:bigint, fp:string, n_chars:int>>` — one
  * struct per CDC chunk of the document, computed in ONE pass over the
  * row's backing bytes. This is dd24's entire doc-local pipeline
  * (posexplode words → boundary flag → prefix-sum window → per-chunk
  * collect_list/sort/concat → md5) collapsed into a scan expression.
  *
  * Semantics are bit-identical to the staged derivation (and its DuckDB
  * oracle, TextDedup.scala dd24): words are `split(text, ' ')` fields
  * with empties dropped (`length(word) >= 1`); a word is a boundary iff
  * `('0x' || substr(md5(word),1,7))::BIGINT % mod == 0` (the h28 hash);
  * the boundary word ENDS its chunk (`sum(b) over (rows unbounded
  * preceding) - b`), so chunk ids are consecutive 0..C-1 in document
  * order; `fp = md5(concat_ws(' ', words-of-chunk))` over UTF-8 bytes;
  * `n_chars = length(chunk text)` in characters (code points), i.e.
  * sum of word char counts + (words-in-chunk - 1) separators. A document
  * with no non-empty words returns an empty array.
  *
  * Scale shape: the staged form multiplies the corpus into word-level
  * rows (~|tokens| rows per doc), shuffles them into a doc_id window for
  * the prefix sum, and shuffles again for the (doc_id, chunk) groupBy —
  * two corpus-sized exchanges of word rows before the real work starts.
  * This expression emits the finished chunk ledger (a few structs per
  * doc) straight out of the scan, so dd24's ONLY exchange is the fp
  * window — the same single-exchange shape as dd01/dd25. The md5-per-
  * word/per-chunk arithmetic is inherent to the engine-portable
  * fingerprint choice and identical on the oracle side. Because split's
  * separator is the single space concat_ws re-inserts, each chunk's
  * md5 runs over in-place byte spans (word-by-word incremental update);
  * no chunk string is ever materialized.
  */
case class CdcChunks(child: Expression, mod: Int)
    extends UnaryExpression with Serializable {
  require(mod >= 1, "cdc_chunks mod must be >= 1")

  override def dataType: DataType = ArrayType(CdcChunks.entryType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.CdcChunks$$.MODULE$$.compute($a, $mod);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  val entryType: StructType = StructType(Seq(
    StructField("chunk", LongType, nullable = false),
    StructField("fp", StringType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  private val localWordMd: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val localChunkMd: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val localOut: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")
  private val SPACE = Array[Byte](' '.toByte)

  private def hexOf(digest: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var t = 0
    while (t < 16) {
      hex(2 * t) = HEX((digest(t) >> 4) & 0xF)
      hex(2 * t + 1) = HEX(digest(t) & 0xF)
      t += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** One pass over the document bytes; empty array when the document has
    * no non-empty split-on-space words. Called from both interpreted
    * eval and generated code. */
  def compute(s: UTF8String, mod: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val wordMd = localWordMd.get()
    val chunkMd = localChunkMd.get()
    val out = localOut.get()
    var entries = List.empty[GenericInternalRow] // reversed chunk ledger
    var nChunks = 0
    var chunkWords = 0 // words accumulated into chunkMd so far
    var chunkChars = 0 // chars (code points) incl. separators
    var from = 0       // start byte of the current split field
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        if (i > from) { // non-empty word [from, i)
          // h28 boundary test: first 28 bits of md5(word) mod `mod`
          wordMd.reset()
          wordMd.update(b, from, i - from)
          wordMd.digest(out, 0, 16)
          val h28 = ((out(0).toLong & 0xFF) << 20) |
            ((out(1).toLong & 0xFF) << 12) |
            ((out(2).toLong & 0xFF) << 4) |
            ((out(3).toLong & 0xFF) >> 4)
          // fold the word into the running chunk digest (space-joined)
          if (chunkWords > 0) { chunkMd.update(SPACE); chunkChars += 1 }
          chunkMd.update(b, from, i - from)
          var t = from
          while (t < i) { if ((b(t) & 0xC0) != 0x80) chunkChars += 1; t += 1 }
          chunkWords += 1
          if (h28 % mod == 0) { // boundary word ends its chunk
            chunkMd.digest(out, 0, 16)
            entries = new GenericInternalRow(
              Array[Any](nChunks.toLong, hexOf(out), chunkChars)) :: entries
            nChunks += 1; chunkWords = 0; chunkChars = 0
          }
        }
        from = i + 1
      }
      i += 1
    }
    if (chunkWords > 0) { // trailing words after the last boundary
      chunkMd.digest(out, 0, 16)
      entries = new GenericInternalRow(
        Array[Any](nChunks.toLong, hexOf(out), chunkChars)) :: entries
      nChunks += 1
    }
    val arr = new Array[Any](nChunks)
    var k = nChunks - 1
    var rest = entries
    while (k >= 0) { arr(k) = rest.head; rest = rest.tail; k -= 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point: `cdc_chunks($"text", 8)` → CDC chunk
    * ledger structs (chunk id, md5 fp, char count) per document. */
  def cdc_chunks(c: Column, mod: Int): Column = {
    import org.apache.spark.sql.GraftShims
    GraftShims.columnOf(CdcChunks(GraftShims.expressionOf(c), mod))
  }
}
