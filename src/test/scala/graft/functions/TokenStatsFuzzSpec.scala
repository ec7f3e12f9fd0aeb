package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the TokenStats byte walker (tx01's scan-side
  * kernel), completing the kernel-fuzz trio: 4000 seeded-random
  * documents checked against an independent JDK-API reference
  * (`split(" ", -1)` + `codePointCount`) — guards the UTF-8
  * continuation-byte character counting and the per-token subword
  * arithmetic against multi-byte text and separator runs. */
class TokenStatsFuzzSpec extends AnyFunSuite {

  private def reference(text: String): Array[Long] = {
    val toks = text.split(" ", -1)
    val nsub = toks.map(t => (t.codePointCount(0, t.length) + 3) / 4).map(_.toLong).sum
    // n_chars counts Unicode code points (non-continuation UTF-8 bytes)
    Array(toks.length.toLong, nsub, text.codePointCount(0, text.length).toLong)
  }

  test("walker matches the JDK-API reference on 4000 random documents") {
    val rnd = new scala.util.Random(20260816L)
    val alphabets = Array("abc", "ümläüt", "日本語", "𝄞𝄢", " ", "!?")
    for (_ <- 1 to 4000) {
      val n = rnd.nextInt(60)
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        val a = alphabets(rnd.nextInt(alphabets.length))
        val ci = rnd.nextInt(a.codePointCount(0, a.length))
        sb.appendAll(Character.toChars(a.codePointAt(a.offsetByCodePoints(0, ci))))
        if (rnd.nextInt(6) == 0) sb.append(' ')
      }
      val text = sb.toString
      val got = graft.functions.TokenStats(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray()
      assert(got.toSeq === reference(text).toSeq,
        s"mismatch on '${text.take(80)}' (len ${text.length})")
    }
  }
}
