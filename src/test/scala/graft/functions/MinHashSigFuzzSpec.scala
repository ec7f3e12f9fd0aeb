package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the MinHashSig byte walker: 4000 seeded-random
  * documents (word runs, separator runs, unicode, degenerate shapes)
  * checked against an INDEPENDENT reference built from the JDK string
  * API (`split(" ", -1)` + `sliding(3)` + MessageDigest) — no shared
  * code with the walker beyond the MinHashAgg coefficients. Guards the
  * slice arithmetic (word-boundary slide, shingle = contiguous byte
  * span) that the fixed-case spec can only spot-check. */
class MinHashSigFuzzSpec extends AnyFunSuite {

  private def referenceSig(text: String): Option[Array[Long]] = {
    val words = text.split(" ", -1)
    if (words.length < 3) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(MinHashAgg.K)(Long.MaxValue)
    for (tri <- words.sliding(3)) {
      val d = md.digest(tri.mkString(" ").getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
      var j = 0
      while (j < MinHashAgg.K) {
        val m = (h * MinHashAgg.A(j) + MinHashAgg.B(j)) % MinHashAgg.P
        if (m < mins(j)) mins(j) = m
        j += 1
      }
    }
    Some(mins)
  }

  test("walker matches the JDK-API reference on 4000 random documents") {
    val rnd = new scala.util.Random(20260814L)
    val alphabets = Array("abc", "xyäö", "日本語テスト", "a b", "  ", "!?.,", "\t\nq")
    var checked = 0
    for (_ <- 1 to 4000) {
      val n = rnd.nextInt(40)
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        val a = alphabets(rnd.nextInt(alphabets.length))
        val wl = rnd.nextInt(6)
        for (_ <- 0 until wl) sb.append(a.charAt(rnd.nextInt(a.length)))
        if (rnd.nextInt(4) > 0) sb.append(' ')
        if (rnd.nextInt(10) == 0) sb.append(' ') // separator runs
      }
      val text = sb.toString
      val got = Option(MinHashSig.compute(UTF8String.fromString(text)))
        .map(_.toLongArray())
      val want = referenceSig(text)
      assert(got.map(_.toSeq) === want.map(_.toSeq),
        s"mismatch on ${text.take(80).replace("\n", "\\n")}…(len ${text.length})")
      checked += 1
    }
    assert(checked === 4000)
  }
}
