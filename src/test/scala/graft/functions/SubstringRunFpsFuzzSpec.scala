package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the SubstringRunFps byte walker: 4000
  * seeded-random documents (word runs, separator runs, unicode,
  * degenerate shapes) × window sizes 1/2/3/7 checked against an
  * INDEPENDENT reference built from the JDK string API
  * (`split(" ", -1)` + `sliding(w)` + MessageDigest over the re-joined
  * window string) — no shared code with the walker. Guards the token
  * start-offset arithmetic (window = contiguous byte span, separator
  * stripping, the nTok sentinel slot) that the fixed-case spec can only
  * spot-check. */
class SubstringRunFpsFuzzSpec extends AnyFunSuite {

  private def referenceFps(text: String, w: Int): Option[Seq[String]] = {
    val words = text.split(" ", -1)
    if (words.length < w) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    Some(words.sliding(w).map { win =>
      md.digest(win.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }.toSeq)
  }

  test("walker matches the JDK-API reference on 4000 random documents × 4 window sizes") {
    val rnd = new scala.util.Random(20260815L)
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
      for (w <- Seq(1, 2, 3, 7)) {
        val got = Option(SubstringRunFps.compute(UTF8String.fromString(text), w))
          .map(_.array.toSeq.map(_.toString))
        val want = referenceFps(text, w)
        assert(got == want, s"w=$w text=${text.take(80).replace(' ', '·')}")
        checked += 1
      }
    }
    assert(checked == 16000)
  }
}
