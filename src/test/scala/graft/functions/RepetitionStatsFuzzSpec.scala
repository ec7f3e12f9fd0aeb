package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the RepetitionStats gram walker (tx28's
  * scan-side kernel): 4000 seeded-random documents with high-repetition
  * alphabets checked against an independent JDK-API reference
  * (`split(" ", -1)` + `sliding` + HashMap counting) — exercises the
  * word-interning, id-pair packing, and boundary arithmetic on inputs
  * designed to collide grams (tiny alphabets → heavy repetition). */
class RepetitionStatsFuzzSpec extends AnyFunSuite {

  private def reference(text: String): Array[Long] = {
    val words = text.split(" ", -1)
    def stats(n: Int): (Long, Long) = {
      if (words.length < n) return (0L, 0L)
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      for (g <- words.sliding(n)) {
        val k = g.mkString(" ")
        counts(k) = counts.getOrElse(k, 0L) + 1L
      }
      (if (counts.isEmpty) 0L else counts.values.max, counts.values.sum)
    }
    val (t2, n2) = stats(2); val (t3, n3) = stats(3)
    Array(t2, n2, t3, n3)
  }

  test("walker matches the JDK-API reference on 4000 random documents") {
    val rnd = new scala.util.Random(20260815L)
    // tiny alphabets + short words → many repeated grams (the regime the
    // top-gram counters exist for); plus unicode and separator runs
    val alphabets = Array("ab", "日本", "x", "a b", "  ")
    for (i <- 1 to 4000) {
      val n = rnd.nextInt(50)
      val sb = new StringBuilder
      for (_ <- 0 until n) {
        val a = alphabets(rnd.nextInt(alphabets.length))
        val wl = rnd.nextInt(4)
        for (_ <- 0 until wl) sb.append(a.charAt(rnd.nextInt(a.length)))
        if (rnd.nextInt(5) > 0) sb.append(' ')
      }
      val text = sb.toString
      val got = RepetitionStats.compute(UTF8String.fromString(text))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray()
      assert(got.toSeq === reference(text).toSeq,
        s"mismatch on '${text.take(80)}' (len ${text.length})")
    }
  }
}
