package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale guards on the dedup operators (VERDICT r1 items 2/3/5): the
  * hot-shingle cap bounds dd02's join fan-out, and dd05's LSH candidate
  * generation finds every exact duplicate while never materializing n².
  */
class DedupScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dd02 cap: degenerate repeated-phrase corpus no longer fans out quadratically") {
    import spark.implicits._
    // 60 docs, all the SAME phrase: every shingle has doc-frequency 60.
    // Uncapped, the shingle self-join fans out 60*59/2 pairs per shingle;
    // with the cap (df <= 20) every shingle is dropped -> zero join rows.
    val phrase = (1 to 10).map(i => s"w$i").mkString(" ")
    val degenerate = (0L until 60L).map(i => (i, phrase)).toDF("doc_id", "text")
    val sh = TextDedup.shinglesOf(degenerate)
    val capped = TextDedup.jaccardPairs(sh, minJacX1e4 = 100,
      maxDf = TextDedup.maxShingleDocFreq)
    assert(capped.count() == 0)
    // sanity: without the cap the same corpus produces the full n² pair set
    val uncapped = TextDedup.jaccardPairs(sh, minJacX1e4 = 100, maxDf = Int.MaxValue)
    assert(uncapped.count() == 60L * 59 / 2)
  }

  test("dd02 cap does not change results on a benign corpus") {
    import spark.implicits._
    // docs share at most 2-doc shingles -> cap never bites
    val docs = Seq(
      (0L, "a b c d e f g"), (1L, "a b c d x y z"),
      (2L, "p q r s t u v"), (3L, "p q r s m n o")).toDF("doc_id", "text")
    val sh = TextDedup.shinglesOf(docs)
    val capped = TextDedup.jaccardPairs(sh, 100, TextDedup.maxShingleDocFreq)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val uncapped = TextDedup.jaccardPairs(sh, 100, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq == uncapped.toSeq && capped.nonEmpty)
  }

  test("dd05 LSH candidates: exact duplicates are always candidates; no n² pair set") {
    import spark.implicits._
    // 12 well-separated random-ish vectors, each duplicated at id+100:
    // identical vectors agree on all 4 band keys, so every (i, i+100)
    // pair MUST appear among candidates (recall 1.0 on exact dups).
    val rnd = new scala.util.Random(7)
    val base = (0 until 12).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((i.toLong, v), (i.toLong + 100, v)) }
    val e = rows.toDF("vec_id", "embedding")
    val cands = Similarity.lshCandidatePairs(spark, e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 12).foreach { i =>
      assert(cands.contains((i.toLong, i.toLong + 100)), s"missing dup pair $i")
    }
    // and the candidate set is far smaller than all 24*23/2 pairs —
    // unrelated gaussian vectors rarely share a 4-plane band key
    assert(cands.size < 24 * 23 / 2)
  }

  test("dd05 ⊆ dd06: LSH near-dups are a subset of the exact baseline") {
    val d = "/root/testdata/sf0.01"
    val qs = graft.SparkEntry.queries
    val lsh = qs("dd05_embed_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = qs("dd06_neardup_exact200")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("tx14 chunk spans tile every document exactly (no gaps, no overlap, budget bound)") {
    val d = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("tx14_chunk_spans")(spark, d)
      .select("doc_id", "chunk_idx", "tok_start", "tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    val docTokens = graft.queries.Tables.load(spark, d, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet == docTokens.keySet, "every doc must produce chunks")
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 1L, s"doc $doc: first chunk must start at token 1")
      assert(sorted.last._4 == docTokens(doc), s"doc $doc: last chunk must end at n")
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1), (_, _, s2, _)) =>
          assert(s2 == e1 + 1, s"doc $doc: chunks must tile without gap/overlap")
        case _ => ()
      }
      assert(sorted.forall { case (_, _, st, en) => en - st + 1 <= 64 && en >= st },
        s"doc $doc: every chunk within the 64-token budget")
    }
  }

  test("tx15 packing: bins fill to exactly 4096 tokens (offset+carry arithmetic consistent)") {
    val d = "/root/testdata/sf0.01"
    val rows = graft.SparkEntry.queries("tx15_pack_bins")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, ds) =>
      // within a language, each doc starts where the previous ended
      var cum = 0L
      ds.foreach { case (_, n, bin, off) =>
        assert(bin == cum / 4096 && off == cum % 4096,
          s"$lang: doc placement must equal divmod of the running total")
        cum += n
      }
    }
  }

  // dd14's engine-portability claim, proven on actual non-ASCII input
  // (VERDICT r10 item 8; the sf fixtures are ASCII-only, so this pins it):
  // non-ASCII — including İ (whose lowercase is locale-sensitive), ß, the
  // ﬁ ligature, and CJK — is STRIPPED before lower(), so Java and DuckDB's
  // utf8proc can only ever case-fold ASCII A-Z, where they agree
  // bit-for-bit. Expected strings and md5s below are DuckDB 1.x outputs of
  // the identical regexp_replace/lower/trim pipeline (tools session,
  // round 11).
  test("dd14 normalization is engine-portable on non-ASCII input") {
    import spark.implicits._
    val rows = Seq(
      ("Héllo, WÖRLD!", "hllo wrld", "a506a9be3357abc037011a2cade88f7e"),
      ("İstanbul ß STRASSE", "stanbul strasse", "905da1fbd7a33877721f90ba24f42d2a"),
      ("中文 MIXED text 42", "mixed text 42", "90782ad1b33a962b70de1ec5b51a98a1"),
      ("  plain ascii  ", "plain ascii", "751db9ac78866a3e5fb299aba02c9479"),
      ("ﬁligree ǅungle", "ligree ungle", "80f71b9a544f9d6c6ff1df8d15d4fa6b"))
    val norm = trim(regexp_replace(
      lower(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")), " +", " "))
    val got = rows.map(_._1).toDF("text")
      .select(norm.as("norm"), md5(norm.cast("binary")).as("fp"))
      .collect()
    rows.zip(got).foreach { case ((in, expNorm, expFp), r) =>
      assert(r.getString(0) == expNorm, s"norm mismatch for $in")
      assert(r.getString(1) == expFp, s"md5 mismatch for $in")
    }
  }
}
