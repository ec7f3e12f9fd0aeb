package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** graph14's ring successor is built with the two-level bucketed rank
  * (r20 — the rewrite that removed the single-partition global window).
  * The gate corpora only exercise it on near-dense customer keys, so this
  * spec drives the PRODUCTION QueryDef over crafted key sets that hit the
  * bucketing's edge cases: keys clustered into one range bucket, keys
  * spread one-per-bucket, giant gaps (seam joins that skip many empty
  * buckets), singleton-bucket seams, and the minimum ring. On ANY key set
  * the ring is 2-regular, so the exact-integer PR certificate must equal
  * the same scalar recurrence graph14's oracle replays — computed
  * independently here — with n_nodes = |keys|. A wrong successor anywhere
  * (dropped seam, duplicated edge, self-loop) breaks 2-regularity and
  * shifts either the rank value or the node count.
  */
class Graph14RingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The oracle's scalar recurrence (queries/GraphQueries.scala graph14):
    * uniform rank is invariant on a 2-regular graph.  */
  private def expectedUniformRank(n: Long): Long = {
    val base = 1000000000000L
    val init = base / n
    val tp = 15L * init / 100L
    var p = init
    for (_ <- 1 to 3) p = tp + (85L * (2L * (p / 2L))) / 100L
    p
  }

  private def runGraph14(keys: Seq[Long]): Seq[(Long, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("g14-ring").toString
    TempDirs.deleteRecursively(java.nio.file.Paths.get(dir)) // fresh
    keys.toDF("c_custkey").write.parquet(s"$dir/customer.parquet")
    val q = GraphQueries.defs.find(_.name == "graph14_pagerank_ring").get
    val out = q.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    TempDirs.deleteRecursively(java.nio.file.Paths.get(dir))
    out
  }

  private def check(label: String, keys: Seq[Long]): Unit = {
    val out = runGraph14(keys)
    assert(out == Seq((expectedUniformRank(keys.size.toLong), keys.size.toLong)),
      s"$label: got $out for n=${keys.size}")
  }

  test("dense block (every key in one range bucket)") {
    check("dense-one-bucket", (100L to 180L))
  }

  test("clustered + far outliers (seam join skips ~250 empty buckets)") {
    check("clustered-outliers",
      Seq(1L, 2L, 3L, 4L, 5L, 1000000000L, 1000000001L, 1000000002L))
  }

  test("one key per bucket (every successor crosses a seam)") {
    // width = (255*1000)/256 + 1 = 997 => each key lands in its own bucket
    check("one-per-bucket", (0L to 255L).map(_ * 1000L))
  }

  test("singleton buckets mixed with runs (lead null inside AND at seams)") {
    check("mixed-singletons",
      Seq(0L, 1L, 2L, 500000L, 900000L, 900001L, 2000000L))
  }

  test("minimum ring (n=3) in one bucket") {
    check("n3", Seq(7L, 11L, 13L))
  }

  test("unsorted, duplicated input keys (distinct + order must both hold)") {
    val keys = Seq(42L, 7L, 999999L, 7L, 500L, 42L, 123456L)
    check("unsorted-dups", keys.distinct)
    // and through the production path with duplicates present:
    val out = runGraph14(keys)
    val n = keys.distinct.size.toLong
    assert(out == Seq((expectedUniformRank(n), n)))
  }
}
