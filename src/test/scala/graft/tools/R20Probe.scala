package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dd03 sf10 re-probe (VERDICT r19 "What's wrong" #3): 0.281 s at sf10m vs
  * 0.654 s at sf10 strained the r18 "dispatch constant" classification.
  * The r19 verdict read the pair as "doubled with a 10× corpus" — but
  * sf10m IS sf10 (same 500k-doc corpus; the m is the multi-file layout
  * twin), so the delta is pure LAYOUT: sf10's documents table is ONE file
  * with ONE 500k-row row group, where `doc_id < 200` can prune nothing
  * (file-level stats cover 0..499999, no page index, a single row group
  * is one Spark task), while sf10m's 32 doc_id-sorted files let footer
  * min/max kill 31 of 32. This ladder separates the terms and proves the
  * predicate IS pushed and DOES prune the moment the writer gives it
  * boundaries — on a /tmp twin of the same single file rewritten with
  * 16 MiB row groups, the slice scan collapses to the sf10m reading.
  *
  * Stages (each: 1 warm + 3 timed noop-sink runs, best-of):
  *   scan_slice   — docs WHERE doc_id<200, count+sum(length(text))
  *   scan_idonly  — same filter, doc_id column only (prunes text decode)
  *   dd03_full    — the inventory query end-to-end
  * run against sf10 (1 file / 1 row group), sf10m (32 sorted files), and
  * the /tmp multi-row-group rewrite of the sf10 single file.
  */
object R20Probe {
  private def best(mk: => DataFrame): Double = {
    mk.write.format("noop").mode("overwrite").save()
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // multi-row-group twin of the sf10 single file: same bytes, same
    // sort order, the ONLY change is row-group boundaries every 16 MiB
    // (parquet.block.size below; ADVICE r20 — doc and code now agree)
    val rgTwin = "/tmp/r20_docs_rg"
    spark.read.parquet("/root/repo/localdata/sf10/documents.parquet")
      .orderBy("doc_id")
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(rgTwin)

    val layouts = Seq(
      "sf10_1file_1rg" -> "/root/repo/localdata/sf10/documents.parquet",
      "sf10m_32files" -> "/root/repo/localdata/sf10m/documents.parquet",
      "rg_twin_1file_multirg" -> rgTwin)

    for ((tag, path) <- layouts) {
      val docs = spark.read.parquet(path)
      val slice = docs.filter(col("doc_id") < 200)
      val tScan = best(slice.agg(count(lit(1)), sum(length(col("text")))))
      val tId = best(slice.select("doc_id").agg(count(lit(1))))
      println(f"""{"probe":"dd03_r20","layout":"$tag","scan_slice":$tScan%.3f,"scan_idonly":$tId%.3f}""")
    }
    // dd03 end-to-end on the two committed layouts
    for ((tag, dir) <- Seq("sf10" -> "/root/repo/localdata/sf10",
      "sf10m" -> "/root/repo/localdata/sf10m")) {
      val t = best(graft.SparkEntry.queries("dd03_minhash_lsh_pairs")(spark, dir))
      println(f"""{"probe":"dd03_r20","layout":"$tag","dd03_full":$t%.3f}""")
    }
    // prove the predicate reaches the scan
    val plan = spark.read.parquet("/root/repo/localdata/sf10/documents.parquet")
      .filter(col("doc_id") < 200).queryExecution.executedPlan.toString
    println("PushedFilters: " + plan.split("\n").filter(_.contains("PushedFilters"))
      .map(_.trim.take(200)).mkString(" | "))
    spark.stop()
  }
}
