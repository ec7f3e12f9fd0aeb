package graft

import org.apache.spark.sql.SparkSession

/** One-off scale probe for the round-11 operators at sf10 (100x the
  * correctness gate): wall-clock per query, confirming none hides a
  * fan-out that only bites beyond toy scale. Not part of the driver
  * contract. */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.warehouse.dir",
        graft.queries.TempDirs.create("graft-warehouse"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("tx17_bpe_merge_pairs", "tx18_gopher_attrition",
      "dd18_cluster_size_histogram", "tx19_jsonl_io", "tx20_dsir_weights",
      "tx21_curriculum_stages", "sim11_matryoshka_recall",
      "sim12_hybrid_search", "mm05_resize_fp", "q51_bucketed_join")
    val qs = SparkEntry.queries
    names.foreach { n => // warm
      try qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$n WARM-FAIL ${e.getMessage}") }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch { case e: Throwable => println(s"$n FAIL ${e.getMessage}") }
    }
    spark.stop()
  }
}
