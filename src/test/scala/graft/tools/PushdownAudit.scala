package graft.queries
import graft.SparkEntry
/** Inventory-wide plan audit for the minhash_sig double-eval bug class:
  * an expensive expression appearing inside a FileScan's DataFilters
  * means predicate pushdown rewrote a Filter-on-computed-column through
  * its Project — the scan evaluates the expression per row just to test
  * the predicate, and the Project above evaluates it AGAIN. Prints every
  * (query, expensive-fn) pair found in DataFilters. */
object PushdownAudit {
  val expensive = Seq("minhash_sig", "token_stats", "repetition_stats", "substring_run_fps",
    "cdc_chunks", "cosine_sim", "band_keys", "simhash", "cms_agg", "age_encrypt",
    "age_decrypt", "levenshtein", "regexp_replace", "regexp_extract")
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    var hits = 0
    for ((name, mk) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = mk(spark, sf).queryExecution.executedPlan.toString
        for (line <- plan.split("\n"); if line.contains("DataFilters: [")) {
          val df = line.substring(line.indexOf("DataFilters: ["))
            .takeWhile(_ != ']')
          for (fn <- expensive; if df.contains(fn)) {
            println(s"HIT $name: $fn in $df"); hits += 1
          }
        }
      } catch { case e: Throwable => println(s"SKIP $name: ${e.getMessage.take(80)}") }
    }
    println(s"audit done, $hits hits")
  }
}
