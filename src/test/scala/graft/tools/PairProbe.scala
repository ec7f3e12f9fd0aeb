package graft

import org.apache.spark.sql.SparkSession

/** Same-sitting pair probe for arbitrary gate queries: times the named
  * queries with the exact Bench convention (two warm passes, best-of-3,
  * noop sink, data-sized shuffle partitions) against
  * SPARK_GRAFT_SF_DIR, printing one JSON line. Used for per-operator
  * sf10m pairs that are not in the fixed 18-query headline (run the
  * DuckDB oracle timing in the same command chain = one sitting).
  *
  *   java -cp test-classes:<jar>:<spark jars> graft.PairProbe dd25_substring_spans dd27_...
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val names = if (args.nonEmpty) args.toSeq else Seq("dd25_substring_spans")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    def exec(n: String): Unit =
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    names.foreach(exec); names.foreach(exec) // two warm passes
    val out = names.map { n =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); exec(n); (System.nanoTime() - t0) / 1e9
      }
      "\"" + n + f"\":${ts.min}%.3f"
    }
    println(out.mkString("{\"metric\":\"pair_probe\",\"queries\":{", ",", s"},\"sf\":\"$sfDir\"}"))
  }
}
