package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-only check: does the PRODUCTION q05 (bloomChildSession path) keep
  * its runtime bloom filter at SPARK_GRAFT_SF_DIR under each maxNumBits
  * cap? Pins the cap on the root session (bloomChildSession honors
  * non-default pins). Measurement tooling only. */
object R22BloomPlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Seq("134217728", "33554432", "16777216").foreach { bits =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .withExtensions(new graft.sql.GraftSparkExtensions)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = graft.SparkEntry.queries("q05_join5_agg")(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      val agg = "bloom_filter_agg\\([^)]*, *-?[0-9]+, *-?[0-9]+".r
        .findFirstIn(p).getOrElse("ABSENT")
      println(s"bits=$bits might_contain=${p.contains("might_contain")} agg=$agg")
      val child = df.sparkSession
      Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "spark.sql.autoBroadcastJoinThreshold")
        .foreach(k => println(s"  child $k = ${child.conf.get(k)}"))
      println(s"  child-is-root=${child eq spark}")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
