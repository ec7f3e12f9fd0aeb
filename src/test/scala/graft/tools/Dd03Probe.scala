package graft.queries
import org.apache.spark.sql.functions._
object Dd03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mk = graft.SparkEntry.queries("dd03_minhash_lsh_pairs")(spark, sfDir)
    mk.write.format("noop").mode("overwrite").save()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t0)/1e9 }
    println(f"dd03 best ${ts.min}%.3f runs ${ts.map(t=>f"$t%.3f").mkString(",")}")
    val plan = mk.queryExecution.executedPlan.toString
    println("minhash_sig count: " + "minhash_sig".r.findAllIn(plan).size)
    println(plan.split("\n").filter(l => l.contains("FileScan") || l.contains("minhash_sig")).map(_.take(220)).mkString("\n"))
  }
}
