package graft.queries
import org.apache.spark.sql.functions._
object MhPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val variant = args.headOption.getOrElse("fused")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def keep = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val df = variant match {
      case "staged" =>
        TextDedup.bandPairsFromSignatures(
          TextDedup.minhashSignaturesStaged(
            TextDedup.shinglesRawOf(docs.join(keep, "doc_id"))))
          .groupBy("shared_bands").agg(count(lit(1)).as("n_pairs"))
          .orderBy("shared_bands")
      case _ => graft.SparkEntry.queries("dd08_minhash_all")(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    println(s"minhash_sig: ${"minhash_sig".r.findAllIn(plan).size}  minhash_agg: ${"minhash_agg".r.findAllIn(plan).size}  Reused: ${"Reused".r.findAllIn(plan).size}  SMJ: ${"SortMergeJoin".r.findAllIn(plan).size}  BHJ: ${"BroadcastHashJoin".r.findAllIn(plan).size}")
    println(plan.take(14000))
  }
}
