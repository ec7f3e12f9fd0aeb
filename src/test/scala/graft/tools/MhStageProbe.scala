package graft.queries
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable
object MhStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val variant = args.headOption.getOrElse("fused")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ArrayBuffer[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.name.take(60)))
      }
    })
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def keep = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    def mk = variant match {
      case "staged" =>
        TextDedup.bandPairsFromSignatures(
          TextDedup.minhashSignaturesStaged(
            TextDedup.shinglesRawOf(docs.join(keep, "doc_id"))))
          .groupBy("shared_bands").agg(count(lit(1)).as("n_pairs"))
          .orderBy("shared_bands")
      case "sig_staged" =>
        TextDedup.minhashSignaturesStaged(TextDedup.shinglesRawOf(docs))
      case "sig_fused" => TextDedup.minhashSignatures(docs)
      case _ => graft.SparkEntry.queries("dd08_minhash_all")(spark, sfDir)
    }
    mk.write.format("noop").mode("overwrite").save() // warm
    stages.clear()
    val t0 = System.nanoTime()
    mk.write.format("noop").mode("overwrite").save()
    println(f"total ${(System.nanoTime()-t0)/1e9}%.2f s")
    stages.sortBy(-_._3).take(12).foreach { case (id, n, ms, name) =>
      println(f"stage $id%4d tasks=$n%3d ${ms/1000.0}%7.2f s  $name") }
  }
}
