package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._

/** dd25 stage decomposition at sf10m: scan+fp vs fp-exchange vs islands. */
object Dd25Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId,
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            si.taskMetrics.executorRunTime, si.numTasks,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten))
      }
    })
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def run(name: String)(mk: => DataFrame): Unit = {
      noop(mk); stages.clear()
      val t0 = System.nanoTime(); noop(mk)
      println(f"== $name wall=${(System.nanoTime() - t0) / 1e9}%.3f")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (w, rt, nt, sw)) =>
        println(f"  stage $id%3d wall=${w / 1e3}%.2fs taskSum=${rt / 1e3}%.2fs tasks=$nt%3d shufW=${sw / 1e6}%.1fMB")
      }
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def wins = docs.select(col("doc_id"), col("lang"),
      posexplode(graft.functions.SubstringRunFps.substring_run_fps(col("text"), 50))
        .as(Seq("i", "fp")))
    // A: scan + fp generation only
    run("A_scan_fps") { wins.select(count(lit(1)).as("n")) }
    // B: + the fp groupBy (the corpus-wide exchange)
    run("B_fp_groupby") {
      wins.groupBy("fp").agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") < col("mx")).select(count(lit(1)).as("n"))
    }
    // C: the full gate query
    run("C_full_dd25") {
      graft.SparkEntry.queries("dd25_substring_spans")(spark, sfDir)
    }
    // D: dup-fps via partial-agg groupBy (map-side combine, fp-only
    // cargo) + BROADCAST left-semi probe over the RECOMPUTED scan (the
    // native expression made the rescan ~0.3 s, flipping the r16
    // calculus where the staged rescan cost 1.4 s) — no full-cargo
    // exchange, no fp-partition sort; islands only over the hit sliver
    run("D_bcast_semi") {
      import org.apache.spark.sql.expressions.Window
      val W = 50
      val dup = wins.groupBy("fp")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") < col("mx")).select("fp")
      val hits = wins.join(broadcast(dup), Seq("fp"), "left_semi")
        .select(col("doc_id"), col("lang"), col("i"))
      val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val spans = hits
        .withColumn("ni",
          when(col("i") > coalesce(max(col("i") + W).over(wPrev), lit(-1)),
            1L).otherwise(0L))
        .withColumn("island", sum(col("ni")).over(wRun))
        .groupBy(col("doc_id"), col("lang"), col("island"))
        .agg(min(col("i")).as("s"), (max(col("i")) + W).as("e"))
      spans.groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_spans"),
          sum((col("e") - col("s")).cast("long")).as("reclaimed_tokens"))
        .orderBy("lang")
    }
    // F: the C window shape with BINARY fp cargo — unhex(fp) is a
    // bijection, so partitioning/grouping on the 16-byte binary is
    // semantically identical to the 32-char hex while halving the
    // dominant exchange column and making the sort comparator bytewise
    run("F_binary_fp_window") {
      import org.apache.spark.sql.expressions.Window
      val W = 50
      val wins2 = docs.select(col("doc_id"), col("lang"),
        posexplode(graft.functions.SubstringRunFps.substring_run_fps(col("text"), W))
          .as(Seq("i", "fp")))
        .select(col("doc_id"), col("lang"), col("i"), unhex(col("fp")).as("fpb"))
      val wFp = Window.partitionBy(col("fpb"))
      val hits = wins2
        .withColumn("mn", min(col("doc_id")).over(wFp))
        .withColumn("mx", max(col("doc_id")).over(wFp))
        .filter(col("mn") < col("mx"))
        .select(col("doc_id"), col("lang"), col("i"))
      val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("doc_id")).orderBy(col("i"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val spans = hits
        .withColumn("ni",
          when(col("i") > coalesce(max(col("i") + W).over(wPrev), lit(-1)),
            1L).otherwise(0L))
        .withColumn("island", sum(col("ni")).over(wRun))
        .groupBy(col("doc_id"), col("lang"), col("island"))
        .agg(min(col("i")).as("s"), (max(col("i")) + W).as("e"))
      spans.groupBy("lang")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_spans"),
          sum((col("e") - col("s")).cast("long")).as("reclaimed_tokens"))
        .orderBy("lang")
    }
    spark.stop()
  }
}
