package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-stage decomposition of the sf0.1 noop floor for a few headline
  * queries: stage wall vs summed task run time vs scheduler-side costs,
  * under the exact Bench sf0.1 config. Where does 0.2 s go on a 2 MB
  * scan-agg? */
object R16Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targets = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "q01_agg_pricing,dd24_cdc_chunk_dedup,q05_join5_agg,q23_count_distinct").split(",").toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "false"))
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("MAXPB", (8L << 20).toString))
      .config("spark.sql.files.openCostInBytes", sys.env.getOrElse("OPENCOST", (256L << 10).toString))
      .config("spark.sql.files.minPartitionNum", sys.env.getOrElse("MINPN", "4"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, wall: Long, run: Long, deser: Long, gc: Long,
                  sched: Long, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val taskSched = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo
        if (te.taskMetrics != null) {
          val sched = (ti.finishTime - ti.launchTime) - te.taskMetrics.executorRunTime -
            te.taskMetrics.executorDeserializeTime - te.taskMetrics.resultSerializationTime
          taskSched.merge(te.stageId, math.max(0L, sched), (a: Long, b: Long) => a + b)
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.put(si.stageId, St(si.name.take(46), wall,
          si.taskMetrics.executorRunTime, si.taskMetrics.executorDeserializeTime,
          si.taskMetrics.jvmGCTime, taskSched.getOrDefault(si.stageId, 0L), si.numTasks))
      }
    })

    val qs = graft.SparkEntry.queries
    // double warm
    targets.foreach(n => qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save())
    targets.foreach(n => qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save())
    targets.foreach { n =>
      stages.clear(); taskSched.clear()
      val t0 = System.nanoTime()
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val sts = stages.values.toArray.map(_.asInstanceOf[St]).sortBy(-_.wall)
      val stageWallSum = sts.map(_.wall).sum / 1e3
      println(f"== $n wall=$wall%.3f stageWallSum=$stageWallSum%.3f gap=${wall - stageWallSum}%.3f (driver/job-submit)")
      sts.take(6).foreach { s =>
        println(f"   ${s.name}%-46s wall=${s.wall / 1e3}%6.3f run=${s.run / 1e3}%6.3f deser=${s.deser / 1e3}%6.3f gc=${s.gc / 1e3}%6.3f sched=${s.sched / 1e3}%6.3f tasks=${s.tasks}%3d")
      }
    }
    spark.stop()
  }
}
