package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Spill-correctness lane (100 TB posture): run the heaviest headline
  * queries at sf10m inside a deliberately tight memory envelope
  * (SPARK_DRIVER_MEM, default 8g, spark.memory.fraction=0.25 — an
  * executor-sized heap instead of the 90 GB bench envelope) and report
  * the task-metric spill volumes alongside wall time. The companion
  * correctness check is tools/sweep.py over a graft.Verify dump with the
  * same JVM settings — byte-identical oracle results under pressure are
  * the point; this lane supplies the PROOF THE PRESSURE WAS REAL
  * (memory/disk bytes spilled > 0). Not part of the driver contract.
  */
object SpillLane {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val names = sys.env.getOrElse("SPILL_QUERIES",
      "q23_count_distinct,dd08_minhash_all,dd24_cdc_chunk_dedup,q05_join5_agg")
      .split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.memory.fraction",
        sys.env.getOrElse("SPILL_MEM_FRACTION", "0.25"))
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val memSpilled = new AtomicLong(0L)
    val diskSpilled = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        Option(t.taskMetrics).foreach { m =>
          memSpilled.addAndGet(m.memoryBytesSpilled)
          diskSpilled.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      Thread.sleep(1500) // drain the async listener bus: late TaskEnd
      val (m0, d0) = (memSpilled.get, diskSpilled.get) // events stay with
      val t0 = System.nanoTime() //                       their own query
      qs(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // and the tail of THIS query's events lands too
      println(f"""{"lane":"spill","query":"$n","sec":$sec%.2f,""" +
        f""""mem_spilled_mb":${(memSpilled.get - m0) / 1048576},""" +
        f""""disk_spilled_mb":${(diskSpilled.get - d0) / 1048576},""" +
        s""""heap":"${Runtime.getRuntime.maxMemory() / 1048576}m"}""")
    }
    spark.stop()
  }
}
