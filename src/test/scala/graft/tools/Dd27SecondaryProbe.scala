package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduce the bench sf1-SECONDARY anomaly on dd27 (r16d: 9.66 s in the
  * secondary pass vs 2.8 s with sf1 as the primary dir, same formulas for
  * every conf). Mimics Bench exactly: build the session with the sf0.1-
  * derived confs (AQE OFF below 256 MB), run dd27 at sf0.1, then flip the
  * four runtime confs the secondary flips and run dd27 at sf1, printing
  * wall + the executed join strategy each time. Not part of the contract.
  */
object Dd27SecondaryProbe {
  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/root/repo/localdata/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false") // sf0.1 build-time value
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.sql.files.minPartitionNum", "4")
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries("dd27_ngram_decontaminate")

    def runOnce(tag: String, dir: String): Unit = {
      val df = q(spark, dir)
      val t0 = System.nanoTime()
      // drive THIS DataFrame's own QueryExecution (collect, not write —
      // write plans a separate QueryExecution, and with AQE on the plan
      // printed below would then be the un-executed initial one, hiding
      // exactly the runtime join flip this probe exists to rule out);
      // dd27's output is the flagged-doc slice, bounded
      val n = df.collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = df.queryExecution.executedPlan.toString // final AQE plan now
      val join = plan.linesIterator.find(l =>
        l.contains("Join") && !l.contains("BroadcastExchange")).getOrElse("?").trim
      println(f"[dd27probe] $tag%-28s $sec%6.2f s rows=$n join=${join.take(90)}")
    }

    runOnce("sf0.1 warm (aqe off)", sf01)
    runOnce("sf0.1 timed", sf01)
    // the secondary flip, verbatim from Bench.scala
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    spark.conf.set("spark.sql.files.minPartitionNum", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    runOnce("sf1 warm (secondary flip)", sf1)
    runOnce("sf1 timed-1", sf1)
    runOnce("sf1 timed-2", sf1)
    spark.stop()
  }
}
