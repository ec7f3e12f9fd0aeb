package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sim01 shape experiment (round 14): the shipped exact-top-k baseline is a
  * 10-row broadcast NLJ producing 2M (qe, ve) pairs — 1 KB of joined row
  * per pair before the cosine projection drops both vectors. Variant
  * `xjoin` folds the 10 query vectors into ONE array-of-structs row
  * (collect_list), cross-joins that single row (tx12's bounded class) and
  * scores all 10 queries per corpus row inside one projection
  * (`transform`), so the fan-out rows carry 24 bytes (qid, vid, cos)
  * instead of two embeddings. Same result; measured against the shipped
  * shape on the same sf dir.
  */
object Sim01Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // the r13-shipped NLJ shape, inlined (SparkEntry now carries xjoin)
    def shipped: DataFrame = {
      val e = emb
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val v = e.select(col("vec_id").as("vid"), col("embedding").as("ve"))
      val top = q.join(v, col("qid") =!= col("vid"))
        .withColumn("cos", expr("cosine_sim(qe, ve)"))
        .groupBy(col("qid"))
        .agg(graft.functions.TopKAgg.topk_agg(col("cos"), col("vid"), 5).as("top"))
      top.select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("qid"), col("t.id").as("vid"),
          floor(col("t.score") * 10000).cast("long").as("cos_x1e4"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("qid", "rank")
    }

    // the SHIPPED shape, via the registry — so a future sim01 edit is
    // automatically what this A/B measures (only the retired NLJ arm
    // above needs to stay inlined)
    def xjoin: DataFrame = SparkEntry.queries("sim01_cosine_topk")(spark, sfDir)

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best(mk: () => DataFrame): Double = {
      noop(mk())
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk()); (System.nanoTime() - t0) / 1e9
      }.min
    }
    // result equality first — a faster wrong answer is not a variant
    val a = shipped.collect().map(_.toString).sorted
    val b = xjoin.collect().map(_.toString).sorted
    println(s"rows shipped=${a.length} xjoin=${b.length} equal=${a.sameElements(b)}")
    println(f"shipped best ${best(() => shipped)}%.3f s")
    println(f"xjoin   best ${best(() => xjoin)}%.3f s")
    spark.stop()
  }
}
