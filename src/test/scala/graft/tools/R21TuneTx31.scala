package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Interleaved in-JVM A/B of tx31's per-round driver actions: sequential
  * (r20/r21 production — certificate collect, THEN next-round argmax
  * collect) vs overlapped (guide §2.6 — both collects read the same
  * just-checkpointed vocabulary blocks and share no dependency, so they
  * are submitted concurrently and the scheduler back-fills). Prints both
  * variants' certificate rows — must be identical.
  * `Test/runMain graft.tools.R21TuneTx31` at SPARK_GRAFT_SF_DIR.
  * Measurement tooling only. */
object R21TuneTx31 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty).map(sizeOf).sum
      else f.length
    val totalBytes = {
      val fs = Option(new java.io.File(sfDir).listFiles)
        .map(_.toSeq).getOrElse(Seq.empty)
      fs.filter(_.getName.endsWith(".parquet")).map(sizeOf).sum
    }
    val sp = math.max(4L, math.min(totalBytes / (8L << 20), cpus.toInt * 2L))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", (totalBytes > (256L << 20)).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.maxPartitionBytes",
        math.max(8L << 20, totalBytes / (cpus.toInt * 3L)).toString)
      .config("spark.sql.files.minPartitionNum",
        math.max(1L, math.min(totalBytes / (4L << 20), cpus.toLong)).toString)
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"tune sf=$sfDir sp=$sp bytes=$totalBytes")

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    // daemon threads: a plain fixed pool keeps the JVM alive after main
    // returns (the first run of this harness hung sbt on exactly that)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newFixedThreadPool(2,
        (run: Runnable) => {
          val t = new Thread(run, "tune-ab"); t.setDaemon(true); t
        }))

    val cksumOf =
      "aggregate(seg, CAST(0 AS BIGINT), (acc, x) -> acc + " +
        "CAST(conv(substr(md5(CAST(x AS BINARY)), 1, 7), 16, 10) AS BIGINT))"
    def bestOf(segDf: DataFrame): DataFrame =
      segDf.filter(size(col("seg")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(seg) - 1), i -> " +
            "named_struct('a', element_at(seg, i), 'b', element_at(seg, i + 1)))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("total"))
        .orderBy(col("total").desc, col("a"), col("b")).limit(1)

    def train(nRounds: Int, overlap: Boolean): Seq[(Int, String, Long, Long, Long)] = {
      var seg = tbl("documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy("word").agg(count(lit(1)).as("n"))
        .withColumn("seg",
          expr("transform(sequence(1, char_length(word)), i -> substr(word, i, 1))"))
        .select("word", "n", "seg")
        .localCheckpoint()
      val certs = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long)]()
      var next: Option[(String, String, Long)] = bestOf(seg).collect().headOption
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      for (r <- 1 to nRounds if next.isDefined) {
        val (a, b, total) = next.get
        val prev = seg
        seg = seg
          .withColumn("a", lit(a)).withColumn("b", lit(b))
          .withColumn("seg2", expr(
            """aggregate(
                 sequence(1, size(seg)),
                 named_struct('out', slice(seg, 1, 0), 'pos', 1),
                 (acc, i) -> CASE
                   WHEN i < acc.pos THEN acc
                   WHEN i < size(seg) AND element_at(seg, i) = a
                        AND element_at(seg, i + 1) = b
                     THEN named_struct('out', concat(acc.out, array(concat(a, b))),
                                       'pos', i + 2)
                   ELSE named_struct('out', concat(acc.out, array(element_at(seg, i))),
                                     'pos', i + 1)
                 END).out"""))
          .select(col("word"), col("n"), col("seg2").as("seg"))
          .localCheckpoint()
        prev.unpersist(blocking = false)
        val certDf = seg.agg(
          sum(col("n") * size(col("seg")).cast("long")).as("n_tokens"),
          sum(col("n") * expr(cksumOf)).as("cksum"))
        if (overlap && r < nRounds) {
          val s2 = seg
          val fCert = Future(certDf.collect()(0))
          val fNext = Future(bestOf(s2).collect().headOption
            .map(row => (row.getString(0), row.getString(1), row.getLong(2))))
          val st = Await.result(fCert, 10.minutes)
          certs += ((r, a + b, total, st.getLong(0), st.getLong(1)))
          next = Await.result(fNext, 10.minutes)
        } else {
          val st = certDf.collect()(0)
          certs += ((r, a + b, total, st.getLong(0), st.getLong(1)))
          next = if (r < nRounds)
            bestOf(seg).collect().headOption
              .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
          else None
        }
      }
      seg.unpersist(blocking = false)
      certs.toSeq
    }

    val ca = train(3, overlap = false); val cb = train(3, overlap = true)
    println(s"results equal: ${ca == cb}  (A=$ca)")
    train(3, overlap = false); train(3, overlap = true) // warm
    val ta = scala.collection.mutable.ArrayBuffer[Double]()
    val tb = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 8) {
      var t0 = System.nanoTime(); train(3, overlap = false); ta += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); train(3, overlap = true); tb += (System.nanoTime() - t0) / 1e9
    }
    def st(xs: Seq[Double]) =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"tx31 A sequential: ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}")
    println(s"tx31 B overlapped: ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
