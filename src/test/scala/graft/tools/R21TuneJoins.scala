package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B of two r21 join-strategy candidates:
  *  - dd08's band self-join: sort-merge (current) vs shuffled-hash hint
  *  - q03's orders join: broadcast (current, planner-picked at sf<=1) vs
  *    shuffled-hash hint
  * `Test/runMain graft.tools.R21TuneJoins` at SPARK_GRAFT_SF_DIR.
  * Measurement tooling only.
  */
object R21TuneJoins {
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

    def tbl(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    def cents(c: Column) = floor(c * 100).cast("long")

    // --- dd08 band self-join, parameterized by join strategy
    def dd08(shj: Boolean): DataFrame = {
      val doc = tbl("documents")
      val keep = doc
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
        .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val sigs = doc.join(keep, "doc_id").select(col("doc_id"),
        graft.functions.MinHashSig.minhash_sig(col("text")).as("sig"))
      val bands = sigs.select(col("doc_id"),
        explode(when(col("sig").isNotNull, array((0 until 4).map(bi =>
          struct(lit(bi).as("band"),
            concat_ws("_", element_at(col("sig"), 2 * bi + 1),
              element_at(col("sig"), 2 * bi + 2)).as("key"))): _*))).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      val x = bands.as("x")
      val y = if (shj) bands.as("y").hint("shuffle_hash") else bands.as("y")
      x.join(y, col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
        .agg(count(lit(1)).as("shared_bands"))
        .groupBy("shared_bands")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("shared_bands")
    }

    // --- q03, parameterized by orders join strategy
    def q03(shj: Boolean): DataFrame = {
      val c = tbl("customer").filter(col("c_mktsegment") === "BUILDING")
      val o0 = tbl("orders")
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val o = if (shj) o0.hint("shuffle_hash") else o0
      val lrev = tbl("lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
      lrev.join(o, col("l_orderkey") === o0("o_orderkey"))
        .join(broadcast(c), o0("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def ab(name: String, mk: Boolean => DataFrame): Unit = {
      noop(mk(false)); noop(mk(true)); noop(mk(false)); noop(mk(true))
      val ta = scala.collection.mutable.ArrayBuffer[Double]()
      val tb = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 8) {
        var t0 = System.nanoTime(); noop(mk(false)); ta += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); noop(mk(true)); tb += (System.nanoTime() - t0) / 1e9
      }
      def st(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
      println(s"$name A current : ${st(ta.toSeq)} runs=${ta.map(t => f"$t%.3f").mkString(",")}")
      println(s"$name B shj-hint: ${st(tb.toSeq)} runs=${tb.map(t => f"$t%.3f").mkString(",")}")
    }
    ab("dd08", dd08)
    ab("q03 ", q03)
    spark.stop()
  }
}
