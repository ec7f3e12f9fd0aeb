package graft.queries
// in the queries package (Dd03Probe's convention) for access to the
// private[queries] minhash helpers the dd03 A/B re-composes

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 probes (VERDICT r17 #6/#7).
  *
  * Mode `q67` — pin WHICH floor q67's 12×-at-0.26-s sits on: the map
  * surface runs over `customer` only and emits |segments|×|nations| rows,
  * so at sf10m the suspects are (a) fixed job-dispatch cost, (b) the
  * customer scan, (c) the join+agg collapse, (d) the map-build tail. The
  * ladder times each prefix of the pipeline best-of-5 interleaved in one
  * JVM under Bench's session sizing; if dispatch+scan ≈ full, the row is
  * floor class (q25/q08's category) and BENCH_SCALING documents it.
  *
  * Mode `dd03` — VERDICT r17 #7: dd03 reads 6.8× at sf1 but 2.3× at
  * sf10m — the inverted curve suggests an avoidable small-scale cost.
  * The candidate side is 200 docs × 4 band keys (~800 rows), so the band
  * self-join's shuffle is pure overhead at every scale where the bounded
  * slice applies: A/B the shipped shape against (1) a broadcast-hinted
  * band join and (2) the shipped shape under AQE, interleaved.
  *
  * Env: SPARK_GRAFT_SF_DIR (default localdata/sf1 for dd03, sf10m for
  * q67), arg(0) = mode.
  */
object R18Probe {
  private def session(sfDir: String): SparkSession = {
    // Bench's sizing rule, abbreviated: data-sized shuffle partitions,
    // sort shuffle writer, AQE above 256 MB input
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.toSeq).getOrElse(Seq.empty).map(sizeOf).sum
      else f.length
    val totalBytes = Option(new java.io.File(sfDir).listFiles)
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".parquet")).map(sizeOf).sum
    val sp = math.max(4L, math.min(totalBytes / (8L << 20), 64L))
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", (totalBytes > (256L << 20)).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.files.openCostInBytes", (256L << 10).toString)
      .config("spark.locality.wait", "0")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** best-of-n wall seconds, interleaved caller-side. */
  private def timeOnce(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("q67")
    val defaultDir =
      if (mode == "dd03") "/root/repo/localdata/sf1" else "/root/repo/localdata/sf10m"
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", defaultDir)
    val spark = session(d)
    val qs = graft.SparkEntry.queries

    mode match {
      case "q67" =>
        val cust = Tables.load(spark, d, "customer")
        val nat = Tables.load(spark, d, "nation")
        // ladder prefixes: each is the previous plus one pipeline stage
        val shapes: Seq[(String, () => DataFrame)] = Seq(
          // (a) fixed dispatch: a 1-row job on an already-loaded frame
          "a_dispatch" -> (() => nat.select(count(lit(1)).as("n"))),
          // (b) customer scan only (all three used columns, no join)
          "b_scan" -> (() => cust.select(col("c_mktsegment"), col("c_nationkey"))
            .agg(count(lit(1)).as("n"), countDistinct(col("c_mktsegment")).as("s"))),
          // (c) join + two-level aggregate collapse (the cn stage)
          "c_join_agg" -> (() => cust
            .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
            .groupBy(col("c_mktsegment").as("segment"), col("n_name"))
            .agg(count(lit(1)).as("cnt"))),
          // (d) the full registered q67 (map build + explode tail on top)
          "d_full" -> (() => qs("q67_map_surface")(spark, d)))
        shapes.foreach { case (_, mk) => noop(mk()) } // warm all
        val acc = scala.collection.mutable.Map[String, List[Double]]()
          .withDefaultValue(Nil)
        for (_ <- 1 to 5; (name, mk) <- shapes)
          acc(name) = timeOnce(noop(mk())) :: acc(name)
        acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
          println(f"""{"probe":"q67_floor","shape":"$k","best":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f,"runs":${ts.size}}""")
        }

      case "dd03" =>
        def bands() = TextDedup.bandKeysOfSig(
          TextDedup.minhashSigRaw(TextDedup.docsBounded(spark, d, 200)))
        def pairsShipped() = qs("dd03_minhash_lsh_pairs")(spark, d)
        // broadcast-hinted variant of bandPairsOf: the ~800-row band side
        // rides a broadcast instead of a 2-sided shuffle
        def pairsBroadcast() = {
          val b = bands()
          val x = b.as("x"); val y = broadcast(b.as("y"))
          x.join(y, col("x.band") === col("y.band") &&
              col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
            .groupBy(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"))
            .agg(count(lit(1)).as("shared_bands"))
            .orderBy("ida", "idb")
        }
        val sAqe = spark.newSession()
        sAqe.conf.set("spark.sql.adaptive.enabled", "true")
        def pairsAqe() = qs("dd03_minhash_lsh_pairs")(sAqe, d)
        val shapes: Seq[(String, () => DataFrame)] = Seq(
          "shipped" -> (() => pairsShipped()),
          "broadcast_band" -> (() => pairsBroadcast()),
          "shipped_aqe" -> (() => pairsAqe()))
        shapes.foreach { case (_, mk) => noop(mk()) }
        val acc = scala.collection.mutable.Map[String, List[Double]]()
          .withDefaultValue(Nil)
        for (_ <- 1 to 7; (name, mk) <- shapes)
          acc(name) = timeOnce(noop(mk())) :: acc(name)
        acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
          println(f"""{"probe":"dd03_sf1","shape":"$k","best":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f,"runs":${ts.size}}""")
        }
        // sanity: both variants emit identical pairs
        val a = pairsShipped().collect().map(_.toSeq).toSeq
        val b = pairsBroadcast().collect().map(_.toSeq).toSeq
        println(s"""{"probe":"dd03_sf1","check":"pair_equality","equal":${a == b},"n":${a.size}}""")

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
