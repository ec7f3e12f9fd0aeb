package graft.queries
// queries package: R18Probe's convention (private[queries] helper access)

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 probes (VERDICT r18 #5/#6).
  *
  * Mode `q01` — q01 entered the weak set at 2.45× sf10m (0.499 vs
  * 0.203 s) with no decomposition. It is pure scan + filter + 6-group
  * aggregate, so the ladder isolates (a) fixed dispatch, (b) the
  * lineitem scan of exactly the 6 used columns, (c) the same scan +
  * filter + count (adds predicate eval + row pruning), (d) the grouped
  * aggregate WITHOUT the cents() expressions (pure sum of raw doubles),
  * (e) the full registered q01 (cents floors + avg + sort). If
  * (b) ≈ (e) the row is scan/decode floor class (q08/q25's category);
  * if (d)→(e) jumps, the cents expression chain is the cost.
  *
  * Mode `mm13` — mm13 has sat at ~2.6× for two rounds undecomposed. Its
  * oracle predicts every field ARITHMETICALLY (never touches bytes), so
  * the comparison is Spark synth+walk vs DuckDB closed-form — the ladder
  * pins where the Spark wall actually goes: (a) dispatch, (b) the
  * filtered doc_id scan, (c) + syntheticMp4 build per row (typed map,
  * encoder round-trip, byte building), (d) + parseMp4Batch walk,
  * (e) the full registered query (adds the orderBy exchange). mm10/12/14
  * share the per-row-walk pattern, so (c)→(d) generalizes to the family.
  *
  * Env: SPARK_GRAFT_SF_DIR (default localdata/sf10m), arg(0) = mode.
  */
object R19Probe {
  private def session(sfDir: String): SparkSession = {
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

  private def timeOnce(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def ladder(probe: String, shapes: Seq[(String, () => DataFrame)],
                     reps: Int = 5): Unit = {
    shapes.foreach { case (_, mk) => noop(mk()) } // warm (JIT + footers)
    shapes.foreach { case (_, mk) => noop(mk()) }
    val acc = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to reps; (name, mk) <- shapes)
      acc(name) = timeOnce(noop(mk())) :: acc(name)
    acc.toSeq.sortBy(_._1).foreach { case (k, ts) =>
      println(f"""{"probe":"$probe","shape":"$k","best":${ts.min}%.3f,"med":${ts.sorted.apply(ts.size / 2)}%.3f,"runs":${ts.size}}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("q01")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10m")
    val spark = session(d)
    import spark.implicits._
    val qs = graft.SparkEntry.queries

    mode match {
      case "q01" =>
        val li = Tables.load(spark, d, "lineitem")
        val used = li.select(col("l_shipdate"), col("l_returnflag"),
          col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"))
        ladder("q01_floor", Seq(
          "a_dispatch" -> (() => Tables.load(spark, d, "nation")
            .select(count(lit(1)).as("n"))),
          "b_scan6col" -> (() => used.agg(count(lit(1)).as("n"),
            sum(col("l_quantity")).as("s"))),
          "c_scan_filter" -> (() => used
            .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
            .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))),
          "d_group_raw" -> (() => used
            .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
            .groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(col("l_quantity")).as("sq"),
              sum(col("l_extendedprice")).as("se"),
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sd"),
              count(lit(1)).as("n"))),
          // string group keys disable Spark's vectorized fast hash map
          // (fixed-width keys only); both columns are single ASCII chars,
          // so group on the codes and reconstruct
          "d2_group_ascii" -> (() => used
            .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
            .groupBy(ascii(col("l_returnflag")).as("rf"),
              ascii(col("l_linestatus")).as("ls"))
            .agg(sum(col("l_quantity")).as("sq"),
              sum(col("l_extendedprice")).as("se"),
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sd"),
              count(lit(1)).as("n"))),
          "e_full" -> (() => qs("q01_agg_pricing")(spark, d)),
          "e2_full_ascii" -> (() => {
            def cents(c: org.apache.spark.sql.Column) =
              floor(c * 100).cast("long")
            used.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
              .groupBy(ascii(col("l_returnflag")).as("rf"),
                ascii(col("l_linestatus")).as("ls"))
              .agg(sum(cents(col("l_quantity"))).as("sum_qty_cents"),
                sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
                sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
                  .as("sum_disc_cents"),
                count(lit(1)).as("count_order"))
              .select(char(col("rf")).as("l_returnflag"),
                char(col("ls")).as("l_linestatus"),
                col("sum_qty_cents"), col("sum_base_cents"),
                col("sum_disc_cents"), col("count_order"))
              .withColumn("avg_qty_cents",
                floor(col("sum_qty_cents").cast("double") / col("count_order")).cast("long"))
              .orderBy("l_returnflag", "l_linestatus")
          })))

      case "mm13" =>
        def ids = Tables.load(spark, d, "documents")
          .filter(col("doc_id") % 17 === 0)
          .select(col("doc_id").cast("long")).as[Long]
        def synth = ids.map { id =>
          val p = graft.ops.Multimodal.syntheticMp4(id)
          if (id % 5 == 0) p(20) = (p(20) | 0x20).toByte
          graft.ops.Multimodal.MediaRow(id, p)
        }
        ladder("mm13_floor", Seq(
          "a_dispatch" -> (() => Tables.load(spark, d, "nation")
            .select(count(lit(1)).as("n"))),
          "b_id_scan" -> (() => ids.toDF()
            .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s"))),
          "c_synth" -> (() => synth.map(r => r.payload.length.toLong).toDF()
            .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))),
          "d_parse" -> (() => graft.ops.Multimodal.parseMp4Batch(synth).toDF()
            .agg(count(lit(1)).as("n"), sum(col("mdat_sum")).as("s"))),
          "e_full" -> (() => qs("mm13_mp4_walk")(spark, d))))

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
