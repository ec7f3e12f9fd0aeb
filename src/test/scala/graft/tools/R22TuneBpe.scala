package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved in-JVM A/B for VERDICT r21 #5: per BPE training round,
  * A = r21 production (certificate collect + overlapped argmax collect —
  * two jobs reading the checkpointed segmentation) vs B = ONE action: a
  * single pass that explodes each word's adjacent pairs PLUS one marker
  * struct carrying the word's certificate contributions, two-level
  * aggregate (groupBy pair → global min_by argmax + cert sums), 1-row
  * collect. Certificates must be identical. Measurement tooling only:
  * `tools/run_tool.sh graft.tools.R22TuneBpe 80g [rounds]`.
  */
object R22TuneBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRounds = args.headOption.map(_.toInt).getOrElse(3)
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
    println(s"tune-bpe sf=$sfDir sp=$sp rounds=$nRounds")

    val cksumOf =
      "aggregate(seg, CAST(0 AS BIGINT), (acc, x) -> acc + " +
        "CAST(conv(substr(md5(CAST(x AS BINARY)), 1, 7), 16, 10) AS BIGINT))"

    def initSeg(): DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("seg",
        expr("transform(sequence(1, char_length(word)), i -> substr(word, i, 1))"))
      .select("word", "n", "seg")
      .localCheckpoint()

    def mergeOf(segDf: DataFrame, a: String, b: String): DataFrame = segDf
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

    def bestOf(segDf: DataFrame): DataFrame =
      segDf.filter(size(col("seg")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(seg) - 1), i -> " +
            "named_struct('a', element_at(seg, i), 'b', element_at(seg, i + 1)))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("total"))
        .orderBy(col("total").desc, col("a"), col("b")).limit(1)

    // --- A: r21 production loop (cert collect + overlapped argmax)
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor(
      (run: Runnable) => { val t = new Thread(run, "ab-argmax"); t.setDaemon(true); t })
    def trainA(): Seq[(Int, String, Long, Long, Long)] = {
      var seg = initSeg()
      val certs = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long)]()
      var next: Option[(String, String, Long)] = bestOf(seg).collect().headOption
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      for (r <- 1 to nRounds if next.isDefined) {
        val (a, b, total) = next.get
        val prev = seg
        seg = mergeOf(seg, a, b).localCheckpoint()
        prev.unpersist(blocking = false)
        val segNow = seg
        val nextC: java.util.concurrent.Callable[Option[(String, String, Long)]] =
          () => bestOf(segNow).collect().headOption
            .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
        val nextF = if (r < nRounds) Some(pool.submit(nextC)) else None
        val st = seg.agg(
          sum(col("n") * size(col("seg")).cast("long")).as("n_tokens"),
          sum(col("n") * expr(cksumOf)).as("cksum")).collect()(0)
        certs += ((r, a + b, total, st.getLong(0), st.getLong(1)))
        next = nextF.map(_.get()).getOrElse(None)
      }
      seg.unpersist(blocking = false)
      certs.toSeq
    }

    // --- B: fused single action per round — one scan of the checkpointed
    // segmentation emits pair structs + one cert-marker struct per word;
    // groupBy pair (marker rows group under (null,null)), then a global
    // 1-row aggregate: min_by(struct(-total, a, b)) argmax + cert sums.
    def fusedRound(segDf: DataFrame): (Option[(String, String, Long)], Long, Long) = {
      val e = segDf.select(explode(expr(
        // pairs carry (a, b, n, 0, 0); the marker carries (null, null, 0, tok, ck)
        s"""concat(
              CASE WHEN size(seg) >= 2 THEN
                transform(sequence(1, size(seg) - 1), i -> named_struct(
                  'a', element_at(seg, i), 'b', element_at(seg, i + 1),
                  'cnt', n, 'tok', CAST(0 AS BIGINT), 'ck', CAST(0 AS BIGINT)))
              ELSE array() END,
              array(named_struct('a', CAST(NULL AS STRING), 'b', CAST(NULL AS STRING),
                'cnt', CAST(0 AS BIGINT),
                'tok', n * CAST(size(seg) AS BIGINT),
                'ck', n * ($cksumOf))))""")).as("x"))
        .groupBy(col("x.a").as("a"), col("x.b").as("b"))
        .agg(sum(col("x.cnt")).as("total"),
             sum(col("x.tok")).as("tok"), sum(col("x.ck")).as("ck"))
        .agg(
          min_by(struct(col("a"), col("b"), col("total")),
            when(col("a").isNotNull, struct(negate(col("total")), col("a"), col("b"))))
            .as("best"),
          sum(col("tok")).as("n_tokens"), sum(col("ck")).as("cksum"))
      val row = e.collect()(0)
      val best = Option(row.getStruct(0)).filter(s => !s.isNullAt(0))
        .map(s => (s.getString(0), s.getString(1), s.getLong(2)))
      (best, row.getLong(1), row.getLong(2))
    }
    def trainB(): Seq[(Int, String, Long, Long, Long)] = {
      var seg = initSeg()
      val certs = scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long)]()
      var next: Option[(String, String, Long)] = bestOf(seg).collect().headOption
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      for (r <- 1 to nRounds if next.isDefined) {
        val (a, b, total) = next.get
        val prev = seg
        seg = mergeOf(seg, a, b).localCheckpoint()
        prev.unpersist(blocking = false)
        val (bestNext, toks, cks) = fusedRound(seg)
        certs += ((r, a + b, total, toks, cks))
        next = if (r < nRounds) bestNext else None
      }
      seg.unpersist(blocking = false)
      certs.toSeq
    }

    // sanity: identical certificates
    val ca = trainA(); val cb = trainB()
    require(ca == cb, s"certs differ!\nA=$ca\nB=$cb")
    println(s"certs identical over $nRounds rounds: $ca")

    def steal(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
        finally src.close()
      } catch { case _: Exception => -1L }
    trainA(); trainB() // warm
    val pairs = scala.collection.mutable.ArrayBuffer[(Double, Double, Long)]()
    for (_ <- 1 to 10) {
      val s0 = steal()
      var t0 = System.nanoTime(); trainA(); val tA = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime(); trainB(); val tB = (System.nanoTime() - t0) / 1e9
      pairs += ((tA, tB, steal() - s0))
    }
    pairs.foreach { case (a, b, s) => println(f"bpe pair A=$a%.3f B=$b%.3f steal=$s") }
    val quiet = pairs.filter(_._3 <= 100)
    def st(xs: Seq[Double]) =
      if (xs.isEmpty) "n/a"
      else f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"bpe A 2-job-overlap: all ${st(pairs.map(_._1).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._1).toSeq)}")
    println(s"bpe B fused-1-job:   all ${st(pairs.map(_._2).toSeq)} | quiet(${quiet.size}) ${st(quiet.map(_._2).toSeq)}")
    spark.stop()
  }
}
