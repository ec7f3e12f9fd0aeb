package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, TimeUnit}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-8's gate returned empty because the serial dump outran the driver
  * timeout on a throttled instance. This main is now wall-clock-engineered:
  *
  *  - CONCURRENT: 8 worker threads share one SparkContext (FAIR pools), so
  *    total ≈ critical path, not sum. Streaming queries are scheduled
  *    FIRST (longest-processing-time-first): they dominate the tail.
  *  - MOSTLY INTERPRETED: 122 distinct queries generate thousands of
  *    codegen classes whose loading serializes on the ExecutorClassLoader
  *    monitor (measured: executor threads BLOCKED in loadClass, >80% CPU
  *    idle). A/B at sf0.01 showed interpreted mode is faster for ~100 of
  *    122 queries — janino cost dwarfs row-eval cost at this scale.
  *  - SELECTIVE CODEGEN: the measured exceptions (per-row compute-dense:
  *    higher-order lambdas, 64-dim vector math, recursive CTE, pivot/
  *    window families — each 3-20× slower interpreted) run in a sibling
  *    session with codegen restored.
  *  - STREAMING on 2 shuffle partitions: state-store instances per
  *    stateful operator scale with the partition count and their setup
  *    latency is the micro-batch floor; sf0.01 state fits trivially.
  *
  * Bench is untouched: performance claims are measured there, codegen on.
  */
object Verify {
  /** Queries measured ≥~2× faster WITH codegen at sf0.01 (r9 A/B): per-row
    * compute density high enough that interpreted eval beats janino cost. */
  private val hotList = Set(
    "dd04_simhash_hamming", // md5-per-shingle ×64 bit-tests: compute-dense
    "tx27_bpe_encode", // md5-per-char encode fold: dd04's compute-dense class
    "q38_pivot", "q40_lateral_topn", "q42_range_frame", "q43_unpivot",
    "q44_mixed_distinct", "q45_recursive_cte", "q46_distinct_on",
    "q47_list_hof", "sim01_cosine_topk", "sim02_ann_lsh_buckets",
    "sim03_ann_ivf", "sim04_ann_ivf_kmeans", "sim05_quantize_int8",
    "sim06_semantic_dedup", "sim07_topk_operator", "tx03_langid",
    "tx04_fingerprint", "tx06_top_ngrams", "tx07_hash_sample",
    "tx15_pack_bins", "graph03_components",
    // r19: the edge-scale graph rows the sf10 sweep runs — a ~1e9-row
    // join/agg pays minutes for codegen at sf10 vs ~0.1s janino tax at
    // the sf0.01 gate (graph02_cert 1351s / graph08 1855s interpreted)
    "graph02_copurchase_cert", "graph08_neighbor_jaccard",
    "graph13_triangles_df")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_MASTER overrides the single-JVM default so the same dump
    // can run against a real multi-process cluster (spark://...) — the
    // cluster-mode validation lane (CLUSTER.md); driver invocation unchanged
    val base = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", math.min(cpus.toInt, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", // bucketed-table queries (q51)
        graft.queries.TempDirs.create("graft-warehouse"))
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      .getOrCreate()
    base.sparkContext.setLogLevel("WARN")
    val hot = base.newSession()
    hot.conf.set("spark.sql.codegen.wholeStage", "true")
    hot.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    val streaming = base.newSession()
    streaming.conf.set("spark.sql.shuffle.partitions", "2")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // write the oracle map FIRST: if a throttled instance trips the driver
    // timeout mid-dump, the partial parquet outputs are still comparable
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // longest-first: streaming (the measured tail), then codegen-hot
    // compute, then the cheap bulk — so the critical path starts at t=0
    def costClass(name: String): Int =
      if (name.startsWith("stream")) 0 else if (hotList(name)) 1 else 2
    val todo = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy { case (name, _) => (costClass(name), name) }
    val workers = math.max(1, math.min(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "8").toInt, todo.size))
    val pool = Executors.newFixedThreadPool(workers)
    val t0 = System.nanoTime()
    // A thrown query must be LOUD (ADVICE r10): CORRECTNESS_r10 read as
    // "all green" while 7 queries silently vanished because the catch
    // below only logged to stderr. Now each failure ALSO writes a
    // `<name>._FAILED` marker file next to the (absent) parquet dir and
    // lands in a `verify_errors.json` manifest, so the compare — or any
    // human reading the out dir — sees the failure instead of an omission.
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    todo.foreach { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val sess =
            if (name.startsWith("stream")) streaming
            else if (hotList(name)) hot else base
          sess.sparkContext.setLocalProperty(
            "spark.scheduler.pool", s"w${Thread.currentThread().getId}")
          val tq = System.nanoTime()
          try {
            fn(sess, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            // a marker from a previous run into the same outDir must not
            // shadow this success
            Files.deleteIfExists(Paths.get(s"$outDir/$name._FAILED"))
            System.err.println(f"[verify] $name ok ${(System.nanoTime()-tq)/1e9}%.1fs")
          } catch { case e: Throwable =>
            val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
            System.err.println(s"[verify] $name FAILED: $msg")
            failures.add((name, msg))
            try Files.writeString(Paths.get(s"$outDir/$name._FAILED"), msg)
            catch { case _: Throwable => () }
          }
        }
      })
    }
    pool.shutdown()
    pool.awaitTermination(4, TimeUnit.HOURS)
    val failed = {
      val it = failures.iterator(); val b = Seq.newBuilder[(String, String)]
      while (it.hasNext) b += it.next(); b.result().sortBy(_._1)
    }
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      failed.map { case (n, m) => s"${q(n)}: ${q(m)}" }.mkString("{", ",", "}"))
    System.err.println(f"[verify] total ${(System.nanoTime()-t0)/1e9}%.1fs for ${todo.size} queries x $workers workers; ${failed.size} FAILED")
    System.err.println(s"[verify] SUMMARY: ${todo.size - failed.size}/${todo.size} dumped ok" +
      (if (failed.isEmpty) "" else s"; FAILED: ${failed.map(_._1).mkString(",")}"))
    base.stop()
    // Default: exit 0 even on failures — the driver must still run the
    // DuckDB compare over the queries that DID dump; the markers + manifest
    // carry the bad news. A caller invoking Verify ALONE (no compare step)
    // sets SPARK_GRAFT_VERIFY_STRICT=1 to get a nonzero exit instead of a
    // silently-green run with thrown queries (ADVICE r11).
    if (failed.nonEmpty && sys.env.get("SPARK_GRAFT_VERIFY_STRICT")
          .exists(v => v == "1" || v.equalsIgnoreCase("true")))
      sys.exit(1)
  }
}
