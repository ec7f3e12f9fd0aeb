package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** minhash_sig measurement harness: dd08's whole-corpus signature+pair
  * pipeline, staged (shingle explode → md5 → minhash_agg) vs fused
  * (native one-pass minhash_sig), same session, warmed best-of-3, noop
  * sink — the before/after pair BENCH_SCALING records for the LSH-family
  * rework. Also times the signature stage alone (no band join) to
  * separate the scan-side win from the unchanged pair join. Not part of
  * the driver contract.
  */
object MhTune {
  def main(args: Array[String]): Unit = {
    val only: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet.contains _
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.locality.wait", "0")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_mh_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(name: String)(mk: => DataFrame): Unit = if (only(name)) {
      noop(mk)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); noop(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"q":"$name","best":${ts.min}%.3f,"runs":[${ts.map(t => f"$t%.3f").mkString(",")}]}""")
    }

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // Multi-split corpus evidence: the sf dir ships documents as ONE 37 MB
    // row group (single scan task — a sandbox artifact; at 100 TB a corpus
    // is thousands of splits). sig_split re-measures the fused signature
    // pass over the same rows written as 32 files, which is the shape the
    // scan-side-map claim is actually about.
    lazy val splitDir = {
      val dir = java.nio.file.Files.createTempDirectory("graft_docs_split").toString
      docs.repartition(32).write.mode("overwrite").parquet(dir)
      dir
    }
    def docsSplit = spark.read.parquet(splitDir)
    best3("sig_split_staged") {
      TextDedup.minhashSignaturesStaged(TextDedup.shinglesRawOf(docsSplit))
    }
    best3("sig_split_fused") { TextDedup.minhashSigRaw(docsSplit) }

    // signature stage alone: the scan-side rework in isolation
    best3("sig_staged") {
      TextDedup.minhashSignaturesStaged(TextDedup.shinglesRawOf(docs))
    }
    best3("sig_fused") { TextDedup.minhashSigRaw(docs) }

    // dd08 end-to-end (exact gate body: exact-dedup keep join +
    // signatures + band explode + pair join + histogram)
    def keep = docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    best3("dd08_staged") {
      TextDedup.bandPairsFromSignatures(
        TextDedup.minhashSignaturesStaged(
          TextDedup.shinglesRawOf(docs.join(keep, "doc_id"))))
        .groupBy("shared_bands").agg(count(lit(1)).as("n_pairs"))
        .orderBy("shared_bands")
    }
    best3("dd08_fused") { // the shipped gate body (minhashSigRaw + bandKeysOfSig)
      graft.SparkEntry.queries("dd08_minhash_all")(spark, sfDir)
    }

    spark.stop()
  }
}
