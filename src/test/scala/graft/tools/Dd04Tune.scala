package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown + variant measurement for dd04 (round 12): where do
  * the seconds go after the 56-bit re-banding, and does deriving both
  * 28-bit halves from ONE md5 (hex chars 1-7 and 8-14) beat the two-md5
  * salted form? Not part of the driver contract. */
object Dd04Tune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.sql.GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.locality.wait", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Tables

    def h28of(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 7), 16, 10).cast("long")
    def h28bOf(c: org.apache.spark.sql.Column) = // second 28 bits of the SAME md5
      conv(substring(md5(c.cast("binary")), 8, 7), 16, 10).cast("long")

    val docs = Tables.load(spark, sfDir, "documents")

    def wordsTwoMd5 = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h1", h28of(col("w")))
      .withColumn("h2", h28of(concat(lit("s_"), col("w"))))
    def wordsOneMd5 = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h1", h28of(col("w")))
      .withColumn("h2", h28bOf(col("w")))

    def sig(words: org.apache.spark.sql.DataFrame) = words.groupBy("doc_id")
      .agg(graft.functions.SimHashAgg.simhash_agg(col("h1"), col("h2")).as("simhash"))

    def full(words: org.apache.spark.sql.DataFrame) = {
      val s0 = sig(words)
      val banded = s0.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { bi =>
          struct(lit(bi).as("band"),
            shiftright(col("simhash"), bi * 14).bitwiseAND(lit(16383L)).as("bits"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("simhash"),
          col("bb.band").as("band"), col("bb.bits").as("bits"))
      val x = banded.as("x"); val y = banded.as("y")
      x.join(y, col("x.band") === col("y.band")
          && col("x.bits") === col("y.bits") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("ida"), col("y.doc_id").as("idb"),
          col("x.simhash").as("sa"), col("y.simhash").as("sb"))
        .distinct()
        .select(col("ida"), col("idb"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
        .filter(col("hamming") <= 3)
    }

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s best ${ts.min}%.2fs  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    time("words_only(two-md5)")(wordsTwoMd5)
    time("words_only(one-md5)")(wordsOneMd5)
    time("sig(two-md5)")(sig(wordsTwoMd5))
    time("sig(one-md5)")(sig(wordsOneMd5))
    time("full(two-md5)")(full(wordsTwoMd5))
    time("full(one-md5)")(full(wordsOneMd5))
    spark.stop()
  }
}
