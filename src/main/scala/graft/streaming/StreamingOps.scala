package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference's scalar functions are
  * stateless, so they lift unchanged into streams (SURVEY.md §2C); the
  * windowed aggregation mirrors the q25_events_hourly batch query, and
  * watermarking bounds state for unbounded 100 TB/day event streams.
  */
object StreamingOps {
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour window aggregation with a 2-hour watermark — the
    * streaming twin of q25_events_hourly. Append-safe: state for a window
    * is dropped once the watermark passes it. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("value_cents"))

  /** Stateless crypto transform on a stream: encrypt the props column per
    * event. Works identically on batch and streaming DataFrames — the
    * registration is session-level, the UDF is a pure row map. */
  def encryptProps(events: DataFrame, recipient: String): DataFrame =
    events.select(col("event_id"), col("ts"), col("event_type"),
      call_udf("age_encrypt", col("props").cast("binary"), lit(recipient)).as("props_enc"))
}
