package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column machinery: media travel as opaque `binary` columns
  * next to typed metadata; decode / feature-extract / resize / frame-sample
  * run as partition-local batch transforms (`mapPartitions` over a typed
  * Dataset — Spark's JVM equivalent of the `mapInPandas` batch-UDF shape:
  * one iterator per partition, no per-row scheduling, no shuffle).
  *
  * The container ships no codec libraries, so the codec boundary is STUBBED
  * (`decodeReal`) behind a deterministic fake (`decodeFake`) with the same
  * signature — the Spark-side schema, batching, and partitioning are real
  * and tested; swapping in a real codec is a one-function change.
  */
object Multimodal {
  /** Typed metadata emitted by decode — the schema is the contract. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      channels: Int, format: String, ok: Boolean)

  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** REAL codec boundary — not implementable in this container (no image /
    * audio libs). Deliberately unimplemented; `decode` routes to the fake. */
  def decodeReal(payload: Array[Byte]): MediaMeta = ???

  /** Deterministic fake decode: header arithmetic over the payload bytes.
    * Mirrors the mm01_decode_meta SQL so fake results stay oracle-checkable. */
  def decodeFake(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(docId, n,
      width = 16 + (n % 64) * 10,
      height = 16 + ((n / 64) % 48) * 10,
      channels = n % 3 + 1,
      format = (n % 3) match { case 0 => "rgb"; case 1 => "gray"; case _ => "rgba" },
      ok = n > 0)
  }

  /** Batch decode over binary payloads: one partition = one batch iterator.
    * At 100 TB this is the right shape — codec init cost amortizes per
    * partition, rows stream through without materializing the partition. */
  def decodeBatch(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // per-partition codec init would go here (stubbed: nothing to init)
      it.map(r => decodeFake(r.doc_id, r.payload))
    }
  }

  /** "Resize": deterministic byte-subsampling stand-in with real batching. */
  def resizeBatch(rows: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions(_.map { r =>
      val out = Array.tabulate[Byte](math.max(1, r.payload.length / factor))(
        i => r.payload(i * factor))
      MediaRow(r.doc_id, out)
    })
  }

  /** Frame sampling: every `step`-th fixed-size frame of the payload. */
  def sampleFrames(rows: Dataset[MediaRow], frameBytes: Int, step: Int): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    rows.flatMap { r =>
      val nFrames = r.payload.length / frameBytes
      (0 until nFrames by step).map { i =>
        (r.doc_id, i, r.payload.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }.toDF("doc_id", "frame_idx", "frame")
  }

  /** documents.text as a fake binary media column. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }
}
