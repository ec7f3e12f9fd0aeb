package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-gated streaming queries must equal their batch twins exactly
  * (same engine, so this locks the stream/batch equivalence independently
  * of the DuckDB oracle). */
class StreamingQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    StreamingQueries.defs.find(_.name == name).get.run(spark, sf)

  test("stream01 candidate pairs == batch LSH candidate pairs") {
    val stream = run("stream01_lsh_candidates")
    val e = Tables.load(spark, sf, "embeddings").filter(col("vec_id") < 200)
    val batch = Similarity.lshCandidatePairs(spark, e)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  test("stream02 complete-mode rollup == batch q25 aggregation") {
    val stream = run("stream02_hourly_rollup")
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }

  test("stream10 JSONL ingest rollup == batch documents aggregation") {
    val stream = run("stream10_jsonl_ingest")
    val batch = Tables.load(spark, sf, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        min(col("doc_id")).as("first_doc"))
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(stream).count() == 0)
  }
}
