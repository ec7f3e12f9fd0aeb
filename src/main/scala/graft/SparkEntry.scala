package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator inventory (SURVEY.md §2): the
  * reference extension's own surface (age* — §2A), the host-engine
  * relational surface its tests ride on (q-prefixed — §2B), and the
  * training-data-pipeline operators (tx, dd, sim, mm prefixes — north star).
  * Every entry with a DuckDB-expressible deterministic projection also
  * appears in `oracleSql`; the driver hash-compares the two.
  */
object SparkEntry {
  private val all: Seq[QueryDef] =
    Relational.defs ++ CryptoQueries.defs ++ TextDedup.defs ++
      Similarity.defs ++ MultimodalQueries.defs ++ GraphQueries.defs ++
      StreamingQueries.defs

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The age
    * round-trip over real table data — the reference's core semantics
    * (test/sql/age.test:53-57) on the Spark engine. */
  def entry(spark: SparkSession): DataFrame = {
    val byName = all.map(q => q.name -> q).toMap
    byName("age03_roundtrip").run(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
