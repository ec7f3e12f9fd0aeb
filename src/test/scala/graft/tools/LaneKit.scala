package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared fault/spill-lane helpers (FaultLane + StarCcFaultLane): one
  * definition of the byte-identity fingerprint and the kill-target
  * discovery so fixes reach every lane. */
object LaneKit {

  /** Order-insensitive result fingerprint: row count + sum of per-row
    * xxhash64 over every column — any lost, duplicated, or corrupted row
    * flips it. Hashes sum as decimal(38,0): full-range longs overflow a
    * BIGINT sum under ANSI mode. */
  def fingerprint(df: DataFrame): (Long, BigDecimal) = {
    val r = df
      .select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(count(lit(1)), sum(col("h").cast("decimal(38,0)"))).collect()(0)
    (r.getLong(0),
      if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
  }

  /** Live executor-backend JVM pids (empty set when none are up — pgrep
    * exits 1 on no match, which is the meaningful answer both for the
    * pre-spawn window and for a killer thread racing executor churn). */
  def executorPids(): Set[Long] = {
    import scala.sys.process._
    scala.util.Try(Seq("pgrep", "-f", "CoarseGrainedExecutorBackend").!!)
      .map(_.split("\n").filter(_.nonEmpty).map(_.trim.toLong).toSet)
      .getOrElse(Set.empty) - ProcessHandle.current().pid()
  }
}
