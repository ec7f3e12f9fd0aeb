package graft.queries

import graft.graph.GraphOps
import org.apache.spark.sql.functions._

/** GraphX-backed queries with relational oracles: the graph result must
  * agree with the equivalent SQL aggregation, which DuckDB can check. */
object GraphQueries {
  val defs: Seq[QueryDef] = Seq(
    QueryDef("graph01_degree", (s, d) => {
      GraphOps.customerDegrees(s, d)
        .select(col("c_custkey"), col("n_orders").cast("int").as("n_orders"))
        .orderBy("c_custkey")
    }, Some("""
      SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS INTEGER) AS n_orders
      FROM orders GROUP BY 1 ORDER BY c_custkey"""))
  )
}
