package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: does Spark 4.1.2 accept WITH RECURSIVE (UnionLoop)? */
object R8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val out = spark.sql(
        """WITH RECURSIVE s(i) AS (
          |  SELECT 0 UNION ALL SELECT i + 1 FROM s WHERE i < 9
          |) SELECT COUNT(*) AS n, SUM(i) AS tot FROM s""".stripMargin).collect()
      println(s"[probe] recursive CTE OK: ${out.mkString}")
    } catch { case e: Throwable => println(s"[probe] recursive CTE FAILED: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
