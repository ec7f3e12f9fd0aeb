package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim: known values, float and double arrays, codegen path") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f), 1.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(CosineSim.cosine_sim(col("a"), col("b")).as("c"), col("expected"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // double arrays too
    val d2 = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
      .select(CosineSim.cosine_sim(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(math.abs(d2 - 10.0 / 14.0) < 1e-12)
  }

  test("cosine_sim matches the interpreted fold bit-for-bit on real data") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val fold = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
      val ad = transform(col("a"), x => x.cast("double"))
      val bd = transform(col("b"), x => x.cast("double"))
      dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
    }
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib"))
    val diff = pairs
      .select(CosineSim.cosine_sim(col("a"), col("b")).as("native"), fold.as("folded"))
      .filter(col("native") =!= col("folded"))
      .count()
    assert(diff == 0, "native codegen must be bit-identical to the sequential fold")
  }

  test("cosine_sim: null propagation and mismatched types") {
    val one = Seq((Array(1.0f), Array(1.0f))).toDF("a", "b")
    assert(one.select(CosineSim.cosine_sim(lit(null).cast("array<double>"), col("b")))
      .collect()(0).isNullAt(0))
    val bad = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b")
        .select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("cosine_sim") ||
      bad.getMessage.toLowerCase.contains("type"))
  }

  test("minhash_agg: one-pass signature equals K separate min() aggregates") {
    val df = Seq((1L, 12345L), (1L, 999L), (1L, 777777L), (2L, 42L))
      .toDF("g", "h")
    val viaAgg = df.groupBy("g").agg(MinHashAgg.minhash_agg(col("h")).as("sig"))
      .select(col("g") +: (0 until 8).map(j => element_at(col("sig"), j + 1)): _*)
      .orderBy("g").collect()
    val mins = MinHashAgg.A.zip(MinHashAgg.B).map { case (a, b) =>
      min((col("h") * a + b) % MinHashAgg.P)
    }
    val viaMins = df.groupBy("g").agg(mins.head, mins.tail: _*).orderBy("g").collect()
    viaAgg.zip(viaMins).foreach { case (x, y) =>
      (0 until 9).foreach(i => assert(x.get(i) == y.get(i)))
    }
  }

  test("minhash_agg: merge across partitions is elementwise min") {
    val big = spark.range(0, 10000).select((col("id") % 7).as("g"),
      ((col("id") * 2654435761L) % (1L << 28)).as("h"))
      .repartition(8)
    val sig = big.groupBy("g").agg(MinHashAgg.minhash_agg(col("h")).as("sig"))
    assert(sig.count() == 7)
    // signature values are all < P and >= 0
    val flat = sig.select(explode(col("sig"))).collect().map(_.getLong(0))
    assert(flat.forall(v => v >= 0 && v < MinHashAgg.P))
  }
}
