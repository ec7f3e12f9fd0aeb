package graft.sql

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The typed Dataset[T] surface over the same data, and the injected SQL
  * entry points for the native expressions — a library consumer can stay
  * entirely in case classes + spark.sql if they prefer. */
object TypedApiSpec {
  case class Doc(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)
  case class LangStat(lang: String, nDocs: Long, totalChars: Long)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Region(r_regionkey: Int, r_name: String)
}

class TypedApiSpec extends AnyFunSuite {
  import TypedApiSpec._
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("Dataset[T]: case-class encoder roundtrip + typed groupByKey/mapGroups") {
    import spark.implicits._
    val ds = spark.read.parquet(s"$sf/documents.parquet").as[Doc]
    // typed filter/map run on the case class, not Row
    val stats = ds.filter(_.n_chars > 0)
      .groupByKey(_.lang)
      .mapGroups { (lang, docs) =>
        var n = 0L; var chars = 0L
        docs.foreach { d => n += 1; chars += d.n_chars }
        LangStat(lang, n, chars)
      }
      .collect().sortBy(_.lang)
    // equals the untyped derivation
    val untyped = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("n_chars") > 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      .collect().map(r => LangStat(r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.lang)
    assert(stats.toSeq == untyped.toSeq)
  }

  test("typed Dataset joins: joinWith yields pairs of case classes") {
    import spark.implicits._
    val n = spark.read.parquet(s"$sf/nation.parquet").as[Nation]
    val r = spark.read.parquet(s"$sf/region.parquet").as[Region]
    val pairs = n.joinWith(r, n("n_regionkey") === r("r_regionkey"))
      .map { case (nat, reg) => (nat.n_name, reg.r_name) }
      .collect().toMap
    assert(pairs.size == 25 && pairs.values.toSet.size == 5)
  }

  test("injected SQL functions: cosine_sim and token_stats from pure SQL") {
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0)
    assert(math.abs(c.getDouble(0) - 1.0) < 1e-12)
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_ts")
    val viaSql = spark.sql(
      "SELECT doc_id, token_stats(text)[0] AS ntok FROM docs_ts ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaDsl = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSql.toSeq == viaDsl.toSeq)
    // arity errors carry the library's message
    val e = intercept[Exception] { spark.sql("SELECT cosine_sim(array(1.0D))") }
    assert(e.getMessage.contains("exactly 2 arguments") ||
      e.getCause != null && e.getCause.getMessage.contains("exactly 2 arguments"))
  }

  test("injected SQL function: cosine_sim_pair from pure SQL, literal-checked") {
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb_csp")
    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim_pair(a.embedding, b.embedding, 16) AS cs
         FROM emb_csp a JOIN emb_csp b ON b.vec_id = a.vec_id + 1
         WHERE a.vec_id < 20 ORDER BY a.vec_id""")
      .selectExpr("vec_id", "cs.full AS f", "cs.prefix AS p")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val viaDsl = {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val a = e.select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id").filter(col("vec_id") < 20)
        .select(col("vec_id"),
          graft.functions.CosineSim.cosine_sim(col("ea"), col("eb")).as("f"),
          graft.functions.CosineSim.cosine_sim(
            slice(col("ea"), 1, 16), slice(col("eb"), 1, 16)).as("p"))
        .orderBy("vec_id")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    }
    assert(viaSql.toSeq == viaDsl.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim_pair(array(1.0D), array(1.0D), 1 + 1)")
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("injected SQL function: band_keys matches the Scala DSL and rejects non-literals") {
    spark.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb_bk")
    val viaSql = spark.sql(
      "SELECT vec_id, band_keys(embedding, 16, 4) AS keys FROM emb_bk ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val viaDsl = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.BandKeys.band_keys(col("embedding"), 16, 4).as("keys"))
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(viaSql.toSeq == viaDsl.toSeq && viaSql.nonEmpty)
    val e = intercept[Exception] {
      spark.sql("SELECT band_keys(embedding, vec_id + 1, 4) FROM emb_bk")
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }

  test("injected SQL aggregates: bitmap_distinct, topk_agg, minhash_agg from pure SQL") {
    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("li_agg")
    val bd = spark.sql(
      "SELECT bitmap_distinct(l_orderkey) AS n FROM li_agg").collect()(0).getLong(0)
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    assert(bd == exact && bd > 0)
    val tk = spark.sql("""
      SELECT topk_agg(CAST(l_quantity AS DOUBLE), l_orderkey, 3) AS top
      FROM li_agg""").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(tk.size == 3 && tk.head.getDouble(1) >= tk.last.getDouble(1))
    // minhash signature of a tiny fixed hash set: deterministic, 64 longs
    val mh = spark.sql("""
      SELECT minhash_agg(h) AS sig
      FROM VALUES (1L), (2L), (3L) AS t(h)""").collect()(0).getSeq[Long](0)
    assert(mh.length == graft.functions.MinHashAgg.K && mh.forall(_ != Long.MaxValue))
    // k must be a literal (it sizes the bounded heap at plan time)
    val e = intercept[Exception] {
      spark.sql("SELECT topk_agg(CAST(x AS DOUBLE), x, CAST(x AS INT)) FROM VALUES (1L) t(x)")
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
