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

  test("band_keys matches the explode/join/aggregate derivation on real data") {
    // The round-2 derivation band_keys replaced (VERDICT r2 #1), rebuilt
    // inline: 64x posexplode, broadcast weight join, per-(vec_id, plane)
    // integer projection, banded bit-pack. The codegen expression must
    // reproduce it exactly for both the 16/4 (dd05) and 8/8 (sim02) shapes.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for ((nPlanes, bandSize) <- Seq((16, 4), (8, 8))) {
      val flat = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim0", "x")))
        .select(col("vec_id"), (col("dim0") + 1).as("dim"),
          floor(col("x").cast("double") * 1000).cast("long").as("xq"))
      val planes = spark.createDataFrame(
        for { p <- 0 until nPlanes; dim <- 1 to 64 }
          yield (p, dim, graft.queries.Similarity.planeWeight(p, dim))
      ).toDF("plane", "dim", "w")
      val legacy = flat.join(broadcast(planes), "dim")
        .groupBy(col("vec_id"), col("plane"))
        .agg(sum(col("xq") * col("w")).as("proj"))
        .groupBy(col("vec_id"), expr(s"CAST(plane div $bandSize AS INT)").as("band"))
        .agg(sum(expr(s"CASE WHEN proj >= 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(plane % $bandSize AS INT)) ELSE CAST(0 AS BIGINT) END")).as("key"))
      val native = e.select(col("vec_id"),
        posexplode(BandKeys.band_keys(col("embedding"), nPlanes, bandSize))
          .as(Seq("band", "key")))
      assert(native.count() == e.count() * (nPlanes / bandSize))
      val diff = native.join(legacy, Seq("vec_id", "band"), "full_outer")
        .filter(native("key").isNull || legacy("key").isNull ||
          native("key") =!= legacy("key"))
        .count()
      assert(diff == 0, s"band_keys($nPlanes, $bandSize) diverged from the legacy derivation")
    }
  }

  test("band_keys: interpreted eval matches codegen and shares the streaming kernel") {
    val vecs = Seq(Array.tabulate(64)(i => (math.sin(i + 1) * 0.7).toFloat),
      Array.fill(64)(0.0f), Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val got = df.select(BandKeys.band_keys(col("v"), 16, 4)).collect()
      .map(_.getSeq[Long](0).toArray)
    vecs.zip(got).foreach { case (v, keys) =>
      val expected = BandKeys.keysFor(v.map(_.toDouble), 16, 4)
      assert(keys.sameElements(expected), "codegen diverged from keysFor")
      // interpreted path (eval) via an expression over a non-codegen route
      val ex = BandKeys(org.apache.spark.sql.catalyst.expressions.Literal
        .create(v, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), 16, 4)
      val interp = ex.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      assert(interp.sameElements(expected), "eval diverged from keysFor")
    }
  }

  test("band_keys: misuse fails fast instead of corrupting keys") {
    // bandSize > 64 would wrap 1L << (p % bandSize)
    assertThrows[IllegalArgumentException] {
      BandKeys.band_keys(col("v"), 128, 128)
    }
    // > MaxDims input dims: silent truncation would drop dims from the keys
    val wide = Seq(Tuple1(Array.fill(65)(1.0f))).toDF("v")
    val e = intercept[Exception] {
      wide.select(BandKeys.band_keys(col("v"), 16, 4)).collect()
    }
    assert(e.getMessage.contains("65") || e.getCause != null &&
      e.getCause.getMessage.contains("65"))
    assertThrows[IllegalArgumentException] {
      BandKeys.keysFor(Array.fill(65)(1.0), 16, 4)
    }
    // exactly MaxDims stays fine
    val ok = Seq(Tuple1(Array.fill(64)(1.0f))).toDF("v")
      .select(BandKeys.band_keys(col("v"), 16, 4)).collect()
    assert(ok.length == 1)
  }

  test("bitmap_distinct equals count(distinct) on real data, all int types, negatives") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = li.groupBy("l_returnflag")
      .agg(BitmapDistinct.bitmap_distinct(col("l_suppkey")).as("ns"),
        BitmapDistinct.bitmap_distinct(col("l_partkey")).as("np"))
      .orderBy("l_returnflag").collect()
    val want = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("ns"), countDistinct(col("l_partkey")).as("np"))
      .orderBy("l_returnflag").collect()
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // negatives, nulls, page boundaries, narrow int types, many partitions
    val tricky = spark.range(0, 100000).repartition(16)
      .select((col("id") % 7777 - 3888).as("v"),
        when(col("id") % 11 === 0, null).otherwise(col("id") % 4096).cast("int").as("w"),
        (col("id") % 100).cast("short").as("s"))
    val r = tricky.agg(
      BitmapDistinct.bitmap_distinct(col("v")).as("nv"),
      BitmapDistinct.bitmap_distinct(col("w")).as("nw"),
      BitmapDistinct.bitmap_distinct(col("s")).as("nsh"),
      countDistinct(col("v")), countDistinct(col("w")), countDistinct(col("s"))).collect()(0)
    assert(r.getLong(0) == r.getLong(3) && r.getLong(1) == r.getLong(4) &&
      r.getLong(2) == r.getLong(5))
    // empty input -> 0, not null
    val empty = spark.range(0).agg(BitmapDistinct.bitmap_distinct(col("id"))).collect()(0)
    assert(!empty.isNullAt(0) && empty.getLong(0) == 0L)
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

  test("token_stats: equals the split-based derivation, incl. edge cases") {
    val cases = Seq("key agg row", "", "a", "a  b", " lead", "trail ",
      "  ", "héllo wörld", "日本 語 テスト", "one")
    val df = cases.toDF("text")
    val got = df.select(col("text"), TokenStats.token_stats(col("text")).as("ts"))
      .select(col("text"), element_at(col("ts"), 1).as("ntok"),
        element_at(col("ts"), 2).as("nsub"),
        element_at(col("ts"), 3).as("nchars")).collect()
    val want = df.select(col("text"),
      size(split(col("text"), " ")).cast("long").as("ntok"),
      expr("aggregate(transform(split(text, ' '), w -> CAST(floor((length(w)+3)/4) AS BIGINT)), 0L, (a, x) -> a + x)")
        .as("nsub"),
      length(col("text")).cast("long").as("nchars")).collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(1) == w.getLong(1), s"ntok for '${g.getString(0)}'")
      assert(g.getLong(2) == w.getLong(2), s"nsub for '${g.getString(0)}'")
      assert(g.getLong(3) == w.getLong(3), s"nchars for '${g.getString(0)}'")
    }
    // null in -> null out
    val n = Seq[Option[String]](None).toDF("text")
      .select(TokenStats.token_stats(col("text"))).collect()(0)
    assert(n.isNullAt(0))
    // real corpus: identical to the old explode+agg derivation on every doc
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = docs.select(col("doc_id"), TokenStats.token_stats(col("text")).as("ts"))
      .select(col("doc_id"), element_at(col("ts"), 1).as("ntok"),
        element_at(col("ts"), 2).as("nsub"))
    val slow = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ntok"),
        sum(floor((length(col("w")) + 3) / 4).cast("long")).as("nsub"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("repetition_stats: equals the explode-based gram derivation, incl. edge cases") {
    // edge cases: empty (1 empty word, no grams), single word, repeated
    // grams, consecutive/leading/trailing spaces (empty-word grams are
    // legal gram members, same as split semantics), multi-byte text
    val cases = Seq("a b a b a b", "", "one", "a a a a", "x  y  x  y",
      " lead lead", "trail trail ", "héllo wörld héllo wörld",
      "日本 語 日本 語 日本", "a b c d e f g")
    val df = cases.toDF("text")
    val got = df.select(col("text"),
        RepetitionStats.repetition_stats(col("text")).as("r"))
      .select(col("text"), col("r")(0).as("top2"), col("r")(1).as("n2"),
        col("r")(2).as("top3"), col("r")(3).as("n3")).collect()
    def brute(text: String): (Long, Long, Long, Long) = {
      val w = text.split(" ", -1)
      def top(n: Int): (Long, Long) = {
        if (w.length < n) (0L, 0L)
        else {
          val grams = (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
          (grams.groupBy(identity).values.map(_.size).max.toLong, grams.size.toLong)
        }
      }
      val (t2, n2) = top(2); val (t3, n3) = top(3)
      (t2, n2, t3, n3)
    }
    got.foreach { g =>
      val (t2, n2, t3, n3) = brute(g.getString(0))
      assert((g.getLong(1), g.getLong(2), g.getLong(3), g.getLong(4)) == ((t2, n2, t3, n3)),
        s"repetition_stats mismatch for '${g.getString(0)}'")
    }
    // null in -> null out; SQL-registered surface reachable
    val n = Seq[Option[String]](None).toDF("text")
      .select(RepetitionStats.repetition_stats(col("text"))).collect()(0)
    assert(n.isNullAt(0))
    val viaSql = spark.sql(
      "SELECT repetition_stats('a b a b a b')").collect()(0).getSeq[Long](0)
    assert(viaSql == Seq(3L, 5L, 2L, 4L))
    // real corpus: identical to the old explode+agg derivation on every doc
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = docs.select(col("doc_id"),
        RepetitionStats.repetition_stats(col("text")).as("r"))
      .select(col("doc_id"), col("r")(0).as("top2"), col("r")(1).as("n2"),
        col("r")(2).as("top3"), col("r")(3).as("n3"))
    val slow = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("nw"))
      .join(slowGram(docs, 2).withColumnRenamed("mx", "top2"), Seq("doc_id"), "left")
      .join(slowGram(docs, 3).withColumnRenamed("mx", "top3"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top2"), lit(0L)).as("top2"),
        greatest(col("nw") - 1, lit(0L)).as("n2"),
        coalesce(col("top3"), lit(0L)).as("top3"),
        greatest(col("nw") - 2, lit(0L)).as("n3"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  private def slowGram(docs: org.apache.spark.sql.DataFrame, n: Int) = {
    val parts = (1 until n).map(k => s", ' ', w[i + $k]").mkString
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, size(w) - $n), i -> concat(w[i]$parts))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("mx"))
  }

  test("topk_agg: equals the window row_number formulation, incl. ties and merges") {
    import org.apache.spark.sql.expressions.Window
    // 10k rows over 7 groups, scores engineered to collide (ties broken by id),
    // spread over 8 partitions so partial-merge paths run
    val df = spark.range(0, 10000).repartition(8)
      .select((col("id") % 7).as("g"), col("id").as("v"),
        ((col("id") * 37) % 101).cast("double").as("s"))
    val viaAgg = df.groupBy("g")
      .agg(TopKAgg.topk_agg(col("s"), col("v"), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("t.id").as("v"), col("t.score").as("s"))
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("v"))
    val viaWin = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("g"), col("rank").cast("long").as("rank"), col("v"), col("s"))
    assert(viaAgg.exceptAll(viaWin).isEmpty && viaWin.exceptAll(viaAgg).isEmpty)
    // groups smaller than k return all rows, still ordered
    val tiny = Seq((1L, 10L, 2.0), (1L, 11L, 3.0)).toDF("g", "v", "s")
      .groupBy("g").agg(TopKAgg.topk_agg(col("s"), col("v"), 5).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.id")).collect().map(_.getLong(0))
    assert(tiny.toSeq == Seq(11L, 10L))
  }

  test("cosine_sim_pair: fused full+prefix is bit-identical to the two-pass form") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib"))
    val diff = pairs
      .select(CosineSimPair.cosine_sim_pair(col("a"), col("b"), 16).as("cs"),
        CosineSim.cosine_sim(col("a"), col("b")).as("full2"),
        CosineSim.cosine_sim(slice(col("a"), 1, 16), slice(col("b"), 1, 16)).as("pre2"))
      .filter(col("cs.full") =!= col("full2") || col("cs.prefix") =!= col("pre2"))
      .count()
    assert(diff == 0, "fused pair must be bit-identical to cosine_sim + sliced cosine_sim")
    // prefix longer than the vectors degenerates to the full cosine
    val short = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f))).toDF("a", "b")
      .select(CosineSimPair.cosine_sim_pair(col("a"), col("b"), 16).as("cs"))
      .select(col("cs.full"), col("cs.prefix")).collect()(0)
    assert(short.getDouble(0) == short.getDouble(1))
    // null propagation
    val n = Seq((Array(1.0f), Array(1.0f))).toDF("a", "b")
      .select(CosineSimPair.cosine_sim_pair(lit(null).cast("array<double>"), col("b"), 4))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("cms_agg: counters equal the per-bucket group counts; estimate >= truth") {
    val df = spark.range(0, 5000)
      .select(((col("id") * 37L) % 300L).as("item"))
      .withColumn("h", ((col("item") * 2654435761L) % (1L << 28)))
    val sk = df.agg(CmsAgg.cms_agg(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(sk.length == CmsAgg.D * CmsAgg.W)
    // total per hash row conserves the input cardinality
    (0 until CmsAgg.D).foreach { j =>
      assert(sk.slice(j * CmsAgg.W, (j + 1) * CmsAgg.W).sum == 5000L)
    }
    // reference grid computed directly from the update formula
    val rows = df.collect().map(_.getLong(1))
    val ref = new Array[Long](CmsAgg.D * CmsAgg.W)
    rows.foreach { h =>
      (0 until CmsAgg.D).foreach { j =>
        val b = (((h * MinHashAgg.A(j) + MinHashAgg.B(j)) % MinHashAgg.P) % CmsAgg.W).toInt
        ref(j * CmsAgg.W + b) += 1L
      }
    }
    assert(sk.toArray.sameElements(ref))
    // point estimates dominate true counts (CMS guarantee)
    val truth = rows.groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    truth.foreach { case (h, n) =>
      val est = (0 until CmsAgg.D).map { j =>
        val b = (((h * MinHashAgg.A(j) + MinHashAgg.B(j)) % MinHashAgg.P) % CmsAgg.W).toInt
        ref(j * CmsAgg.W + b)
      }.min
      assert(est >= n, s"estimate $est < truth $n")
    }
  }

  test("simhash_agg: equals the bit-explode relational derivation") {
    // reference: explode 56 bits, majority per bit, fold to a long
    val df = Seq((1L, 0x0ABCDEFL, 0x7654321L), (1L, 0x1111111L, 0x0F0F0F0L),
      (1L, 0xFEDCBA9L, 0x2222222L), (2L, 0x42L, 0x17L))
      .toDF("g", "h1", "h2")
    val viaAgg = df.groupBy("g")
      .agg(SimHashAgg.simhash_agg(col("h1"), col("h2")).as("sig"))
      .orderBy("g").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bits = df.select(col("g"), col("h1"), col("h2"),
        explode(sequence(lit(0), lit(55))).as("b"))
      .groupBy("g", "b")
      .agg(sum(expr(
        "CASE WHEN (CASE WHEN b < 28 THEN shiftright(h1, b) ELSE shiftright(h2, b - 28) END) & 1 = 1 THEN 1 ELSE -1 END"))
        .as("score"))
    val ref = bits.groupBy("g")
      .agg(sum(expr("CASE WHEN score >= 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END"))
        .as("sig"))
      .orderBy("g").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == ref)
    // merge path: same result across a forced repartition
    val viaAggParts = df.repartition(8).groupBy("g")
      .agg(SimHashAgg.simhash_agg(col("h1"), col("h2")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAggParts == ref)
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
