package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashFunctions, TextFunctions, VectorFunctions}

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash signature is deterministic and length-k") {
    val df = Seq(Seq("a b c", "b c d"), Seq("a b c", "b c d")).toDF("sh")
    val sigs = df.select(HashFunctions.minhashSignature(col("sh"), 32).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 32)
  }

  test("minhash estimates Jaccard within statistical error") {
    // identical sets -> estimate 1; disjoint sets -> estimate ~0
    val a = (1 to 50).map(i => s"tok$i")
    val b = (26 to 75).map(i => s"tok$i") // true jaccard = 25/75 = 1/3
    val df = Seq((a, b)).toDF("a", "b")
      .select(HashFunctions.minhashSignature(col("a"), 256).as("sa"),
        HashFunctions.minhashSignature(col("b"), 256).as("sb"))
    val Array((sa, sb)) = df.as[(Seq[Long], Seq[Long])].collect()
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.length
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est too far from 1/3")
  }

  test("simhash: near-identical token sets are closer than disjoint ones") {
    val base = (1 to 100).map(i => s"w$i")
    val near = base.drop(2) ++ Seq("x1", "x2")
    val far = (1 to 100).map(i => s"z$i")
    val df = Seq((base, near, far)).toDF("a", "b", "c")
      .select(HashFunctions.simhash64(col("a")).as("ha"),
        HashFunctions.simhash64(col("b")).as("hb"),
        HashFunctions.simhash64(col("c")).as("hc"))
    val Array((ha, hb, hc)) = df.as[(Long, Long, Long)].collect()
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(ha, hb) < ham(ha, hc))
  }

  test("cosine expression matches manual computation and handles zero norm") {
    val df = Seq(
      (Array(1.0f, 0.0f, 1.0f), Array(1.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    val out = df.collect().map(r => Option(r.get(0)))
    assert(math.abs(out(0).get.asInstanceOf[Double] - 0.5) < 1e-15)
    assert(out(1).isEmpty)
  }

  test("dot/cosine codegen path agrees with interpreted eval") {
    val vecs = Tables.embeddings(spark, TestSpark.sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val a = vecs.alias("a"); val b = vecs.alias("b")
    val joined = a.join(b, col("a.vec_id") < col("b.vec_id"))
    val viaExpr = joined
      .select(VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      .agg(sum("c")).as[Double].head()
    val rows = vecs.as[(Long, Array[Float])].collect()
    var manual = 0.0
    for {
      (i, va) <- rows; (j, vb) <- rows if i < j
    } {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var k = 0
      while (k < va.length) {
        val x = va(k).toDouble; val y = vb(k).toDouble
        dot += x * y; na += x * x; nb += y * y; k += 1
      }
      manual += dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(math.abs(viaExpr - manual) < 1e-9)
  }

  test("rolling fingerprint: property — equal token lists iff equal fp (on sample)") {
    val gen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta"))
    val samples = (0 until 30).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).map(_.mkString(" ")))
    val df = samples.toDF("t").select(col("t"),
      TextFunctions.rollingFingerprint(TextFunctions.tokens(col("t"))).as("fp"))
    val rows = df.as[(String, Long)].collect()
    for ((a, fa) <- rows; (b, fb) <- rows) {
      if (a == b) assert(fa == fb)
      else assert(fa != fb, s"collision between '$a' and '$b'")
    }
  }

  test("SimHashAggregator: group signature via udaf matches single-doc expression") {
    import graft.functions.SimHashAggregator
    spark.udf.register("group_simhash",
      org.apache.spark.sql.functions.udaf(SimHashAggregator))
    val docs = Tables.documents(spark, TestSpark.sf)
    docs.createOrReplaceTempView("t_docs")
    val grouped = spark.sql(
      """SELECT source, group_simhash(split(text, ' ')) AS sig
        |FROM t_docs GROUP BY source ORDER BY source""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(grouped.nonEmpty && grouped.values.toSet.size > 1)
    // a group of ONE doc must equal the per-row SimHash64 expression
    val one = docs.filter(col("doc_id") === 0)
    val viaAgg = spark.sql(
      """SELECT group_simhash(split(text, ' ')) FROM t_docs WHERE doc_id = 0""")
      .head().getLong(0)
    val viaExpr = one.select(
      HashFunctions.simhash64(split(col("text"), " "))).head().getLong(0)
    assert(viaAgg == viaExpr)
  }

  test("sketch expressions: generated code is bit-identical to interpreted eval") {
    import graft.functions.ShingleFunctions
    def run(): Seq[org.apache.spark.sql.Row] =
      Tables.documents(spark, TestSpark.sf).limit(200)
        .select(col("doc_id"),
          HashFunctions.minhashSignature(
            ShingleFunctions.wordShingleHashes(TextFunctions.tokens(col("text")), 3),
            32).as("mh"),
          HashFunctions.simhash64(TextFunctions.tokens(col("text"))).as("sh"),
          ShingleFunctions.charShingleHashes(col("text"), 8).as("cs"))
        .orderBy("doc_id").collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen.nonEmpty)
  }

  test("ivfRouteCells: equals window top-n over cosine, codegen == interpreted, zero vector routes nowhere") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, TestSpark.sf).limit(200)
    // reference: explicit per-(vector, cell) cosine + row_number window —
    // the formulation the routing expression replaced
    val anchors = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
      .collect().sortBy(_.getLong(0))
    val dim = anchors.head.getSeq[Float](1).length
    val flat = anchors.flatMap(_.getSeq[Float](1).map(_.toDouble))
    def run(): Seq[(Long, Int)] =
      emb.select(col("vec_id"),
          explode(VectorFunctions.ivfRouteCells(col("embedding"), flat, dim, 2))
            .as("cell"))
        .orderBy("vec_id", "cell").as[(Long, Int)].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    val cellsDf = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell"), col("embedding").as("centroid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("cell").asc)
    val ref = emb.crossJoin(broadcast(cellsDf))
      .withColumn("score", VectorFunctions.cosine(col("embedding"), col("centroid")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id", "cell").as[(Long, Int)].collect().toSeq
    assert(gen == ref,
      s"expression routing diverged from the window reference (sample: ${gen.take(4)} vs ${ref.take(4)})")
    // a zero vector has no direction: it must route to NO cell
    val z = Seq((99L, Array.fill(dim)(0.0f))).toDF("vec_id", "embedding")
    assert(z.select(explode(VectorFunctions.ivfRouteCells(col("embedding"),
      flat, dim, 2))).count() == 0)
  }

  test("hyperplane signatures: one-pass expression matches per-plane manual bits, codegen == interpreted") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(dim = 64, numPlanes = 4 * 16, seed = 42L)
    def run(): Seq[(Long, Seq[Long])] =
      Tables.embeddings(spark, TestSpark.sf).limit(100)
        .select(col("vec_id"),
          VectorFunctions.hyperplaneSignatures(col("embedding"), planes, 4).as("sigs"))
        .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen.nonEmpty && gen.forall(_._2.length == 16))
    // manual per-plane sign bits on the driver == the fused expression
    val vecs = Tables.embeddings(spark, TestSpark.sf).limit(100)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    for ((id, sigs) <- gen; (sig, b) <- sigs.zipWithIndex) {
      var expected = 0L
      for (i <- 0 until 4) {
        val p = planes(b * 4 + i)
        var dot = 0.0; var j = 0
        val v = vecs(id)
        while (j < v.length) { dot += v(j).toDouble * p(j); j += 1 }
        if (dot > 0.0) expected |= (1L << i)
      }
      assert(sig == expected, s"vec $id band $b")
    }
    // dimension mismatch -> null, not a prefix signature
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(VectorFunctions.hyperplaneSignatures(col("embedding"), planes, 4).as("sigs"))
    assert(bad.collect().head.isNullAt(0))
  }

  test("hyperplane probes: margin-ranked flip set, codegen == interpreted, naive set at probeBits >= bandBits") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(dim = 64, numPlanes = 6 * 8, seed = 42L)
    def run(probeBits: Int): Seq[(Long, Seq[Seq[Long]])] =
      Tables.embeddings(spark, TestSpark.sf).limit(100)
        .select(col("vec_id"),
          VectorFunctions.hyperplaneProbes(col("embedding"), planes, 6, probeBits)
            .as("ps"))
        .orderBy("vec_id").as[(Long, Seq[Seq[Long]])].collect().toSeq
    val gen = run(3)
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run(3)
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen.nonEmpty && gen.forall(_._2.length == 8) &&
      gen.forall(_._2.forall(_.length == 4))) // base + 3 flips per band
    // slot 0 is the base signature — identical to hyperplaneSignatures
    val sigs = Tables.embeddings(spark, TestSpark.sf).limit(100)
      .select(col("vec_id"),
        VectorFunctions.hyperplaneSignatures(col("embedding"), planes, 6).as("s"))
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toSeq
    assert(gen.map { case (id, ps) => (id, ps.map(_.head)) } == sigs)
    // every probe is a single-bit flip of the base, margins strictly chosen:
    // recompute dots on the driver and check each band's flip set is the
    // probeBits SMALLEST |dot| bits, ties to the lower bit index
    val vecs = Tables.embeddings(spark, TestSpark.sf).limit(100)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    for ((id, ps) <- gen.take(20); (bandSigs, b) <- ps.zipWithIndex) {
      val v = vecs(id)
      val absd = (0 until 6).map { i =>
        val p = planes(b * 6 + i)
        var dot = 0.0; var j = 0
        while (j < v.length) { dot += v(j).toDouble * p(j); j += 1 }
        (math.abs(dot), i)
      }
      val expectBits = absd.sorted.take(3).map(_._2)
      val expected = expectBits.map(i => bandSigs.head ^ (1L << i))
      assert(bandSigs.tail == expected, s"vec $id band $b")
    }
    // probeBits >= bandBits degenerates to the naive all-flips SET — the
    // small-corpus / oracle-replay contract (order may differ)
    val full = run(6)
    for ((id, ps) <- full; (bandSigs, b) <- ps.zipWithIndex) {
      val naive = (0 until 6).map(i => bandSigs.head ^ (1L << i)).toSet
      assert(bandSigs.tail.toSet == naive && bandSigs.length == 7,
        s"vec $id band $b: probeBits=bandBits must cover every single flip")
    }
    // dimension mismatch -> null (same contract as hyperplaneSignatures)
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(VectorFunctions.hyperplaneProbes(col("embedding"), planes, 6, 3).as("ps"))
    assert(bad.collect().head.isNullAt(0))
  }

  test("query-directed probes (maxFlip=2): summed-margin ranking, prefix refinement") {
    import graft.operators.Similarity
    val planes = Similarity.hyperplanes(dim = 64, numPlanes = 6 * 8, seed = 42L)
    def run(t: Int): Seq[(Long, Seq[Seq[Long]])] =
      Tables.embeddings(spark, TestSpark.sf).limit(60)
        .select(col("vec_id"),
          VectorFunctions.hyperplaneProbes(col("embedding"), planes, 6, t,
            maxFlip = 2).as("ps"))
        .orderBy("vec_id").as[(Long, Seq[Seq[Long]])].collect().toSeq
    val got = run(6)
    val vecs = Tables.embeddings(spark, TestSpark.sf).limit(60)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    // driver recomputation of Lv's ranking: candidates = singles + pairs,
    // sums in ascending-bit addition order, (sum ASC, mask ASC)
    for ((id, ps) <- got.take(20); (bandSigs, b) <- ps.zipWithIndex) {
      val v = vecs(id)
      val absd = (0 until 6).map { i =>
        val p = planes(b * 6 + i)
        var dot = 0.0; var j = 0
        while (j < v.length) { dot += v(j).toDouble * p(j); j += 1 }
        math.abs(dot)
      }
      val singles = (0 until 6).map(i => (absd(i), 1L << i))
      val pairs = for (i <- 0 until 6; j <- i + 1 until 6)
        yield (absd(i) + absd(j), (1L << i) | (1L << j))
      val top = (singles ++ pairs).sortBy { case (s, m) => (s, m) }.take(6)
      val expected = top.map { case (_, m) => bandSigs.head ^ m }
      assert(bandSigs.tail == expected, s"vec $id band $b")
      // with 6 probes over 6 singles + 15 pairs, at least one chosen set
      // must genuinely be available as a pair candidate universe — the
      // ranking is over 21 candidates, not the 6 singles
      assert(singles.size + pairs.size == 21)
    }
    // prefix refinement: the T=3 sequence is exactly the first 3 of T=6
    val short = run(3)
    assert(short.map { case (id, ps) => (id, ps.map(_.take(4))) } ==
      got.map { case (id, ps) => (id, ps.map(_.take(4))) },
      "probe sequences must be prefix-stable in T")
    // somewhere in the fixture a PAIR flip out-ranks a single — the whole
    // point of query-directed probing (if this ever fails the fixture
    // margins are degenerate, not the operator)
    val anyPair = got.exists { case (id, ps) =>
      ps.zipWithIndex.exists { case (bandSigs, b) =>
        bandSigs.tail.exists(s =>
          java.lang.Long.bitCount(s ^ bandSigs.head) == 2)
      }
    }
    assert(anyPair, "expected at least one 2-bit probe in the top-6 sets")
  }

  test("hyperplaneProbes: maxFlip=2 past the 24-bit pair bound clamps " +
      "to single-flip instead of throwing") {
    import graft.operators.Similarity
    // lshGeometry widens bandBits with log n, so at a large-enough
    // corpus probeDepth=2 would hit the expression's bandBits<=24 pair
    // bound at PLAN CONSTRUCTION — the Column API degrades to maxFlip=1
    val wide = 26
    val planes = Similarity.hyperplanes(dim = 64, numPlanes = wide * 2,
      seed = 42L)
    def run(flip: Int): Seq[(Long, Seq[Seq[Long]])] =
      Tables.embeddings(spark, TestSpark.sf).limit(30)
        .select(col("vec_id"),
          VectorFunctions.hyperplaneProbes(col("embedding"), planes, wide,
            numProbes = 4, maxFlip = flip).as("ps"))
        .orderBy("vec_id").as[(Long, Seq[Seq[Long]])].collect().toSeq
    val clamped = run(2) // must not throw
    assert(clamped == run(1),
      "clamped maxFlip=2 must produce the single-flip probe sets")
    // under the bound, pair probing still engages (guards the clamp from
    // silently downgrading every call)
    val narrow = Similarity.hyperplanes(dim = 64, numPlanes = 6, seed = 42L)
    val ps = Tables.embeddings(spark, TestSpark.sf).limit(30)
      .select(VectorFunctions.hyperplaneProbes(col("embedding"), narrow, 6,
        numProbes = 6, maxFlip = 2).as("ps"))
      .as[Seq[Seq[Long]]].collect()
    assert(ps.exists(_.exists(b =>
        b.tail.exists(s => java.lang.Long.bitCount(s ^ b.head) == 2))),
      "maxFlip=2 under the bound must still rank pair flips")
  }

  test("native winnow expression equals the SQL-HOF formulation (oracle family)") {
    val ascii = Tables.documents(spark, TestSpark.sf)
      .filter(length(col("text")) >= 11).select("doc_id", "text")
    // non-ASCII coverage: char-aligned grams must match the SQL substring
    // semantics even when multibyte characters sit inside windows
    val multibyte = Seq(
      (100001L, "caférêves über naïve jalapeño coöperate façade émigré"),
      (100002L, "日本語のテキストと English mixed содержание текста"))
      .toDF("doc_id", "text")
    val docs = ascii.unionByName(multibyte)
    val native = docs.select(col("doc_id"),
        graft.functions.WinnowFunctions.winnowedMd5Fingerprints(col("text"), 8, 4).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaSql = docs
      .withColumn("hs", expr(
        "transform(sequence(1, length(text) - 7), " +
          "i -> cast(conv(substring(md5(substring(text, i, 8)), 1, 15), 16, 10) as bigint))"))
      .select(col("doc_id"), expr(
        "array_sort(array_distinct(transform(sequence(1, size(hs) - 3), " +
          "i -> array_min(slice(hs, i, 4)))))").as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == viaSql)
    assert(native.nonEmpty)
  }

  test("approx_count_distinct stays within its error bound vs exact") {
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
    val li = Tables.lineitem(spark, TestSpark.sf)
    val Array((approx, exact)) = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e"))
      .as[(Long, Long)].collect()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"HLL rel err $relErr (approx=$approx exact=$exact)")
  }

  test("hll sketch union: per-day partials merge to the one-pass estimate") {
    import org.apache.spark.sql.functions.{countDistinct, hll_sketch_agg, hll_sketch_estimate, hll_union_agg, to_date}
    val ev = Tables.events(spark, TestSpark.sf)
    val merged = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .head().getLong(0)
    val onePass = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // mergeability: unioning per-partition sketches loses (almost) nothing
    // vs sketching the whole stream once
    assert(math.abs(merged - onePass).toDouble / exact < 0.01,
      s"merged=$merged onePass=$onePass")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("pq encode expression: codegen == interpreted, argmin cell, tie to lowest") {
    import graft.functions.VectorFunctions
    // m=2 subspaces, ksub=3, dsub=2; cell norms chosen so scores tie for
    // the last vector (cells 0 and 1 identical) -> lowest cell must win
    val book = Array(
      1.0, 0.0,  0.0, 1.0,  -1.0, 0.0,   // subspace 0
      2.0, 0.0,  2.0, 0.0,   0.0, 2.0)   // subspace 1 (cells 0,1 identical)
    val norms = Array(1.0, 1.0, 1.0, 4.0, 4.0, 4.0)
    val df = Seq(
      Seq(1.0f, 0.0f, 0.0f, 2.0f),
      Seq(-3.0f, 0.1f, 2.0f, 0.0f),
      Seq(0.9f, 0.9f, 1.0f, 1.0f)).toDF("v")
    def run(): Seq[(Seq[Int], Double)] =
      df.select(
          VectorFunctions.pqEncodeCodes(col("v"), book, norms, 2, 3, 2).as("c"))
        .select(col("c"),
          VectorFunctions.pqCodesNorm2(col("c"), norms, 2, 3).as("n2"))
        .as[(Seq[Int], Double)].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen(0) == ((Seq(0, 2), 5.0)))   // nearest cells, norms 1+4
    assert(gen(1) == ((Seq(2, 0), 5.0)))
    assert(gen(2)._1(1) == 0, "identical cells must tie to the lowest id")
  }

  test("zorder key: codegen == interpreted == reference kernel, SQL-callable") {
    import graft.functions.{LayoutFunctions, ZOrderUtil}
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L), (65536L, 1L))
    val df = pairs.toDF("a", "b")
    def run(): Seq[Long] =
      df.select(LayoutFunctions.zorderKey(col("a"), col("b")).as("z"))
        .as[Long].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen == pairs.map { case (a, b) => ZOrderUtil.interleave(a, b, 16) })
    // known values: x at even bits, y at odd; 16-bit saturation; truncation
    assert(ZOrderUtil.interleave(1L, 0L, 16) == 1L)
    assert(ZOrderUtil.interleave(0L, 1L, 16) == 2L)
    assert(ZOrderUtil.interleave(65535L, 65535L, 16) == (1L << 32) - 1)
    assert(ZOrderUtil.interleave(65536L, 1L, 16) == 2L, "high bits ignored")
    graft.plans.GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder_key(3, 5)").head().getLong(0) ==
      ZOrderUtil.interleave(3L, 5L, 16))
  }

  test("hilbert key: bijective + unit-step curve, codegen == interpreted") {
    import graft.functions.{HilbertUtil, LayoutFunctions}
    // exhaustive 16x16 grid at bits=4: a valid Hilbert index visits every
    // cell exactly once and consecutive indices are Manhattan-adjacent —
    // the locality property Z-order lacks (its power-of-two boundary
    // jumps are exactly what Hilbert layout removes)
    val byD = (for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertUtil.xy2d(x.toLong, y.toLong, 4) -> (x, y)).toMap
    assert(byD.size == 256, "xy2d must be a bijection on the grid")
    assert((1 until 256).forall { d =>
      val (x0, y0) = byD(d - 1L); val (x1, y1) = byD(d.toLong)
      math.abs(x0 - x1) + math.abs(y0 - y1) == 1
    }, "consecutive Hilbert indices must be adjacent cells")
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L), (65536L, 1L), (123L, 45678L))
    val df = pairs.toDF("a", "b")
    def run(): Seq[Long] =
      df.select(LayoutFunctions.hilbertKey(col("a"), col("b")).as("h"))
        .as[Long].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen == pairs.map { case (a, b) => HilbertUtil.xy2d(a, b, 16) })
    assert(HilbertUtil.xy2d(0L, 0L, 16) == 0L, "origin starts the curve")
    assert(HilbertUtil.xy2d(65536L, 1L, 16) == HilbertUtil.xy2d(0L, 1L, 16),
      "high bits masked, not reflected negative")
    graft.plans.GraftFunctions.register(spark)
    assert(spark.sql("SELECT hilbert_key(3, 5)").head().getLong(0) ==
      HilbertUtil.xy2d(3L, 5L, 16))
  }

  test("cdc chunks: spans partition the text, codegen == interpreted, edges") {
    import graft.functions.ChunkFunctions
    def run(): Seq[(Long, Seq[(Int, Int, Long)])] =
      Tables.documents(spark, TestSpark.sf).limit(200)
        .select(col("doc_id"), ChunkFunctions.cdcChunks(col("text")).as("ch"))
        .orderBy("doc_id").as[(Long, Seq[(Int, Int, Long)])].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen.nonEmpty)
    // spans tile [1, len] contiguously and hashes are the chunk md5-60s
    val texts = Tables.documents(spark, TestSpark.sf).limit(200)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    for ((id, chunks) <- gen) {
      val t = texts(id)
      var pos = 1
      for ((s, l, h) <- chunks) {
        assert(s == pos && l >= 1, s"doc $id span ($s,$l) at pos $pos")
        val sub = t.substring(s - 1, s - 1 + l) // fixture text is ASCII/BMP
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(sub.getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(15)
        assert(h == java.lang.Long.parseLong(hex, 16), s"doc $id hash")
        pos += l
      }
      assert(pos == t.length + 1, s"doc $id spans cover text")
    }
    // edge cases: empty -> no chunks; shorter than the window -> one chunk
    val edges = Seq("", "short", "héllo wörld — ünïcode çhars in the mix")
      .toDF("text")
      .select(ChunkFunctions.cdcChunks(col("text")).as("ch"))
      .as[Seq[(Int, Int, Long)]].collect()
    assert(edges(0).isEmpty)
    assert(edges(1) == Seq((1, 5, edges(1).head._3)))
    assert(edges(2).map(_._2).sum == "héllo wörld — ünïcode çhars in the mix".length)
  }

  test("cdc chunks: boundaries move with content — prefix edit leaves the tail chunks intact") {
    import graft.functions.ChunkFunctions
    val base = Tables.documents(spark, TestSpark.sf)
      .orderBy("doc_id").limit(8)
      .select(col("text")).as[String].collect().toSeq
    val edited = base.map("INSERTED PREFIX EDIT " + _)
    val df = (base ++ edited).toDF("text")
      .select(ChunkFunctions.cdcChunks(col("text")).as("ch"))
      .as[Seq[(Int, Int, Long)]].collect()
    val (origs, edits) = df.splitAt(base.length)
    for ((o, e) <- origs.zip(edits)) {
      val oh = o.map(_._3); val eh = e.map(_._3)
      // every boundary whose window clears the edited prefix survives, so
      // the chunk-hash sequences share their whole tail: only the chunks
      // touching the first post-edit boundary may differ
      val common = oh.reverse.zip(eh.reverse).takeWhile { case (a, b) => a == b }.length
      assert(common >= oh.length - 2,
        s"tail stability violated: ${oh.length} chunks, only $common shared")
      // a fixed-offset scheme (e.g. every-32-chars) would shift ALL chunks;
      // sanity-check that most chunk VOLUME is preserved, not just count
      assert(common >= 1 || oh.length <= 1)
    }
  }

  test("nfc normalize: composes combining marks, identity on ASCII, codegen == interpreted") {
    import graft.functions.NormalizeFunctions
    val nfd = "cafe\u0301 a\u0301 plain" // NFD-style decomposed
    val nfc = "caf\u00e9 \u00e1 plain"
    def run(): Seq[String] =
      Seq(nfd, "pure ascii stays put", "").toDF("t")
        .select(NormalizeFunctions.nfcNormalize(col("t")).as("n"))
        .as[String].collect().toSeq
    val gen = run()
    val interp = {
      val ws = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(gen == interp)
    assert(gen == Seq(nfc, "pure ascii stays put", ""))
    assert(nfd.length == nfc.length + 2, "fixture sanity: composition shrinks")
  }

  test("word shingles: fewer tokens than n yields empty array, not garbage") {
    val df = Seq("one two", "one two three four").toDF("t")
      .select(TextFunctions.wordShingles(TextFunctions.tokens(col("t")), 3).as("sh"))
    val out = df.as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("one two three", "two three four"))
  }

  test("count-min sketch: est >= exact for every key, exact for heavy hitters with spread w") {
    import graft.operators.Sketches
    // zipfish counts: key k appears k times, 1..60 (1830 occurrences)
    val occ = (1 to 60).flatMap(k => Seq.fill(k)(s"key$k")).toDF("k")
    val exact = occ.groupBy("k").count().as[(String, Long)].collect().toMap
    val cms = Sketches.cmsBuild(occ, col("k"), d = 4, w = 256)
    val est = Sketches.cmsEstimate(cms, occ.distinct(), col("k"), d = 4, w = 256)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never underestimate: $k est=${est(k)} exact=$n")
    }
    // total sketch mass per row equals the stream length
    val rowMass = cms.groupBy("row").agg(sum("cnt").as("m"))
      .as[(Int, Long)].collect().toMap
    assert(rowMass.values.forall(_ == 1830L))
  }

  test("count-min join-size estimate upper-bounds the true join cardinality") {
    import graft.operators.Sketches
    val a = (1 to 30).flatMap(k => Seq.fill(k)(s"k$k")).toDF("k") // k appears k times
    val b = (20 to 40).map(k => s"k$k").toDF("k")                 // unique keys
    // true size = sum_{k=20..30} k*1 = 275
    val est = Sketches.cmsJoinSize(
        Sketches.cmsBuild(a, col("k"), w = 64),
        Sketches.cmsBuild(b, col("k"), w = 64))
      .as[Long].head()
    assert(est >= 275L, s"CMS join estimate must never underestimate: $est")
    // with a wide sketch (no collisions among 41 keys wph) it gets close
    val estWide = Sketches.cmsJoinSize(
        Sketches.cmsBuild(a, col("k"), w = 8192),
        Sketches.cmsBuild(b, col("k"), w = 8192))
      .as[Long].head()
    assert(estWide >= 275L && estWide <= 350L,
      s"wide-sketch estimate should be near the true 275, got $estWide")
  }

  test("reconcile reports zero diffs for identical tables and exact counts for drift") {
    import graft.operators.Pipeline
    val base = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val same = Pipeline.reconcile(base, base)
      .as[(String, Long)].collect().toMap
    assert(same == Map("only_left" -> 0L, "only_right" -> 0L))
    val dropped = base.filter(col("l_orderkey") % 500 =!= 0)
    val nDropped = base.count() - dropped.count()
    val diff = Pipeline.reconcile(base, dropped).as[(String, Long)].collect().toMap
    assert(diff("only_left") == nDropped && diff("only_right") == 0L)
  }

  test("count-min sketch: shard sketches merge to the whole-corpus sketch") {
    import graft.operators.Sketches
    val occ = (1 to 40).flatMap(k => Seq.fill(k)(s"t$k")).toDF("k")
    val whole = Sketches.cmsBuild(occ, col("k"))
      .as[(Int, Long, Long)].collect().toSet
    val left = Sketches.cmsBuild(occ.filter(length(col("k")) <= 2), col("k"))
    val right = Sketches.cmsBuild(occ.filter(length(col("k")) > 2), col("k"))
    val merged = Sketches.cmsMerge(left, right)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole, "merged shard sketches must equal the one-pass sketch")
    // and the sketch itself is partition-independent
    val reparted = Sketches.cmsBuild(occ.repartition(7), col("k"))
      .as[(Int, Long, Long)].collect().toSet
    assert(reparted == whole)
  }

  test("det hll: bin() renders without leading zeros (the rho parity trick)") {
    import graft.operators.Sketches
    // the oracle computes rho as Q - length(bin(r)) + 1; that only matches
    // Spark if bin() drops leading zeros in BOTH engines — pin Spark's side
    val rows = Seq(1L, 5L, 1L << 40, (1L << 54) - 1).toDF("x")
      .select(bin(col("x")).as("b")).as[String].collect()
    assert(rows.toSeq == Seq("1", "101",
      "1" + "0" * 40, "1" * 54))
    // alpha constants from the HLL paper
    assert(Sketches.hllAlpha(64) == 0.709)
    assert(math.abs(Sketches.hllAlpha(256) - 0.7213 / (1.0 + 1.079 / 256)) == 0)
  }

  test("det hll: shard registers merge to the one-pass sketch, partition-independent") {
    import graft.operators.Sketches
    val ids = (1 to 3000).map(i => s"user$i").toDF("k")
    val whole = Sketches.hllRegisters(ids, col("k"), Seq.empty)
      .as[(Long, Int)].collect().toSet
    val left = Sketches.hllRegisters(
      ids.filter(length(col("k")) <= 7), col("k"), Seq.empty)
    val right = Sketches.hllRegisters(
      ids.filter(length(col("k")) > 7), col("k"), Seq.empty)
    val merged = Sketches.hllMerge(Seq.empty, left, right)
      .as[(Long, Int)].collect().toSet
    assert(merged == whole, "merged shard registers must equal one-pass registers")
    val reparted = Sketches.hllRegisters(ids.repartition(13), col("k"), Seq.empty)
      .as[(Long, Int)].collect().toSet
    assert(reparted == whole)
  }

  test("det hll: estimate within the m=64 error envelope, deterministic across partitionings") {
    import graft.operators.Sketches
    for (n <- Seq(500, 3000, 20000)) {
      val ids = (1 to n).map(i => s"id-$i-x").toDF("k")
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(ids, col("k"), Seq.empty), Seq.empty)
        .select(col("est_distinct")).as[Double].head()
      // RSE at m=64 is 1.04/8 = 13%; allow 4 sigma for a fixed seedless hash
      assert(math.abs(est - n) < 0.52 * n,
        s"n=$n est=$est outside the HLL error envelope")
      val est2 = Sketches.hllEstimate(
        Sketches.hllRegisters(ids.repartition(11), col("k"), Seq.empty),
        Seq.empty).select(col("est_distinct")).as[Double].head()
      assert(est == est2, "estimate must be bit-identical under repartitioning")
    }
  }

  test("kmv: exact below k, within the error envelope above it, partition-independent") {
    import graft.operators.Sketches
    // below k: the sketch holds everything and the estimate IS the count
    val small = (1 to 100).map(i => s"s$i").toDF("k")
    val estSmall = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, col("k"), Seq.empty, k = 256), Seq.empty, k = 256)
      .select(col("n_kept"), col("est_distinct")).as[(Long, Double)].head()
    assert(estSmall == ((100L, 100.0)))
    // above k: RSE ≈ 1/sqrt(k−2) ≈ 6.3% at k=256; allow 4 sigma
    for (n <- Seq(2000, 20000)) {
      val ids = (1 to n).map(i => s"id-$i-y").toDF("k")
      val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(ids, col("k"), Seq.empty, k = 256), Seq.empty, k = 256)
        .select(col("est_distinct")).as[Double].head()
      assert(math.abs(est - n) < 0.26 * n,
        s"n=$n est=$est outside the KMV error envelope")
      val est2 = Sketches.kmvEstimate(
        Sketches.kmvSketch(ids.repartition(13), col("k"), Seq.empty, k = 256),
        Seq.empty, k = 256).select(col("est_distinct")).as[Double].head()
      assert(est == est2, "estimate must be bit-identical under repartitioning")
    }
  }

  test("kmv: shard sketches merge to the one-pass sketch; grouped sketch caps at k") {
    import graft.operators.Sketches
    val ids = (1 to 5000).map(i => s"doc$i").toDF("k")
    val whole = Sketches.kmvSketch(ids, col("k"), Seq.empty, k = 64)
      .as[Long].collect().toSet
    val merged = Sketches.kmvMerge(Seq.empty, 64,
        Sketches.kmvSketch(ids.filter(length(col("k")) <= 6), col("k"), Seq.empty, 64),
        Sketches.kmvSketch(ids.filter(length(col("k")) > 6), col("k"), Seq.empty, 64))
      .as[Long].collect().toSet
    assert(merged == whole, "merged shard sketches must equal the one-pass sketch")
    val grouped = Sketches.kmvSketch(
      (1 to 900).map(i => (s"g${i % 3}", s"v$i")).toDF("g", "k"),
      col("k"), Seq(col("g") -> "g"), k = 64)
    val sizes = grouped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet == Set(64L), s"every group must keep exactly k: $sizes")
  }

  test("kmv jaccard: overlap estimated from k-row sketches tracks the true index") {
    import graft.operators.Sketches
    // |A| = 3000, |B| = 3000, |A∩B| = 1500 → J = 1500/4500 = 1/3
    val a = (1 to 3000).map(i => s"e$i").toDF("k")
    val b = (1501 to 4500).map(i => s"e$i").toDF("k")
    val row = Sketches.kmvJaccard(
        Sketches.kmvSketch(a, col("k"), Seq.empty, 256),
        Sketches.kmvSketch(b, col("k"), Seq.empty, 256), k = 256)
      .select(col("n_union_kept"), col("k_both"), col("est_union"),
        col("est_jaccard"), col("est_intersection"))
      .as[(Long, Long, Double, Double, Double)].head()
    val (nKept, kBoth, estU, estJ, estI) = row
    assert(nKept == 256L && kBoth > 0L)
    assert(math.abs(estJ - 1.0 / 3.0) < 0.12, s"est_jaccard=$estJ vs 0.333")
    assert(math.abs(estU - 4500.0) < 0.26 * 4500.0, s"est_union=$estU vs 4500")
    assert(math.abs(estI - 1500.0) < 0.35 * 1500.0, s"est_intersection=$estI vs 1500")
    // disjoint sets: zero overlap exactly
    val disj = Sketches.kmvJaccard(
        Sketches.kmvSketch(a, col("k"), Seq.empty, 256),
        Sketches.kmvSketch((5000 to 8000).map(i => s"e$i").toDF("k"),
          col("k"), Seq.empty, 256), k = 256)
      .select(col("k_both"), col("est_jaccard")).as[(Long, Double)].head()
    assert(disj == ((0L, 0.0)))
  }

  test("gridQuantiles: rank lands in the true bucket; estimate within one width") {
    import graft.operators.Sketches
    // 1..1000 with width 100: p50 rank 500 -> value 500 -> bucket 5
    // ([500,599]); p99 rank 990 -> bucket 9; exact value inside [lo, hi]
    val df = (1L to 1000L).toDF("v")
    val got = Sketches.gridQuantiles(df, col("v"), 100L,
        Seq(("p50", 1, 2), ("p99", 99, 100)))
      .as[(String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(("p50", 500L, 500L, 599L), ("p99", 990L, 900L, 999L)))
    // the exact order statistic sits inside the reported range
    got.foreach { case (_, rank, lo, hi) =>
      assert(rank >= lo && rank <= hi) // values are 1..1000 -> v == rank
    }
    // mergeable: shard sketches summed == whole-corpus answer
    val shards = Seq(df.filter(col("v") % 3 === 0),
      df.filter(col("v") % 3 === 1), df.filter(col("v") % 3 === 2))
    val merged = shards.map(_.select(expr("v DIV 100").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt")))
      .reduce(_.unionByName(_))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val whole = df.select(expr("v DIV 100").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
    // partition-independence of the estimates
    val rep = Sketches.gridQuantiles(df.repartition(13), col("v"), 100L,
        Seq(("p50", 1, 2), ("p99", 99, 100)))
      .as[(String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(rep == got)
  }
}
