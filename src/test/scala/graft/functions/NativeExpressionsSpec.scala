package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Each native codegen expression vs the equivalent built-in
  * (higher-order-function) formulation it replaced — results must be
  * bit-identical on generated inputs, since the oracle gate and the
  * dedup/similarity semantics were originally defined by the HOF
  * forms.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default.withSize(30), Seed(7L + i)))

  test("DotProductF ≡ aggregate(zip_with(...)) incl. accumulation order") {
    val vecs = samples(Gen.listOfN(64, Gen.choose(-5.0f, 5.0f)), 20).map(_.toArray)
    val df = vecs.grouped(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(native.dotF($"a", $"b").as("k"), hof.as("h")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1))) // bit-exact
  }

  test("DotProductF: null element or length mismatch → null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (Array(1.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
    val out = df.select(native.dotF($"a", $"b")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }

  test("WordShinglesExpr ≡ array_distinct(transform(sequence...)) over split(lower)") {
    val texts = samples(Gen.listOf(Gen.oneOf("a", "b", "cc", "Dd", "", "e f")), 30)
      .map(_.mkString(" ")) ++ Seq("", " ", "one two", "x y z x y z", "A  B C")
    val df = texts.toDF("text")
    val t = split(lower($"text"), " ")
    val hof = when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + lit(1)), element_at(t, i + lit(2)), element_at(t, i + lit(3))))))
      .otherwise(array().cast("array<string>"))
    df.select(native.wordShingles($"text", 3).as("k"), hof.as("h")).collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1), s"for ${r}"))
  }

  test("SharesShingleExpr ≡ arrays_overlap(wordShingles, set); null text → null; empty set → false") {
    val texts = samples(Gen.listOf(Gen.oneOf("a", "b", "cc", "Dd", "", "e f")), 30)
      .map(_.mkString(" ")) ++ Seq("", " ", "one two", "x y z x y z", "A  B C", "a b cc")
    val benchSet = new java.util.HashSet[String]()
    Seq("a b cc", "dd  e", "z x y").foreach(benchSet.add)
    val setCol = typedLit(Seq("a b cc", "dd  e", "z x y"))
    val df = texts.toDF("text")
    df.select(native.sharesShingle($"text", 3, benchSet).as("k"),
        arrays_overlap(native.wordShingles($"text", 3), setCol).as("h")).collect()
      .foreach(r => assert(r.getBoolean(0) === r.getBoolean(1), s"for ${r}"))
    val nullRow = Seq[Option[String]](None).toDF("text")
      .select(native.sharesShingle($"text", 3, benchSet)).collect()
    assert(nullRow(0).isNullAt(0))
    val emptySet = new java.util.HashSet[String]()
    val none = texts.toDF("text")
      .select(native.sharesShingle($"text", 3, emptySet)).collect()
    none.foreach(r => assert(!r.getBoolean(0)))
  }

  test("WordNgramsExpr ≡ transform(sequence...) over split(lower), repeats kept") {
    val texts = samples(Gen.listOf(Gen.oneOf("a", "b", "cc", "Dd", "", "e f")), 30)
      .map(_.mkString(" ")) ++ Seq("", " ", "one two", "x y z x y z", "A  B C")
    val df = texts.toDF("text")
    val t = split(lower($"text"), " ")
    val hof = when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + lit(1)), element_at(t, i + lit(2)), element_at(t, i + lit(3)))))
      .otherwise(array().cast("array<string>"))
    df.select(native.wordNgrams($"text", 3).as("k"), hof.as("h")).collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1), s"for ${r}"))
  }

  test("TokenCountsExpr ≡ explode + groupBy count, first-seen order, empties kept") {
    val texts = samples(Gen.listOf(Gen.oneOf("a", "b", "cc", "Dd", "")), 30)
      .map(_.mkString(" ")) ++ Seq("", " ", "x y x", "A a A")
    texts.zipWithIndex.foreach { case (text, i) =>
      val out = Seq(text).toDF("text")
        .select(explode(native.tokenCounts($"text")).as("tc"))
        .select($"tc.token", $"tc.tf").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val want = toks.distinct.map(t => t -> toks.count(_ == t).toLong)
      assert(out.toSeq === want, s"case $i: '$text'")
    }
  }

  test("MinHashSigExpr ≡ explode + groupBy(min over (a·x+b) mod P)") {
    val as = Array(3L, 7L, 2147483629L)
    val bs = Array(11L, 0L, 17L)
    val df = Seq((1L, Seq("aa bb cc", "bb cc dd")), (2L, Seq("zz yy xx"))).toDF("id", "sh")
    val kernel = df.select($"id", native.minhashSig($"sh", as, bs).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val P = 4294967311L
    val hofDf = df.select($"id", explode($"sh").as("s"))
      .withColumn("x", pmod(xxhash64($"s"), lit(4294967296L)))
    val hof = hofDf.groupBy("id")
      .agg(min(pmod(lit(as(0)) * $"x" + lit(bs(0)), lit(P))).as("h0"),
        min(pmod(lit(as(1)) * $"x" + lit(bs(1)), lit(P))).as("h1"),
        min(pmod(lit(as(2)) * $"x" + lit(bs(2)), lit(P))).as("h2"))
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(kernel === hof)
  }

  test("SimHash64Expr ≡ per-bit sign of summed hash bits") {
    val df = Seq((1L, Seq("aa", "bb", "cc")), (2L, Seq("zz"))).toDF("id", "sh")
    val kernel = df.select($"id", native.simhash64($"sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ex = df.select($"id", explode($"sh").as("s")).withColumn("h", xxhash64($"s"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright($"h", b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val fp = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)).reduce(_ + _)
    val hof = ex.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select($"id", fp.as("fp")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === hof)
  }

  test("MinHashBandKeysExpr: same shingles → same keys; band ids packed in high bits") {
    val as = Array.tabulate(8)(i => 2L * i + 3); val bs = Array.tabulate(8)(i => 5L * i)
    val df = Seq((1L, Seq("p q r")), (2L, Seq("p q r")), (3L, Seq("s t u"))).toDF("id", "sh")
    val keys = df.select($"id", native.minhashBandKeys($"sh", as, bs, 4).as("k"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(keys(1L) === keys(2L))
    assert(keys(1L) !== keys(3L))
    assert(keys(1L).zipWithIndex.forall { case (k, b) => (k >>> 48) === b.toLong })
  }

  test("LshKeysExpr: multiprobe emits own + hamming-1 buckets per table") {
    val planes = Array(Array(Array(1.0, 0.0), Array(0.0, 1.0))) // 1 table, 2 bits
    val df = Seq((1L, Array(1.0f, -1.0f))).toDF("id", "v")
    val own = df.select(native.lshKeys($"v", planes, multiprobe = false))
      .head().getSeq[Long](0)
    val probes = df.select(native.lshKeys($"v", planes, multiprobe = true))
      .head().getSeq[Long](0)
    assert(own.length === 1 && probes.length === 3)
    assert(own.head === 1L) // bit0: dot=1≥0 → set; bit1: dot=-1<0 → clear
    assert(probes.toSet === Set(1L, 0L, 3L)) // own, flip bit0, flip bit1
  }

  test("CentroidProbesExpr: ordered nearest centroids by dot product") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val df = Seq((1L, Array(0.9f, 0.5f))).toDF("id", "v")
    val probes = df.select(native.centroidProbes($"v", cents, 2)).head().getSeq[Int](0)
    assert(probes === Seq(0, 1)) // dot: 0.9, 0.5, -0.9
  }

  test("PostingPairsExpr: sorted (a<b) pairs with carried sizes; <2 ids -> empty") {
    val df = Seq(
      (Seq((5L, 50L), (2L, 20L), (9L, 90L)), "unsorted in"),
      (Seq((1L, 10L)), "single"),
      (Seq.empty[(Long, Long)], "empty"))
      .toDF("ids_raw", "label")
      .select(expr("transform(ids_raw, x -> struct(x._1 as doc_id, x._2 as n))").as("ids"), $"label")
    val out = df.select(native.postingPairs($"ids").as("p"), $"label").collect()
      .map(r => r.getString(1) -> r.getSeq[org.apache.spark.sql.Row](0)).toMap
    assert(out("unsorted in").map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))) ===
      Seq((2L, 20L, 5L, 50L), (2L, 20L, 9L, 90L), (5L, 50L, 9L, 90L)))
    assert(out("single").isEmpty)
    assert(out("empty").isEmpty)
  }

  test("RepetitionStatsExpr: one-pass counts match hand-computed values") {
    val out = Seq("a b a b a", "", "X x", "a  b")
      .toDF("text")
      .select(native.repetitionStats($"text").as("r"))
      .collect().map(_.getStruct(0)).map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // "a b a b a": 5 tokens, 2 distinct, top "a" x3, bigrams {a b, b a}
    assert(out(0) === ((5L, 2L, 3L, 2L)))
    // "": one empty token
    assert(out(1) === ((1L, 1L, 1L, 0L)))
    // "X x" lowercases to two equal tokens, one distinct bigram
    assert(out(2) === ((2L, 1L, 2L, 1L)))
    // "a  b": empty middle token from the double space
    assert(out(3) === ((3L, 3L, 1L, 2L)))
  }

  test("type misuse fails at ANALYSIS time, not with garbage results (SQL surface)") {
    // the unsafe kernels reinterpret raw bytes — dot_f(array<int>) once
    // returned silent garbage; checkInputDataTypes must reject it
    graft.functions.Registry.registerAll(spark)
    Seq((1L, Seq(1, 2, 3))).toDF("id", "xs").createOrReplaceTempView("ints_v")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_f(xs, xs) FROM ints_v").collect()
    }
    assert(e1.getMessage.contains("ARRAY<FLOAT>"), e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT word_shingles(id, 3) FROM ints_v").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("string"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(xs) FROM ints_v").collect()
    }
    assert(e3.getMessage.contains("array<string>"), e3.getMessage)
    // and the valid shapes still pass analysis
    Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "v").createOrReplaceTempView("floats_v")
    assert(spark.sql("SELECT dot_f(v, v) FROM floats_v").head().getDouble(0) === 5.0)
  }

  test("rankBucket: upper_bound semantics; NaN ranks TOP (Spark total order), matching the HOF form") {
    val bs = Array(1.0, 2.0, 2.0, 5.0)
    assert(Kernels.rankBucket(0.5, bs) === 0)
    assert(Kernels.rankBucket(1.0, bs) === 1)  // equals land higher
    assert(Kernels.rankBucket(2.0, bs) === 3)  // duplicate boundaries all count
    assert(Kernels.rankBucket(4.9, bs) === 3)
    assert(Kernels.rankBucket(99.0, bs) === 4)
    // Spark SQL ranks NaN greater than every double — the replaced
    // `size(filter(array(...), b => v >= b))` counted ALL boundaries
    // for NaN, so the kernel must too (not IEEE's all-false compares)
    assert(Kernels.rankBucket(Double.NaN, bs) === 4)
    // cross-check the expression against the predicate formulation on
    // a NaN-bearing column
    import org.apache.spark.sql.functions._
    val df = Seq(0.5, 1.0, 4.9, Double.NaN, 99.0).toDF("x")
    val viaKernel = df.select(graft.functions.native.rankBucket(col("x"), bs)).collect().map(_.getInt(0))
    val viaHof = df.select(size(filter(
      array(bs.map(lit(_)): _*), b => col("x") >= b))).collect().map(_.getInt(0))
    assert(viaKernel.toSeq === viaHof.toSeq)
  }

  // the md5 ±1 codebook rule, verbatim from Similarity.md5PqCodebooks
  // (private[ext]; reconstructed here so the kernel equivalence pins
  // against the REAL codebooks — which contain duplicate codewords at
  // kc=16/subDim=8, exercising the tie rule, not just random data)
  private def md5Cb(m: Int, kc: Int, subDim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, kc, subDim) { (j, c, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"pq:$j:$c:$i".getBytes("UTF-8"))
      if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
    }

  test("PqEncodeDotExpr ≡ array_sort(struct(0.0 − dot, c)) argmax — incl. ties and ±0.0") {
    val (m, kc, dim) = (8, 16, 64)
    val sub = dim / m
    val cb = md5Cb(m, kc, sub)
    val vecs = samples(Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f)), 40).map(_.toArray) ++ Seq(
      Array.fill(dim)(0.0f),          // every dot ±0.0 → all-tie → lowest index
      Array.fill(dim)(-0.0f),         // −0.0 lane of the same tie
      Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f))
    val df = vecs.toSeq.toDF("embedding")
    val v = col("embedding").cast("array<double>")
    // the expression form encodePqRows replaced, verbatim
    val exprCode = array((0 until m).map { j =>
      val s = slice(v, j * sub + 1, sub)
      val packs = array((0 until kc).map { c =>
        struct((lit(0.0) - native.dotF(s, typedLit(cb(j)(c).toSeq))).as("ns"),
          lit(c).as("c"))
      }: _*)
      element_at(array_sort(packs), 1).getField("c")
    }: _*)
    df.select(native.pqEncodeDot(v, cb).as("k"), exprCode.as("h")).collect()
      .foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1), s"row $r"))
    // the real codebooks must actually contain a duplicate codeword
    // somewhere (birthday at kc=16 over 2^8 patterns) so the tie rule
    // above was genuinely exercised; if this ever fails, add an
    // explicit duplicate-codebook case
    assert(cb.exists(cbj => cbj.map(_.toSeq).distinct.length < kc),
      "expected ≥1 duplicate codeword pair in the md5 codebooks")
  }

  test("PqDecodeExpr ≡ concat(element_at(typedlit(cb), code+1)); out-of-range → null") {
    val (m, kc, dim) = (8, 16, 64)
    val sub = dim / m
    val cb = md5Cb(m, kc, sub)
    val vecs = samples(Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f)), 20).map(_.toArray)
    val df = vecs.toSeq.toDF("embedding")
      .select(native.pqEncodeDot(col("embedding").cast("array<double>"), cb).as("code"))
    val exprDec = concat((0 until m).map { j =>
      element_at(typedLit(cb(j).map(_.toSeq).toSeq), element_at(col("code"), j + 1) + 1)
    }: _*)
    df.select(native.pqDecode(col("code"), cb).as("k"), exprDec.as("h")).collect()
      .foreach(r => assert(r.getSeq[Double](0) === r.getSeq[Double](1), s"row $r"))
    // decoded dots are bit-identical too (the score the oracle hashes)
    val q = vecs.head.map(_.toDouble)
    df.select(
        native.dotF(typedLit(q.toSeq), native.pqDecode(col("code"), cb)).as("k"),
        native.dotF(typedLit(q.toSeq), exprDec).as("h")).collect()
      .foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // out-of-range code index → null (element_at → null → concat → null)
    val bad = Seq(Seq.fill(m)(kc)).toDF("code") // kc is one past the last valid
    assert(bad.select(native.pqDecode(col("code"), cb)).head().isNullAt(0))
  }
}
