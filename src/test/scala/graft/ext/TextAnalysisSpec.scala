package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and BPE-ish estimate") {
    val df = Seq((1L, "the quick brownfoxjumps over, it.")).toDF("doc_id", "text")
    val r = df.select(TextAnalysis.tokenCount($"text"),
      TextAnalysis.tokenCountBpe($"text")).head()
    assert(r.getInt(0) === 5)
    // words: the(1) quick(2:1+1) brownfoxjumps(13:1+3) over,(5:1+1) it.(3:1) = 1+2+4+2+1=10; punct=2
    assert(r.getLong(1) === 12L)
  }

  test("langId picks the language with the densest function words") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el perro y la casa de los gatos"),
      (3L, "der hund und die katze von den"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextAnalysis.langId($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
    assert(out(3L) === "de")
    assert(out(4L) === "en") // all-zero scores → preference order fallback
  }

  test("quality features: exact arithmetic on a known doc") {
    val text = "the cat sat on. the mat," // 6 whitespace tokens, punct attached
    val out = TextAnalysis.qualityFeatures(Seq((1L, text)).toDF("doc_id", "text")).head()
    val s = out.schema
    assert(out.getLong(s.fieldIndex("n_tokens")) === 6L)
    val avg = out.getDouble(s.fieldIndex("avg_token_len"))
    assert(math.abs(avg - (text.count(_ != ' ').toDouble / 6)) < 1e-12)
    assert(out.getDouble(s.fieldIndex("stopword_ratio")) === 2.0 / 6) // "the" twice
    assert(out.getDouble(s.fieldIndex("punct_ratio")) === 2.0 / text.length)
  }

  test("vocabulary: frequency-ordered, deterministic ties, top-N cut") {
    val df = Seq((1L, "b a b c a b"), (2L, "c a")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(df, 2).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(v.toSeq === Seq(("a", 3L), ("b", 3L))) // tie a/b → token asc
  }

  test("splitAssign: deterministic, ~80/10/10, stable across repartitioning") {
    val df = spark.range(1000).toDF("doc_id")
    val s1 = TextAnalysis.splitAssign(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextAnalysis.splitAssign(df.repartition(7)).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 && math.abs(frac("val") - 0.1) < 0.04)
  }

  test("normalizeText kernel matches the HOF reference formulation") {
    // the pre-kernel formulation, kept here as the semantic oracle
    def hofNorm(text: org.apache.spark.sql.Column) = {
      val toks = split(regexp_replace(trim(lower(text)), " +", " "), " ")
      array_join(filter(toks, (t, i) => (i === 0) || (t =!= element_at(toks, i))), " ")
    }
    val docs = Seq(
      "  The THE the  quick   brown brown fox  ",
      "a a a",
      "", "   ", "single",
      "a b a b a",
      "tab\there tab\there", // non-space whitespace is part of the token
      "Ünïcode Ünïcode tokens")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = df.select(TextAnalysis.normalizeText($"text"), hofNorm($"text")).collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(rows(0).getString(0) === "the quick brown fox")
    assert(rows(1).getString(0) === "a")
  }

  test("chunkTokens: window boundaries, overlap, and short-doc behavior") {
    // 10 tokens, maxTokens=4, stride=3 → nc = ceil((10-4)/3)+1 = 3,
    // token offsets 0, 3, 6 — the last chunk ends exactly at token 10
    val words = (1 to 10).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(df, maxTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(r => (r._1, r._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1 === Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, "w4 w5 w6 w7"),
      (1L, 2L, 4L, "w7 w8 w9 w10")))
    // short doc → one whole-text chunk; empty text is one empty token
    assert(out.filter(_._1 == 2L) === Seq((2L, 0L, 2L, "a b")))
    assert(out.filter(_._1 == 3L) === Seq((3L, 0L, 1L, "")))
    // overlap: consecutive chunks share maxTokens - stride tokens
    assert(doc1(0)._4.split(" ").last === doc1(1)._4.split(" ").head)
  }

  test("mixtureSample: endpoint weights, determinism, and monotone fractions") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    // weight 1.0 keeps everything, 0.0 keeps nothing, missing source keeps everything
    val kept = TextAnalysis.mixtureSample(df,
      Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src0") === 100)
    assert(!bySrc.contains("src1"))
    assert(bySrc("src2") > 20 && bySrc("src2") < 80) // ~50 of 100
    assert(bySrc("src3") === 100)
    // identical survivors under a different partitioning
    val kept2 = TextAnalysis.mixtureSample(df.repartition(7),
      Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sorted.toSeq === kept2.sorted.toSeq)
  }

  test("mixtureResample: integer repeats + stable fractional extras, zero drops") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val out = TextAnalysis.mixtureResample(df,
      Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.5, "src3" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src1") === 200) // exactly 2 copies each of 100 docs
    assert(!bySrc.contains("src3")) // weight 0 drops the source
    assert(bySrc("src0") >= 200 && bySrc("src0") <= 300) // 2 or 3 copies
    assert(bySrc("src2") >= 20 && bySrc("src2") <= 80)   // ~half keep one
    // copy_idx is dense 0..n-1 per doc
    out.groupBy(_._1).foreach { case (_, copies) =>
      assert(copies.map(_._3).sorted.toSeq === (0L until copies.length).toSeq)
    }
    // deterministic across partitionings
    val out2 = TextAnalysis.mixtureResample(df.repartition(7),
      Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.5, "src3" -> 0.0))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.toSeq === out2.sorted.toSeq)
  }

  test("unigramLogProb: hand-computed MLE scores") {
    // corpus tokens: a a b | b  → freq a=2 b=2, total=4
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // every token has p = 2/4 → avg log10 p = log10(0.5) ≈ -0.30103
    assert(out(1L)._1 === 3L)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(1L)._2 - (-0.30103)) < 1e-9)
    assert(math.abs(out(2L)._2 - (-0.30103)) < 1e-9)
  }

  test("tfidfTopTerms: hand-computed scores, rank order, tie-break") {
    // d1: x x y   d2: y z   → df_t: x=1 y=2 z=1, N=2
    // d1: x: 2*ln2 ≈ 1.386294, y: 0; d2: z: ln2 ≈ 0.693147, y: 0
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .sortBy(r => (r._1, r._2))
    assert(out === Seq(
      (1L, 1, "x", 2L, 1.386294), (1L, 2, "y", 1L, 0.0),
      (2L, 1, "z", 1L, 0.693147), (2L, 2, "y", 1L, 0.0)))
  }

  test("ngramCounts: raw occurrence counts, short-doc exclusion, tie order") {
    // "a b a b" → trigrams: "a b a", "b a b"; "a b" → none (len < 3)
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "a b a")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(df, n = 3, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a b a", 2L), ("b a b", 1L)))
    // raw counts, not per-doc distinct: a doc repeating a gram counts each time
    val rep = TextAnalysis.ngramCounts(Seq((1L, "x y x y x")).toDF("doc_id", "text"), 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep.toSeq === Seq(("x y", 2L), ("y x", 2L)))
  }

  test("samplePerSource: exact N per group, deterministic, partition-stable") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val s1 = TextAnalysis.samplePerSource(df, 7).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(s1.length === 21)
    assert(s1.groupBy(_._2).forall(_._2.length == 7))
    val s2 = TextAnalysis.samplePerSource(df.repartition(11), 7).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(s1.toSeq === s2.toSeq)
    // a group smaller than N yields the whole group
    val small = TextAnalysis.samplePerSource(df.filter($"doc_id" < 5), 7).collect()
    assert(small.length === 5)
  }

  test("stratifiedQuota: exact per-source counts, unbudgeted sources dropped, partition-stable") {
    val df = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val quotas = Map("src0" -> 10L, "src1" -> 3L) // src2 unbudgeted → dropped
    val s1 = TextAnalysis.stratifiedQuota(df, quotas).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val bySrc = s1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("src0" -> 10, "src1" -> 3))
    // stable under repartitioning (md5 order, not physical order)
    val s2 = TextAnalysis.stratifiedQuota(df.repartition(13), quotas).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(s1.toSeq === s2.toSeq)
    // quota above the stratum size yields the whole stratum
    val all = TextAnalysis.stratifiedQuota(df, Map("src0" -> 1000L)).collect()
    assert(all.length === 100)
    // the chosen prefix agrees with samplePerSource's md5 order
    val viaN = TextAnalysis.samplePerSource(df.filter($"source" === "src0"), 10)
      .collect().map(_.getLong(0)).toSet
    assert(s1.filter(_._2 == "src0").map(_._1).toSet === viaN)
  }

  test("compressionRatio: repetitive text deflates below prose, prose below noise; deterministic") {
    val rnd = new scala.util.Random(7)
    val noise = (1 to 200).map(_ => rnd.alphanumeric.take(5).mkString).mkString(" ")
    val prose = "the quick brown fox jumps over the lazy dog and then wanders " * 20
    val spam = "buy now " * 160
    val df = Seq((1L, spam), (2L, prose), (3L, noise), (4L, "")).toDF("doc_id", "text")
    val r = df.select($"doc_id", TextAnalysis.compressionRatio($"text").as("cr"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < r(2L), s"spam ${r(1L)} should deflate below prose ${r(2L)}")
    assert(r(2L) < r(3L), s"prose ${r(2L)} should deflate below noise ${r(3L)}")
    assert(r(4L) === 1.0) // empty text scores neutral
    assert(r(1L) > 0.0 && r(3L) < 1.5)
    // deterministic across evaluations
    val again = df.select($"doc_id", TextAnalysis.compressionRatio($"text").as("cr"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again === r)
  }

  test("corpusHealth: exact per-source rollup on a hand-computed fixture") {
    val df = Seq(
      (1L, "srcA", "the cat sat"),            // 3 tokens, distinct, no pii
      (2L, "srcA", "spam spam spam spam"),    // dup frac 0.75
      (3L, "srcB", "mail me at a@b.co now")   // email pii
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.corpusHealth(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out(0)._1 === "srcA" && out(0)._2 === 2L)
    assert(out(0)._3 === 0.375) // mean of 0.0 and 0.75
    assert(out(0)._4 === 0L)
    assert(out(1) === (("srcB", 1L, 0.0, 1L)))
  }

  test("tokenHistogram: bucket boundaries and exact means") {
    val df = Seq(
      (1L, (1 to 9).map(_ => "w").mkString(" ")),   // 9 tokens  → bucket 0
      (2L, (1 to 10).map(_ => "w").mkString(" ")),  // 10 tokens → bucket 1
      (3L, (1 to 19).map(_ => "w").mkString(" "))   // 19 tokens → bucket 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenHistogram(df, width = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(out(0) === ((0L, 1L, 17.0)))          // "w w ... w" ×9 = 17 chars
    assert(out(1)._1 === 1L && out(1)._2 === 2L) // docs 2 and 3
    assert(out(1)._3 === (19.0 + 37.0) / 2)
  }

  test("repetition kernel matches the explode-aggregate reference formulation") {
    import org.apache.spark.sql.DataFrame
    // the round-2/3 shape, kept here as the independent reference:
    // explode → (doc, token) counts → per-doc max, joined onto per-row
    // distinct/bigram fractions
    def reference(df: DataFrame): DataFrame = {
      val t = split(lower(col("text")), " ")
      val perDoc = df.select(col("doc_id"), explode(t).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id").agg(max(col("cnt")).as("top_cnt"))
      df.select(
          col("doc_id"),
          size(t).cast("long").as("n_tokens"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          when(size(t) >= 2,
            lit(1.0) - size(graft.functions.native.wordShingles(col("text"), 2)).cast("double")
              / (size(t) - 1).cast("double"))
            .otherwise(lit(0.0)).as("dup_bigram_frac"))
        .withColumn("dup_token_frac",
          lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"))
        .join(perDoc, Seq("doc_id"))
        .withColumn("top_token_frac", col("top_cnt").cast("double") / col("n_tokens").cast("double"))
        .select("doc_id", "n_tokens", "n_distinct", "dup_token_frac", "top_token_frac", "dup_bigram_frac")
    }
    val fixtures = Seq(
      "the the the the", // one token repeated: top frac 1, dup 3/4
      "a b c d", "a a b b", "single", "",
      "  leading and  double  spaces", // empty tokens count
      "Mixed CASE mixed case", // lowercased before counting
      "x y x y x") // dup bigrams: {x y, y x} distinct of 4 windows
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = fixtures.toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFeatures(df).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val ref = reference(df).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(got.keySet === ref.keySet)
    got.keySet.foreach(k => assert(got(k) === ref(k), s"doc $k"))
    // spot-check one row by hand: "the the the the"
    assert(got(0L) === Seq(4L, 1L, 0.75, 1.0, 1.0 - 1.0 / 3.0))
  }

  test("rolling fingerprint matches an independent driver-side reimplementation") {
    // the same fold — fp = (acc*31 + (md5_32(tok) mod M)) mod M over
    // split(lower(text), " ") — written directly against JDK
    // MessageDigest, no Column API involved (the engine-portable hash
    // q_fingerprint_rolling's DuckDB oracle recomputes)
    val M = 2147483647L
    def md5_32(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def expected(text: String): Long =
      text.toLowerCase.split(" ", -1).foldLeft(0L) { (acc, w) =>
        java.lang.Math.floorMod(acc * 31L + java.lang.Math.floorMod(md5_32(w), M), M)
      }
    val fixtures = Seq(
      "The quick brown fox", "the quick brown fox", // case-insensitive
      "a b c", "c b a", // order-aware
      "", "single", "  double  spaces ", // empty tokens kept by split(-1)
      "Ünïcode tokens here")
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.fingerprintRolling($"text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fixtures.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === expected(t), s"fixture '$t'")
    }
  }

  test("fingerprints: md5 stable, rolling order-aware") {
    val df = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fps = df.select(TextAnalysis.fingerprintMd5($"text"), TextAnalysis.fingerprintRolling($"text"))
      .collect()
    assert(fps(0).getString(0) !== fps(1).getString(0))
    assert(fps(0).getLong(1) !== fps(1).getLong(1)) // order matters
    assert(fps.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 2147483647L))
  }

  test("lexicalStats: hand-computed counts, TTR, and entropy") {
    val df = Seq(
      (1L, "a b a"),          // c = {a:2, b:1}
      (2L, "x x x x"),        // degenerate: entropy 0
      (3L, "p q r s")         // all distinct: entropy log2(4) = 2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalStats(df).orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 2L)
    assert(got(0).getDouble(3) === 0.666667) // round(2/3, 6)
    // H = log2(3) − (2·log2 2 + 1·0)/3 = 1.584963 − 0.666667
    assert(math.abs(got(0).getDouble(4) - 0.918296) < 1e-6)
    assert(got(1).getDouble(4) === 0.0 && got(1).getDouble(3) === 0.25)
    assert(got(2).getDouble(4) === 2.0 && got(2).getDouble(3) === 1.0)
  }

  test("zipfFit: exact power-law fixture gives slope −1, R² 1") {
    // freq = 12/rank exactly: a×12 b×6 c×4 d×3 → ln freq is linear in
    // ln rank with slope −1 and intercept ln 12
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(3)("d")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text")).head()
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === -1.0)
    assert(math.abs(out.getDouble(2) - math.log(12.0)) < 1e-5)
    assert(out.getDouble(3) === 1.0)
  }

  test("lexicalStats: empty text is one empty token (split semantics)") {
    val got = TextAnalysis.lexicalStats(Seq((1L, "")).toDF("doc_id", "text")).head()
    assert(got.getLong(1) === 1L && got.getLong(2) === 1L)
    assert(got.getDouble(3) === 1.0 && got.getDouble(4) === 0.0)
  }

  test("oovRate: tokens outside the top-N vocabulary are counted per doc") {
    // corpus token freqs: a=4, c=3, b=2 -> top-2 vocab = {a, c}
    val docs = Seq(
      (1L, "a a b"),       // b oov -> 1/3
      (2L, "a b c"),       // b oov -> 1/3
      (3L, "a c c")        // 0 oov
    ).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, topN = 2).orderBy("doc_id").collect()
    val s = out.head.schema
    def row(i: Int) = (out(i).getLong(s.fieldIndex("n_tokens")),
      out(i).getLong(s.fieldIndex("n_oov")), out(i).getDouble(s.fieldIndex("oov_rate")))
    assert(row(0) === ((3L, 1L, 0.333333)))
    assert(row(1) === ((3L, 1L, 0.333333)))
    assert(row(2) === ((3L, 0L, 0.0)))
  }
  test("bigramLogProb: add-1 model on a hand-computed corpus; <2-token docs emit nothing") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "b a"), (4L, "x"))
      .toDF("doc_id", "text")
    // c(a b)=2, c(b a)=1; contexts a->2, b->1; V={a,b,x}=3
    // doc1/2: log10((2+1)/(2+3)) = log10(0.6); doc3: log10((1+1)/(1+3))
    val out = TextAnalysis.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L) === ((1L, -0.221849)))
    assert(out(2L) === ((1L, -0.221849)))
    assert(out(3L) === ((1L, -0.30103)))
  }

  test("bm25TopK: hand-computed scores, tf saturation and length normalization") {
    val docs = Seq(
      (1L, "apple apple pear plum"), // tf=2, dl=4
      (2L, "apple fig"),             // tf=1, dl=2
      (3L, "pear plum fig")          // no hit
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq(1 -> Seq("apple")), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // N=3, df=2, idf=ln(1+1.5/2.5); avg_dl=3
    val idf = math.log(1.0 + 1.5 / 2.5)
    val s1 = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0))
    val s2 = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3.0))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Array((1, 1, 1L, r6(s1)), (1, 2, 2L, r6(s2))))
  }
  test("bm25TopK: multi-term queries sum per-term contributions; k caps ranks") {
    val docs = Seq((1L, "a b"), (2L, "a a"), (3L, "b b"), (4L, "c c")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq(1 -> Seq("a", "b")), k = 2)
      .orderBy("rank").collect()
    assert(out.length === 2)
    // doc 1 hits both terms; docs 2/3 hit one with higher tf — equal dl
    // everywhere so the two-term doc scores highest
    assert(out.head.getLong(2) === 1L)
  }
  test("temperatureMixture: alpha=1 is the natural distribution; alpha<1 boosts small sources") {
    val docs = Seq(
      (1L, "s1", "w w w w w w w w w"), // 9 tokens
      (2L, "s2", "w")                  // 1 token
    ).toDF("doc_id", "source", "text")
    val nat = TextAnalysis.temperatureMixture(docs, alpha = 1.0)
      .orderBy("source").collect()
    assert(nat.map(_.getDouble(5)).toSeq === Seq(1.0, 1.0)) // boost
    val t = TextAnalysis.temperatureMixture(docs, alpha = 0.5)
      .orderBy("source").collect()
      .map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    // p_temp: 3/4 vs 1/4 ; p_nat: 0.9 vs 0.1 -> boosts 5/6 and 2.5
    assert(t("s1") === ((0.75, 0.833333)))
    assert(t("s2") === ((0.25, 2.5)))
  }
  test("sourceDivergence: identical distributions give kl=0, skewed source diverges") {
    val docs = Seq(
      (1L, "s1", "a a b"), (2L, "s1", "a b b"),
      (3L, "s2", "a a b"), (4L, "s2", "a b b"),
      (5L, "s3", "a a a") // all mass on a
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceDivergence(docs, topN = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("s1") === out("s2"))
    assert(out("s3") > out("s1"))
    // corpus: a=9/15, b=6/15; s1: a=3/6, b=3/6
    val kl1 = 0.5 * math.log(0.5 / 0.6) + 0.5 * math.log(0.5 / 0.4)
    assert(math.abs(out("s1") - kl1) < 1e-6)
  }
  test("kfoldAssign: folds are in range, deterministic, and match splitAssign's hash family") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val folds = TextAnalysis.kfoldAssign(docs, k = 5).select("doc_id", "fold")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.values.forall(f => f >= 0 && f < 5))
    assert(folds.values.toSet.size === 5) // all folds populated at n=200
    val again = TextAnalysis.kfoldAssign(docs.repartition(7), k = 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === folds)
  }
  test("qualityGatePerSource: keeps ceil(frac*n) top-scored docs per source") {
    // s1: 4 docs with increasing length (score rises with n_tokens);
    // s2: 1 doc — a tiny source must survive a per-source gate
    val docs = Seq(
      (1L, "s1", "the a"), (2L, "s1", "the a of to in"),
      (3L, "s1", "the a of to in is it and the a"),
      (4L, "s1", "the"), (5L, "s2", "x")
    ).toDF("doc_id", "source", "text")
    val kept = TextAnalysis.qualityGatePerSource(docs, keepFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // ceil(4*0.5)=2 from s1 (the two longest), ceil(1*0.5)=1 from s2
    assert(kept.map(_._1).toSet === Set(3L, 2L, 5L))
    assert(kept.filter(_._2 == "s1").map(_._3).sorted.toSeq === Seq(1, 2))
  }

}
