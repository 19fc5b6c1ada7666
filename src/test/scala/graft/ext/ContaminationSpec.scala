package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // a benchmark question and a corpus where doc 10 quotes it verbatim
  private val bench = docs(
    (100L, "what is the capital of france answer paris of course"))
  private val corpus = docs(
    (10L, "trivia dump: what is the capital of france answer paris obviously"),
    (11L, "completely unrelated text about spark shuffles and partitions here"),
    (12L, "france paris capital the is what")) // same words, different order — no shared 5-gram

  test("flag finds verbatim overlap and nothing else") {
    val flagged = Contamination.flag(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet === Set(10L))
    // shared distinct 5-grams of "what is the capital of france answer paris":
    // 8-token overlap run → 4 shared 5-grams
    assert(flagged(10L) === 4L)
  }

  test("attribute: names WHICH benchmark doc, with the shared-gram count per pair") {
    // second benchmark item sharing a different overlap with doc 10
    val bench2 = bench.union(docs(
      (101L, "trivia dump: what is the capital of france answer")))
    val pairs = Contamination.attribute(corpus, bench2, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 10 shares 4 distinct 5-grams with bench 100 (the 8-token
    // run) and 5 with bench 101 (its full 9-token prefix); doc 12's
    // reordered words share none; doc 11 shares none
    assert(pairs.keySet === Set((10L, 100L), (10L, 101L)))
    assert(pairs((10L, 100L)) === 4L)
    assert(pairs((10L, 101L)) === 5L)
    // the doc-grain flag is the attribution's a-side margin ON SHARED
    // GRAMS — consistent fixture-wide for the single-bench case
    val flagged = Contamination.flag(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged(10L) === pairs((10L, 100L)))
  }

  test("minShared raises the bar") {
    assert(Contamination.flag(corpus, bench, n = 5, minShared = 5).count() === 0L)
  }

  test("clean drops exactly the flagged docs") {
    val kept = Contamination.clean(corpus, bench, n = 5)
      .select(col("doc_id")).as[Long].collect().sorted
    assert(kept.toSeq === Seq(11L, 12L))
  }

  test("flagBloom: no false negatives vs exact flag; exact on this fixture") {
    val exact = Contamination.flag(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Contamination.flagBloom(corpus, bench, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // superset guarantee (bloom has no false negatives)
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n, s"doc $id lost by bloom")
    }
    // at fpp=0.001 over a handful of shingles, no FP fires: sets equal
    assert(bloom === exact)
    // a larger planted check: 200 corpus docs, every 10th contaminated
    val big = (0L until 200L).map { i =>
      if (i % 10 == 0) (i, s"padding $i then what is the capital of france answer paris")
      else (i, s"doc $i words alpha beta gamma delta epsilon zeta eta theta")
    }.toDF("doc_id", "text")
    val bigExact = Contamination.flag(big, bench, n = 5)
      .collect().map(_.getLong(0)).toSet
    val bigBloom = Contamination.flagBloom(big, bench, n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(bigExact.subsetOf(bigBloom), "bloom lost a contaminated doc")
    assert(bigExact === (0L until 200L by 10).toSet)
    // single-probe FPs can inflate minShared=1 (expected ~2 in 1800
    // probes at fpp=0.001); at minShared=2 a clean doc needs TWO FP
    // probes (~4e-5 per doc) — the screening threshold regime
    val bigExact2 = Contamination.flag(big, bench, n = 5, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    val bigBloom2 = Contamination.flagBloom(big, bench, n = 5, minShared = 2)
      .collect().map(_.getLong(0)).toSet
    assert(bigBloom2 === bigExact2)
  }

  test("flagBloomMd5: no false negatives vs exact flag (sf0.001 documents)") {
    // X187's screening law on real corpus data: the md5-lane bit set
    // can only ADD shared-shingle counts (deterministic FPs), never
    // lose one — every exactly-contaminated doc survives with
    // n_shared at least its exact count
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val c = d.filter(org.apache.spark.sql.functions.col("doc_id") % 17 =!= 0)
    val b = d.filter(org.apache.spark.sql.functions.col("doc_id") % 17 === 0)
    val exact = Contamination.flag(c, b, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Contamination.flagBloomMd5(c, b, n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "fixture should contain contamination")
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id) && bloom(id) >= n, s"doc $id lost by md5 bloom")
    }
    // tiny m forces dense bits: the screen degrades to flagging MORE,
    // never fewer — the no-false-negatives direction under pressure
    val dense = Contamination.flagBloomMd5(c, b, n = 5, mBits = 64L)
      .collect().map(_.getLong(0)).toSet
    assert(exact.keySet.subsetOf(dense))
    assert(dense.size >= bloom.size)
  }

  test("semanticScreen flags embedding-space leaks; clean docs absent; ties pick min bench_id") {
    // a "paraphrase" shares the benchmark's direction with a different
    // norm (the leak n-gram overlap can't see); an orthogonal doc and a
    // 45-degree doc stay clean at threshold 0.9
    val bench = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(2.0f, 0.01f)),  // ≈ bench 0's direction → flagged
      (11L, Seq(1.0f, 1.0f)),   // 0.707 to both → clean at 0.9
      (12L, Seq(-3.0f, 0.0f))   // antipodal → clean
    ).toDF("vec_id", "embedding")
    val out = Contamination.semanticScreen(corpus, bench, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(10L), s"only the paraphrase is contaminated: $out")
    assert(out(10L)._1 === 0L && out(10L)._2 > 0.999)
    // exact tie across two benchmark twins resolves to the SMALLEST
    // bench id (deterministic audit output)
    val twins = Seq((5L, Seq(1.0f, 0.0f)), (6L, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val tied = Contamination.semanticScreen(
      Seq((20L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding"), twins, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(tied.toSeq === Seq((20L, 5L, 1.0)))
    // zero-norm embeddings (padding/empty docs) must not abort the job
    // under ANSI division — zero corpus vectors read clean, zero bench
    // vectors match nothing
    val zeros = Contamination.semanticScreen(
      Seq((30L, Seq(0.0f, 0.0f)), (31L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding"),
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(zeros.toSeq === Seq((31L, 1L)))
  }
}
