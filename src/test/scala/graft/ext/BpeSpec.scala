package graft.ext

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Classic Sennrich-style fixture. Token frequencies:
  //   low×3, lower×2, newest×1, a×1
  // Round 1 pair counts: (l,o)=5 (o,w)=5 (w,e)=3 (e,r)=2 (n,e)=1 ...
  //   tie at 5 broken lexicographically -> (l,o)
  // Round 2: (lo,w)=5 -> merge
  // Round 3: (low,e)=2 ties (e,r)=2 -> "e"<"low" picks (e,r)
  // Round 4: (low,er)=2 -> merge; everything left is freq 1 -> stop
  private val corpus = Seq(
    (1L, "low low low"), (2L, "lower lower"), (3L, "newest a")
  ).toDF("doc_id", "text")

  test("learn: exact hand-computed merge sequence with deterministic tie-breaks") {
    val rules = Bpe.learn(corpus, merges = 10, minFreq = 2L).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq === Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "e", "r", 2L),
      (4, "low", "er", 2L)))
  }

  test("learn stops at the merge budget and is partitioning-invariant") {
    val two = Bpe.learn(corpus.repartition(7), merges = 2)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2)))
    assert(two.toSeq === Seq("l" -> "o", "lo" -> "w"))
  }

  test("greedy remerge is left-to-right: 'aaa' under (a,a) -> [aa, a]") {
    // freq 2 so (a,a) clears minFreq; "aaa" contributes pairs (a,a)x2,
    // after one merge the only adjacency is (aa, a) with freq 2
    val df = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val rules = Bpe.learn(df, merges = 2).orderBy("step")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(rules.toSeq === Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }
  test("encode: piece counts and fertility from the learned segmentation; OOV falls back to chars") {
    val (_, seg) = Bpe.learnWithSegmentation(corpus, merges = 10, minFreq = 2L)
    // segmentation after the 4 merges (the last one fuses low+er):
    // low=[low] lower=[lower] newest=[n,e,w,e,s,t] a=[a]
    val out = Bpe.encode(corpus, seg).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((3L, 3L, 1.0)))   // "low low low"
    assert(out(2L) === ((2L, 2L, 1.0)))   // "lower lower"
    assert(out(3L) === ((2L, 7L, 3.5)))   // "newest a"
    // unseen word: character-level fallback
    val oov = Bpe.encode(Seq((9L, "zz low")).toDF("doc_id", "text"), seg).head()
    assert((oov.getLong(1), oov.getLong(2), oov.getDouble(3)) === ((2L, 3L, 1.5)))
  }

}
