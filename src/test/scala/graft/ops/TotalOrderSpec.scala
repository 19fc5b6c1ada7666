package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TotalOrderSpec extends SparkSpec {
  import spark.implicits._

  // ids deliberately shuffled and non-contiguous; 4 test partitions
  private def df = Seq(7L, 3L, 11L, 1L, 9L, 5L, 2L, 8L, 4L, 10L, 6L, 12L)
    .map(i => (i, i % 5 + 1)).toDF("id", "v").repartition(4)

  test("globalIndex equals the single-partition window row_number") {
    val got = TotalOrder.globalIndex(df, Seq(col("id")))
      .select("id", "idx").as[(Long, Long)].collect().toMap
    val want = df.withColumn("idx", row_number().over(Window.orderBy("id")) - 1)
      .select("id", "idx").as[(Long, Int)].collect().toMap
    assert(got === want.map { case (k, v) => k -> v.toLong })
  }

  test("globalIndex is partitioning-invariant") {
    val a = TotalOrder.globalIndex(df.repartition(1), Seq(col("id")))
      .select("id", "idx").as[(Long, Long)].collect().toSet
    val b = TotalOrder.globalIndex(df.repartition(7), Seq(col("id")))
      .select("id", "idx").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("prefixSum equals the running sum under the same order") {
    val got = TotalOrder.prefixSum(df, Seq(col("id")), "v")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum("v").over(Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("packConcat: pack rows match packSequences groups; text joins in order") {
    val docs = Seq(7L, 3L, 11L, 1L, 9L)
      .map(i => (i, s"doc$i words here", 3L)).toDF("id", "text", "nt").repartition(3)
    val out = TotalOrder.packConcat(docs, Seq(col("id")), "nt", "text", maxTokens = 7)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // order 1,3,7,9,11 with 3 tokens each, budget 7 → packs by start
    // offset: 0,3 → pack 0; 6,9 → packs 0 and 1 (floor(6/7)=0!) check:
    // starts 0,3,6,9,12 → packs 0,0,0,1,1
    assert(out.length === 2)
    assert(out(0) === ((0L, 3L, 9L, "doc1 words here doc3 words here doc7 words here")))
    assert(out(1) === ((1L, 2L, 6L, "doc9 words here doc11 words here")))
    // partitioning-invariant
    val out2 = TotalOrder.packConcat(docs.repartition(1), Seq(col("id")), "nt", "text", 7)
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === out2.toSeq)
  }

  test("packSequencesPerGroup equals packSequences run per group") {
    val docs = Seq(
      (1L, "g2", 3L), (2L, "g1", 5L), (3L, "g1", 2L), (4L, "g2", 4L),
      (5L, "g1", 3L), (6L, "g3", 7L), (7L, "g2", 2L)).toDF("id", "grp", "nt")
      .repartition(3)
    val got = TotalOrder.packSequencesPerGroup(docs, "grp", Seq(col("id")), "nt", 6)
      .select("id", "grp", "pack_id").as[(Long, String, Long)].collect().sorted
    val want = Seq("g1", "g2", "g3").flatMap { g =>
      TotalOrder.packSequences(docs.filter($"grp" === g), Seq(col("id")), "nt", 6)
        .select("id", "grp", "pack_id").as[(Long, String, Long)].collect()
    }.sorted
    assert(got.toSeq === want.toSeq)
  }

  test("packSequences: packs are contiguous, ordered, and respect the budget") {
    // v values 1..5; budget 4 → multiple docs per pack, some packs split mid-run
    val out = TotalOrder.packSequences(df, Seq(col("id")), "v", maxTokens = 4)
      .orderBy("id").select("id", "v", "pack_id").as[(Long, Long, Long)].collect()
    // pack id = floor(preceding-total / budget): recompute by hand
    var cum = 0L
    out.foreach { case (_, v, pack) =>
      assert(pack === cum / 4, s"doc at cum=$cum")
      cum += v
    }
    // packs never decrease in id order
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
  }
  test("epochShuffle: dense per-epoch positions, partitioning-invariant, epochs differ") {
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def run(np: Int) = TotalOrder.epochShuffle(docs.repartition(np), "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = run(2)
    assert(a.length === 120)
    // each epoch is a permutation: positions exactly 0..39
    (0L to 2L).foreach { e =>
      val pos = a.filter(_._2 == e).map(_._3).sorted
      assert(pos.toSeq === (0L until 40L).toSeq, s"epoch $e")
    }
    // deterministic under a different input partitioning
    assert(a.sortBy(x => (x._2, x._3)).toSeq === run(7).sortBy(x => (x._2, x._3)).toSeq)
    // different epochs shuffle differently (md5 keys differ per epoch)
    val byId0 = a.filter(_._2 == 0L).map(x => x._1 -> x._3).toMap
    val byId1 = a.filter(_._2 == 1L).map(x => x._1 -> x._3).toMap
    assert((1L to 40L).exists(id => byId0(id) != byId1(id)))
  }

}
