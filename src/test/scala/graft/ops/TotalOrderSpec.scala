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
}
