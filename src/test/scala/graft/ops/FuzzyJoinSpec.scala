package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val tokens = Seq(
    (1L, "spark"), (2L, "sparks"), (3L, "shark"), (4L, "spork"),
    (5L, "sparkle"), (6L, "spark"), (7L, ""), (8L, "a"), (9L, "b"),
    (10L, "ab")).toDF("id", "s")

  private def naive(k: Int): Set[(Long, Long, Long)] =
    tokens.as("x").join(tokens.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        levenshtein(col("x.s"), col("y.s")).cast("long"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= k).toSet

  test("editDistancePairs == naive cross-join verify at k=1 (dups, empty, 1-char)") {
    val got = FuzzyJoin.editDistancePairs(tokens, "id", "s", k = 1)
      .as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size, "duplicate pairs")
    assert(got.toSet === naive(1))
    // the blocking is doing real work: identical strings pair at dist 0
    assert(got.toSet.contains((1L, 6L, 0L)))
  }

  test("editDistancePairs == naive at k=2 (two-deletion neighborhoods)") {
    val got = FuzzyJoin.editDistancePairs(tokens, "id", "s", k = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === naive(2))
  }
}
