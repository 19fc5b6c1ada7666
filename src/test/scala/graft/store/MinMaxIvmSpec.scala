package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X194 min/max IVM — bounded dirty-group rescan: algebra maintains
  * everything inserts can change; only groups whose current extremum
  * might have died consult the base data.
  */
class MinMaxIvmSpec extends SparkSpec {
  import spark.implicits._

  private def recompute(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(count(lit(1)).as("n"), min("x").as("mn"), max("x").as("mx"))

  private def assertSame(got: org.apache.spark.sql.DataFrame,
                         want: org.apache.spark.sql.DataFrame): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"maintained:\n${got.sort("g").collect().mkString("\n")}\n" +
        s"recompute:\n${want.sort("g").collect().mkString("\n")}")

  test("law: maintained min/max equals recompute across extremum kills and updates") {
    val oldState = Seq(("a", 5L), ("a", 9L), ("b", 1L), ("b", 7L), ("c", 3L))
      .toDF("g", "x")
    // a: min 5 deleted (rescan -> 9); b: max 7 updated to 0 (rescan ->
    // min shifts too); c: untouched; d: brand new group; e: group
    // inserted then fully deleted inside the bracket (never appears)
    val newState = Seq(("a", 9L), ("b", 1L), ("b", 0L), ("c", 3L), ("d", 42L))
      .toDF("g", "x")
    val feed = Warehouse.diffFrames(
      oldState.withColumn("id", monotonically_increasing_id()),
      newState.withColumn("id", monotonically_increasing_id() + 100),
      Seq("id"), preImages = true).drop("id")
    // diffFrames keys on id -> every change is insert/delete pairs here
    val got = Ivm.maintainMinMax(recompute(oldState), feed, newState,
      Seq("g"), mins = Map("mn" -> "x"), maxs = Map("mx" -> "x"))
    assertSame(got, recompute(newState))
  }

  test("duplicate extrema: deleting one of two tied minima keeps the min (rescan resolves)") {
    val oldState = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 8L, 3L)).toDF("g", "x", "id")
    val newState = Seq(("a", 5L, 2L), ("a", 8L, 3L)).toDF("g", "x", "id")
    val feed = Warehouse.diffFrames(oldState, newState, Seq("id"), preImages = true)
      .drop("id")
    val got = Ivm.maintainMinMax(recompute(oldState.drop("id")), feed,
      newState.drop("id"), Seq("g"), mins = Map("mn" -> "x"), maxs = Map("mx" -> "x"))
    assertSame(got, recompute(newState.drop("id")))
  }

  test("append-only feeds never consult the base data (poisoned newState is ignored)") {
    val oldState = Seq(("a", 5L), ("b", 1L)).toDF("g", "x")
    val feed = Seq(("a", 3L, "insert"), ("c", 10L, "insert"))
      .toDF("g", "x", "_change_type")
    val poison = Seq(("a", -999L), ("b", -999L), ("c", -999L)).toDF("g", "x")
    val got = Ivm.maintainMinMax(recompute(oldState), feed, poison,
      Seq("g"), mins = Map("mn" -> "x"), maxs = Map("mx" -> "x"))
    // were the rescan consulted, -999 would leak into mn
    val want = recompute(Seq(("a", 5L), ("a", 3L), ("b", 1L), ("c", 10L)).toDF("g", "x"))
    assertSame(got, want)
  }

  test("safe deletes stay algebraic: a mid-range delete marks nothing dirty") {
    val oldState = Seq(("a", 1L), ("a", 5L), ("a", 9L)).toDF("g", "x")
    val feed = Seq(("a", 5L, "delete")).toDF("g", "x", "_change_type")
    val poison = Seq(("a", -999L)).toDF("g", "x")
    val got = Ivm.maintainMinMax(recompute(oldState), feed, poison,
      Seq("g"), mins = Map("mn" -> "x"), maxs = Map("mx" -> "x"))
    val want = recompute(Seq(("a", 1L), ("a", 9L)).toDF("g", "x"))
    assertSame(got, want)
  }

  test("post-only update feeds are refused") {
    val oldState = Seq(("a", 5L)).toDF("g", "x")
    val feed = Seq(("a", 7L, "update")).toDF("g", "x", "_change_type")
    intercept[IllegalArgumentException] {
      Ivm.maintainMinMax(recompute(oldState), feed, oldState,
        Seq("g"), mins = Map("mn" -> "x"))
    }
  }
}
