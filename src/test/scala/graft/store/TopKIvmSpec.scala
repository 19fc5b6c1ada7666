package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X208 top-k IVM — the k-extremum generalization of min/max
  * maintenance: inserts merge into the stored array algebraically,
  * deletes that could evict a retained value trigger a bounded
  * semi-pruned rescan; everything else never touches the base data.
  */
class TopKIvmSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3

  private def seed(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(count(lit(1)).as("n"),
      slice(sort_array(collect_list(col("x")), asc = false), 1, K).as("topk"))

  private def assertSame(got: org.apache.spark.sql.DataFrame,
                         want: org.apache.spark.sql.DataFrame): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"maintained:\n${got.sort("g").collect().mkString("\n")}\n" +
        s"recompute:\n${want.sort("g").collect().mkString("\n")}")

  test("law: maintained top-k equals recompute across evicting deletes, inserts and updates") {
    val oldState = Seq(
      ("a", 9L, 1L), ("a", 7L, 2L), ("a", 5L, 3L), ("a", 3L, 4L), ("a", 1L, 5L),
      ("b", 10L, 6L), ("b", 8L, 7L),
      ("c", 2L, 8L)).toDF("g", "x", "id")
    // a: top value 9 deleted (rescan promotes 3 from below the cut);
    // b: non-full array (2 < k) loses a value; c: update restates the
    // only value; d: brand-new group born inside the bracket
    val newState = Seq(
      ("a", 7L, 2L), ("a", 5L, 3L), ("a", 3L, 4L), ("a", 1L, 5L),
      ("b", 8L, 7L),
      ("c", 20L, 8L),
      ("d", 4L, 9L), ("d", 6L, 10L)).toDF("g", "x", "id")
    val feed = Warehouse.diffFrames(oldState, newState, Seq("id"), preImages = true)
      .drop("id")
    val got = Ivm.maintainTopK(seed(oldState.drop("id")), feed,
      newState.drop("id"), Seq("g"), "x", K)
    assertSame(got, seed(newState.drop("id")))
  }

  test("append-only feeds never consult the base data (poisoned newState is ignored)") {
    val oldState = Seq(("a", 5L), ("a", 2L), ("b", 1L)).toDF("g", "x")
    val feed = Seq(("a", 9L, "insert"), ("a", 3L, "insert"), ("c", 10L, "insert"))
      .toDF("g", "x", "_change_type")
    val poison = Seq(("a", 999L), ("b", 999L), ("c", 999L)).toDF("g", "x")
    val got = Ivm.maintainTopK(seed(oldState), feed, poison, Seq("g"), "x", K)
    // were the rescan consulted, 999 would leak into every array
    val want = seed(Seq(("a", 5L), ("a", 2L), ("a", 9L), ("a", 3L),
      ("b", 1L), ("c", 10L)).toDF("g", "x"))
    assertSame(got, want)
  }

  test("deletes strictly below a full array's cut stay algebraic (poison pin)") {
    // a holds 5 values, top-3 = [9,7,5]; deleting 1 (< 5, array full)
    // cannot move the top-k — the poisoned base must not be consulted
    val oldState = Seq(("a", 9L), ("a", 7L), ("a", 5L), ("a", 3L), ("a", 1L))
      .toDF("g", "x")
    val feed = Seq(("a", 1L, "delete")).toDF("g", "x", "_change_type")
    val poison = Seq(("a", 999L)).toDF("g", "x")
    val got = Ivm.maintainTopK(seed(oldState), feed, poison, Seq("g"), "x", K)
    val want = seed(Seq(("a", 9L), ("a", 7L), ("a", 5L), ("a", 3L)).toDF("g", "x"))
    assertSame(got, want)
  }

  test("same-batch insert can keep a delete clean: threshold rises above the deleted value") {
    // top-3 = [9,7,5]; insert 8 pushes the cut to 7; deleting 5 is now
    // below the cut of the MERGED candidate — clean, poison ignored
    val oldState = Seq(("a", 9L), ("a", 7L), ("a", 5L), ("a", 4L)).toDF("g", "x")
    val feed = Seq(("a", 8L, "insert"), ("a", 5L, "delete"))
      .toDF("g", "x", "_change_type")
    val poison = Seq(("a", 999L)).toDF("g", "x")
    val got = Ivm.maintainTopK(seed(oldState), feed, poison, Seq("g"), "x", K)
    val want = seed(Seq(("a", 9L), ("a", 7L), ("a", 4L), ("a", 8L)).toDF("g", "x"))
    assertSame(got, want)
  }

  test("tied retained values: deleting one of two copies at the cut rescans and keeps one") {
    val oldState = Seq(("a", 9L, 1L), ("a", 5L, 2L), ("a", 5L, 3L), ("a", 2L, 4L))
      .toDF("g", "x", "id")
    val newState = Seq(("a", 9L, 1L), ("a", 5L, 3L), ("a", 2L, 4L)).toDF("g", "x", "id")
    val feed = Warehouse.diffFrames(oldState, newState, Seq("id"), preImages = true)
      .drop("id")
    val got = Ivm.maintainTopK(seed(oldState.drop("id")), feed,
      newState.drop("id"), Seq("g"), "x", K)
    assertSame(got, seed(newState.drop("id")))
  }

  test("NULL values never rank; NULL group keys merge as one group; emptied groups drop") {
    val oldState = Seq((Some("a"), Some(5L)), (None, Some(3L)), (Some("b"), Some(1L)))
      .toDF("g", "x")
    val feed = Seq(
      (Some("a"), None, "insert"),              // null value: counts, never ranks
      (None, Some(7L), "insert"),               // null-keyed group gains a value
      (Some("b"), Some(1L), "delete"))          // b empties -> drops
      .toDF("g", "x", "_change_type")
    val newState = Seq((Some("a"), Some(5L)), (Some("a"), Option.empty[Long]),
      (None, Some(3L)), (None, Some(7L))).toDF("g", "x")
    val got = Ivm.maintainTopK(seed(oldState), feed, newState, Seq("g"), "x", K)
    assertSame(got, seed(newState))
  }

  test("bottom-k: ascending=true maintains the k smallest, threat direction flipped") {
    val oldState = Seq(("a", 1L, 1L), ("a", 3L, 2L), ("a", 5L, 3L), ("a", 7L, 4L), ("a", 9L, 5L))
      .toDF("g", "x", "id")
    // the smallest value dies (rescan pulls 7 up from past the cut);
    // an insert of 2 lands inside the retained set
    val newState = Seq(("a", 3L, 2L), ("a", 5L, 3L), ("a", 7L, 4L), ("a", 9L, 5L), ("a", 2L, 6L))
      .toDF("g", "x", "id")
    def seedAsc(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"),
        slice(sort_array(collect_list(col("x")), asc = true), 1, K).as("topk"))
    val feed = Warehouse.diffFrames(oldState, newState, Seq("id"), preImages = true)
      .drop("id")
    val got = Ivm.maintainTopK(seedAsc(oldState.drop("id")), feed,
      newState.drop("id"), Seq("g"), "x", K, ascending = true)
    assertSame(got, seedAsc(newState.drop("id")))
    // deleting the LARGEST value of a full bottom-k array stays
    // algebraic: poison pin on the base
    val st2 = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 9L)).toDF("g", "x")
    val feed2 = Seq(("a", 9L, "delete")).toDF("g", "x", "_change_type")
    val poison = Seq(("a", -999L)).toDF("g", "x")
    val got2 = Ivm.maintainTopK(seedAsc(st2), feed2, poison, Seq("g"), "x", K,
      ascending = true)
    assertSame(got2, seedAsc(Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "x")))
  }

  test("post-only update feeds are refused loudly") {
    val oldState = Seq(("a", 5L)).toDF("g", "x")
    val feed = Seq(("a", 9L, "update")).toDF("g", "x", "_change_type")
    val e = intercept[IllegalArgumentException] {
      Ivm.maintainTopK(seed(oldState), feed, oldState, Seq("g"), "x", K).collect()
    }
    assert(e.getMessage.contains("preimage"))
  }
}
