package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X198 COUNT DISTINCT via a maintained support relation, X199
  * AVG/VAR via maintained moments — the two classic non-self-
  * maintainable aggregates, closed by the right auxiliary state.
  */
class IvmDistinctMomentsSpec extends SparkSpec {
  import spark.implicits._

  private def same(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"left-only:\n${a.exceptAll(b).collect().mkString("\n")}\n" +
        s"right-only:\n${b.exceptAll(a).collect().mkString("\n")}")
  }

  private val oldState = Seq(
    ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 20L),
    ("b", 4L, 30L), ("b", 5L, 30L), ("c", 6L, 40L)
  ).toDF("g", "id", "v")

  // id 2 deleted (duplicate value 10 survives via id 1); id 5 deleted
  // (kills b's duplicate 30 copy, 30 survives via id 4); id 6 deleted
  // (c emptied); id 3 updated 20 -> 10 (a's distinct set shrinks);
  // id 7/8 inserted
  private val newState = Seq(
    ("a", 1L, 10L), ("a", 3L, 10L),
    ("b", 4L, 30L), ("b", 7L, 50L), ("d", 8L, 60L)
  ).toDF("g", "id", "v")

  private def feed = Warehouse.diffFrames(oldState, newState, Seq("id"),
    preImages = true)

  test("distinct support law: maintained distinct counts equal the recompute") {
    val support0 = oldState.groupBy("g", "v").agg(count(lit(1)).as("m"))
    val support1 = Ivm.maintainDistinctSupport(support0, feed, Seq("g"), "v")
    val got = Ivm.distinctCounts(support1, Seq("g"))
    val want = newState.groupBy("g").agg(countDistinct(col("v")).as("nd"))
    same(got, want)
    // the support itself is the recomputed multiplicity relation
    same(support1, newState.groupBy("g", "v").agg(count(lit(1)).as("m")))
  }

  test("distinct support: NULL values are skipped like COUNT(DISTINCT)") {
    val old2 = Seq(("a", 1L, Some(10L)), ("a", 2L, None: Option[Long])).toDF("g", "id", "v")
    val new2 = Seq(("a", 1L, Some(10L)), ("a", 2L, None: Option[Long]),
      ("a", 3L, None: Option[Long])).toDF("g", "id", "v")
    val support0 = old2.where(col("v").isNotNull)
      .groupBy("g", "v").agg(count(lit(1)).as("m"))
    val f = Warehouse.diffFrames(old2, new2, Seq("id"), preImages = true)
    val support1 = Ivm.maintainDistinctSupport(support0, f, Seq("g"), "v")
    same(Ivm.distinctCounts(support1, Seq("g")),
      new2.groupBy("g").agg(countDistinct(col("v")).as("nd")))
  }

  test("moments law: maintained (n, cnt, sum, sq) equals the recompute; stats derive") {
    def momentsOf(df: DataFrame): DataFrame =
      df.groupBy("g").agg(count(lit(1)).as("n"), count(col("v")).as("v_cnt"),
        sum(col("v")).as("v_sum"), sum(col("v") * col("v")).as("v_sq"))
    val got = Ivm.maintainMoments(momentsOf(oldState), feed, Seq("g"),
      Map("v" -> "v"), "n")
    same(got, momentsOf(newState))
    // derived avg/var match the direct aggregates (integer-exact input)
    val stats = Ivm.momentStats(got, Seq("v")).select("g", "v_avg", "v_var")
    val want = newState.groupBy("g").agg(
      avg(col("v")).as("v_avg"), var_samp(col("v")).as("v_var"))
    same(stats, want)
  }

  test("moments: NULL measures count in n but not in cnt/sum/sq") {
    val old2 = Seq(("a", 1L, Some(4L))).toDF("g", "id", "v")
    val new2 = Seq(("a", 1L, Some(4L)), ("a", 2L, None: Option[Long]),
      ("a", 3L, Some(6L))).toDF("g", "id", "v")
    def momentsOf(df: DataFrame): DataFrame =
      df.groupBy("g").agg(count(lit(1)).as("n"), count(col("v")).as("v_cnt"),
        sum(col("v")).as("v_sum"), sum(col("v") * col("v")).as("v_sq"))
    val f = Warehouse.diffFrames(old2, new2, Seq("id"), preImages = true)
    val got = Ivm.maintainMoments(momentsOf(old2), f, Seq("g"), Map("v" -> "v"), "n")
    same(got, momentsOf(new2))
    val r = Ivm.momentStats(got, Seq("v")).select("n", "v_cnt", "v_avg")
      .as[(Long, Long, Double)].head()
    assert(r === ((3L, 2L, 5.0)))
  }

  test("NULL group keys stay ONE group, exactly like SQL GROUP BY (null-safe merge)") {
    val old2 = Seq((Some("a"), 1L, 10L), (None: Option[String], 2L, 20L),
      (None: Option[String], 3L, 30L)).toDF("g", "id", "v")
    val new2 = Seq((Some("a"), 1L, 10L), (None: Option[String], 3L, 30L),
      (None: Option[String], 4L, 30L)).toDF("g", "id", "v")
    val f = Warehouse.diffFrames(old2, new2, Seq("id"), preImages = true)
    // count/sum: the NULL group's delete must land in the NULL group
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    same(Ivm.maintainAggregate(aggOf(old2), f, Seq("g"), Map("s" -> "v"), "n"),
      aggOf(new2))
    // distinct support under a NULL group key
    val support0 = old2.groupBy("g", "v").agg(count(lit(1)).as("m"))
    same(Ivm.distinctCounts(
      Ivm.maintainDistinctSupport(support0, f, Seq("g"), "v"), Seq("g")),
      new2.groupBy("g").agg(countDistinct(col("v")).as("nd")))
    // min/max: the NULL group's extremum dies (the delete of v=20 kills
    // its min) — the dirty rescan must find the NULL group null-safely
    def mmOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"),
        min("v").as("mn"), max("v").as("mx"))
    val old3 = Seq((None: Option[String], 2L, 20L),
      (None: Option[String], 3L, 30L), (Some("a"), 4L, 1L)).toDF("g", "id", "v")
    val new3 = Seq((None: Option[String], 3L, 30L), (Some("a"), 4L, 1L)).toDF("g", "id", "v")
    val f3 = Warehouse.diffFrames(old3, new3, Seq("id"), preImages = true)
    same(Ivm.maintainMinMax(mmOf(old3), f3, new3, Seq("g"),
      mins = Map("mn" -> "v"), maxs = Map("mx" -> "v"), "n"), mmOf(new3))
  }

  test("a support seeded with raw groupBy (NULL value rows included) still obeys the law") {
    val old2 = Seq(("a", 1L, Some(10L)), ("a", 2L, None: Option[Long])).toDF("g", "id", "v")
    val new2 = Seq(("a", 1L, Some(10L))).toDF("g", "id", "v")
    // the naive seed carries an (a, NULL, 1) row — maintenance must
    // drop it rather than let it inflate the distinct count forever
    val support0 = old2.groupBy("g", "v").agg(count(lit(1)).as("m"))
    val f = Warehouse.diffFrames(old2, new2, Seq("id"), preImages = true)
    same(Ivm.distinctCounts(
      Ivm.maintainDistinctSupport(support0, f, Seq("g"), "v"), Seq("g")),
      new2.groupBy("g").agg(countDistinct(col("v")).as("nd")))
  }

  test("post-only update feeds are refused (inherited preimage parity)") {
    val postOnly = Seq(("a", 1L, 99L)).toDF("g", "id", "v")
      .withColumn("_change_type", lit("update"))
    val support0 = oldState.groupBy("g", "v").agg(count(lit(1)).as("m"))
    intercept[IllegalArgumentException] {
      Ivm.maintainDistinctSupport(support0, postOnly, Seq("g"), "v")
    }
    intercept[IllegalArgumentException] {
      Ivm.maintainMoments(
        oldState.groupBy("g").agg(count(lit(1)).as("n"), count(col("v")).as("v_cnt"),
          sum(col("v")).as("v_sum"), sum(col("v") * col("v")).as("v_sq")),
        postOnly, Seq("g"), Map("v" -> "v"), "n")
    }
  }
}
