package graft.store

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X176 update pre-images + X177 incremental aggregate maintenance:
  * maintain(agg(v-1), feed(v)) ≡ agg(v) across every feed-recording
  * write path, and across a multi-version range in one pass.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"maintained != recomputed:\nmaintained ${a.collect().toSeq}\nrecomputed ${b.collect().toSeq}")
  }

  test("feeds carry update preimages; maintenance law holds per commit and across a range") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivm").toString + "/t"
    // groups g = id % 4; measures v
    val base = spark.range(0, 200).toDF("id")
      .withColumn("g", col("id") % 4).withColumn("v", col("id") * 10)
    Warehouse.writeSnapshot(base.repartitionByRange(3, col("id")), root)
    val agg1 = aggOf(Warehouse.readSnapshot(spark, root, Some(1L)))

    // v2: update moves measure mass (and leaves groups intact)
    Warehouse.updateWhere(spark, root, col("id") % 10 === 3,
      Map("v" -> (col("v") + 7)), changeFeed = true)
    // v3: delete one group's slice entirely and part of another
    Warehouse.deleteWhere(spark, root, col("id") < 40, changeFeed = true)
    // v4: merge — deletes, group-key-changing updates, inserts
    val src = Seq((50L, 9L, 0L), (51L, 0L, 0L), (1000L, 7L, 777L), (1001L, 7L, 778L))
      .toDF("id", "g", "v")
    Warehouse.mergeIntoSnapshot(spark, root, src, Seq("id"), Seq(
      Warehouse.DeleteWhen(col("s.id") === 51L),
      Warehouse.UpdateWhen(col("s.id") === 50L,
        Map("g" -> col("s.g"), "v" -> lit(5L))),
      Warehouse.InsertWhen(lit(true))), changeFeed = true)
    // v5: plain append
    Warehouse.appendSnapshot(Seq((2000L, 2L, 20L), (2001L, 3L, 30L)).toDF("id", "g", "v"),
      root, 4L, changeFeed = true)

    // per-commit law
    var agg = agg1
    (2L to 5L).foreach { v =>
      val feed = Warehouse.readChangeFeed(spark, root, v, v).drop("_commit_version")
      agg = Ivm.maintainAggregate(agg, feed, Seq("g"), Map("s" -> "v"), "n")
      assertSame(agg, aggOf(Warehouse.readSnapshot(spark, root, Some(v))))
    }
    // whole-range fold in one pass (telescoping signs)
    assertSame(
      Ivm.maintainFromWarehouse(agg1, root, Seq("g"), 2L, 5L,
        Map("s" -> "v"), "n"),
      aggOf(Warehouse.readSnapshot(spark, root)))
    // the update feed really carries balanced preimages
    val uf = Warehouse.readChangeFeed(spark, root, 2L, 2L)
    val byType = uf.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType("update") === byType("update_preimage"))
    // preimage rows hold the OLD values
    val pre = uf.filter(col("_change_type") === "update_preimage" && col("id") === 3L)
    assert(pre.select("v").as[Long].head() === 30L)
  }

  test("a group emptied by deletes is dropped; one emptied then refilled survives") {
    val old = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("id", "g", "v")
    val neu = Seq((3L, "b", 5L), (9L, "a", 99L)).toDF("id", "g", "v")
    val feed = Warehouse.diffFrames(old, neu, Seq("id"), preImages = true)
    val maintained = Ivm.maintainAggregate(
      aggOf(old), feed, Seq("g"), Map("s" -> "v"), "n")
    assertSame(maintained, aggOf(neu))
    // drop 'a' entirely: the group vanishes from the maintained state
    val gone = Warehouse.diffFrames(neu, neu.filter(col("g") =!= "a"), Seq("id"),
      preImages = true)
    assertSame(
      Ivm.maintainAggregate(maintained, gone, Seq("g"), Map("s" -> "v"), "n"),
      aggOf(neu.filter(col("g") =!= "a")))
  }

  test("post-only update feeds are refused — count would drift, not just sums") {
    val old = Seq((1L, "a", 10L)).toDF("id", "g", "v")
    val neu = Seq((1L, "a", 11L)).toDF("id", "g", "v")
    val postOnly = Warehouse.diffFrames(old, neu, Seq("id")) // no preimages
    intercept[IllegalArgumentException] {
      Ivm.maintainAggregate(aggOf(old), postOnly, Seq("g"),
        Map("s" -> "v"), "n").collect()
    }
    intercept[IllegalArgumentException] { // count-only is refused too
      Ivm.maintainAggregate(aggOf(old), postOnly, Seq("g")).collect()
    }
  }
}
