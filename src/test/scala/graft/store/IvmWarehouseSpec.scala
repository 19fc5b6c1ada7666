package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X216 from-warehouse IVM wrappers — each must wire the feed
  * bracket, the `_commit_version` drop, and (for the extremum family)
  * the PINNED post-bracket state, not the latest snapshot.
  */
class IvmWarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("minmax and topk wrappers: maintained ≡ recompute; post-bracket state is PINNED") {
    val root = tmpRoot("graft_ivw")
    val v1 = Seq(("a", 9L, 1L), ("a", 5L, 2L), ("b", 7L, 3L)).toDF("g", "x", "id")
    Warehouse.writeSnapshot(v1, root)
    // v2: delete a's max (forces a dirty rescan of the post-bracket
    // state), insert a new b value
    Warehouse.deleteWhereDv(spark, root, col("id") === 1, changeFeed = true)
    Warehouse.appendSnapshot(Seq(("b", 11L, 4L)).toDF("g", "x", "id"), root, 2L,
      changeFeed = true)
    val at3 = Warehouse.readSnapshot(spark, root, Some(3L))
    // v4 commits AFTER the bracket: a poison value that would corrupt
    // the rescan if the wrapper consulted the LATEST state
    Warehouse.appendSnapshot(Seq(("a", 999L, 5L)).toDF("g", "x", "id"), root, 3L,
      changeFeed = true)

    val seedMm = v1.groupBy("g").agg(count(lit(1)).as("n"),
      min("x").as("mn"), max("x").as("mx"))
    val gotMm = Ivm.maintainMinMaxFromWarehouse(seedMm, root, Seq("g"), 2L, 3L,
      mins = Map("mn" -> "x"), maxs = Map("mx" -> "x"))
    val wantMm = at3.groupBy("g").agg(count(lit(1)).as("n"),
      min("x").as("mn"), max("x").as("mx"))
    assert(gotMm.exceptAll(wantMm).isEmpty && wantMm.exceptAll(gotMm).isEmpty,
      s"minmax: ${gotMm.collect().mkString(",")} vs ${wantMm.collect().mkString(",")}")

    val seedTk = v1.groupBy("g").agg(count(lit(1)).as("n"),
      slice(sort_array(collect_list(col("x")), asc = false), 1, 2).as("topk"))
    val gotTk = Ivm.maintainTopKFromWarehouse(seedTk, root, Seq("g"), "x", 2, 2L, 3L)
    val wantTk = at3.groupBy("g").agg(count(lit(1)).as("n"),
      slice(sort_array(collect_list(col("x")), asc = false), 1, 2).as("topk"))
    assert(gotTk.exceptAll(wantTk).isEmpty && wantTk.exceptAll(gotTk).isEmpty,
      "topk wrapper must rescan the toVersion-pinned state, not latest " +
        s"(got ${gotTk.collect().mkString(",")})")
  }

  test("distinct and moments wrappers fold the bracket's feeds") {
    val root = tmpRoot("graft_ivw2")
    val v1 = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 3L)).toDF("g", "x", "id")
    Warehouse.writeSnapshot(v1, root)
    Warehouse.deleteWhereDv(spark, root, col("id") === 2, changeFeed = true)
    val support0 = v1.groupBy("g", "x").agg(count(lit(1)).as("m"))
      .withColumnRenamed("x", "v")
    val sup = Ivm.maintainDistinctFromWarehouse(
      support0.withColumnRenamed("v", "x"), root, Seq("g"), "x", 2L, 2L)
    assert(Ivm.distinctCounts(sup, Seq("g")).head().getLong(1) === 2L,
      "one copy of a duplicate died; both values still live")
    val m0 = v1.groupBy("g").agg(count(lit(1)).as("n"), count("x").as("x_cnt"),
      sum("x").as("x_sum"), sum(col("x") * col("x")).as("x_sq"))
    val m1 = Ivm.maintainMomentsFromWarehouse(m0, root, Seq("g"),
      Map("x" -> "x"), 2L, 2L)
    val r = m1.head()
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((2L, 3L, 5L)),
      "moments after deleting one x=1 row: cnt 2, sum 3, sq 5")
  }

  test("maintainDegrees: degree view rides the edge feed - maintained == recompute (X245)") {
    val root = tmpRoot("graft_ivdeg")
    // path 1-2-3-4 plus the far edge 10-11
    val e1 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    Warehouse.writeSnapshot(e1, root)
    val deg0 = graft.ops.Graphs.degrees(e1)
    // bracket: delete (2,3) - splits the path - and insert (4,10),
    // bridging to the far pair; node 5 appears via (4,5)
    Warehouse.deleteWhereDv(spark, root,
      col("a") === 2L && col("b") === 3L, changeFeed = true)
    Warehouse.appendSnapshot(Seq((4L, 10L), (4L, 5L)).toDF("a", "b"), root, 2L,
      changeFeed = true)
    val maintained = Ivm.maintainDegreesFromWarehouse(deg0, root, 2L, 3L)
    val recompute = graft.ops.Graphs.degrees(Warehouse.readSnapshot(spark, root, Some(3L)))
    assert(maintained.exceptAll(recompute).isEmpty &&
      recompute.exceptAll(maintained).isEmpty,
      s"${maintained.collect().mkString(",")} vs ${recompute.collect().mkString(",")}")
    // the churned endpoints moved, untouched ones did not, new node
    // appeared with its degree
    val m = maintained.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(2L) === 1L && m(3L) === 1L, "deleted edge -1s both endpoints")
    assert(m(4L) === 3L, "insert bracket +2s node 4")
    assert(m(1L) === 1L && m(11L) === 1L, "untouched endpoints keep their degree")
    assert(m(5L) === 1L, "a brand-new node enters through the feed")
  }
}
