package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X191 join IVM — delta-join maintenance from persisted feeds:
  * ΔV = ΔA⋈B_old ∪ A_new⋈ΔB, maintained rollup ≡ direct recompute.
  */
class JoinIvmSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def recompute(a: org.apache.spark.sql.DataFrame,
                        b: org.apache.spark.sql.DataFrame) =
    a.join(b, "k").groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("s"))

  private def assertSame(got: org.apache.spark.sql.DataFrame,
                         want: org.apache.spark.sql.DataFrame): Unit = {
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"maintained:\n${got.sort("g").collect().mkString("\n")}\n" +
        s"recompute:\n${want.sort("g").collect().mkString("\n")}")
  }

  test("law: maintained join rollup equals direct recompute across mixed writes") {
    val rootA = tmpRoot("graft_jiA")
    val rootB = tmpRoot("graft_jiB")
    // A: fact (k, x) with duplicate keys; B: dim (k, g)
    val a1 = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L), (4L, 1L)).toDF("k", "x")
    val b1 = Seq((1L, "r"), (2L, "r"), (3L, "s"), (5L, "t")).toDF("k", "g")
    Warehouse.writeSnapshot(a1, rootA)
    Warehouse.writeSnapshot(b1, rootB)
    val agg0 = recompute(Warehouse.readSnapshot(spark, rootA),
      Warehouse.readSnapshot(spark, rootB))
    // A v2: append rows incl. a key B only gains later (k=5)
    Warehouse.appendSnapshot(Seq((5L, 100L), (2L, 6L)).toDF("k", "x"), rootA, 1L,
      changeFeed = true)
    // A v3: dv-delete one duplicate-key row (X189 feed composes in)
    Warehouse.deleteWhereDv(spark, rootA, col("k") === 1L && col("x") === 10L,
      changeFeed = true)
    // B v2: group-key-changing update + a delete + an insert
    Warehouse.updateWhere(spark, rootB, col("k") === 2L, Map("g" -> lit("s")),
      changeFeed = true)
    Warehouse.deleteWhere(spark, rootB, col("k") === 3L, changeFeed = true)  // v3
    Warehouse.appendSnapshot(Seq((4L, "t")).toDF("k", "g"), rootB, 3L,
      changeFeed = true)                                                     // v4
    val got = Ivm.maintainJoinAggregate(agg0,
      (rootA, 2L, 3L), (rootB, 2L, 4L),
      Seq("k"), Seq("g"), Map("s" -> "x"), "n")
    val want = recompute(Warehouse.readSnapshot(spark, rootA),
      Warehouse.readSnapshot(spark, rootB))
    assertSame(got, want)
  }

  test("unchanged side: from = to + 1 declares an empty delta") {
    val rootA = tmpRoot("graft_jiA2")
    val rootB = tmpRoot("graft_jiB2")
    Warehouse.writeSnapshot(Seq((1L, 10L), (2L, 5L)).toDF("k", "x"), rootA)
    Warehouse.writeSnapshot(Seq((1L, "r"), (2L, "s")).toDF("k", "g"), rootB)
    val agg0 = recompute(Warehouse.readSnapshot(spark, rootA),
      Warehouse.readSnapshot(spark, rootB))
    Warehouse.appendSnapshot(Seq((2L, 9L)).toDF("k", "x"), rootA, 1L, changeFeed = true)
    val got = Ivm.maintainJoinAggregate(agg0,
      (rootA, 2L, 2L), (rootB, 2L, 1L),
      Seq("k"), Seq("g"), Map("s" -> "x"), "n")
    val want = recompute(Warehouse.readSnapshot(spark, rootA),
      Warehouse.readSnapshot(spark, rootB))
    assertSame(got, want)
  }

  test("the delta joins broadcast the feed side — neither table shuffles") {
    val rootA = tmpRoot("graft_jiA3")
    val rootB = tmpRoot("graft_jiB3")
    Warehouse.writeSnapshot(Seq((1L, 10L), (2L, 5L)).toDF("k", "x"), rootA)
    Warehouse.writeSnapshot(Seq((1L, "r"), (2L, "s")).toDF("k", "g"), rootB)
    Warehouse.appendSnapshot(Seq((2L, 9L)).toDF("k", "x"), rootA, 1L, changeFeed = true)
    Warehouse.appendSnapshot(Seq((3L, "t")).toDF("k", "g"), rootB, 1L, changeFeed = true)
    val feed = Ivm.joinFeed(spark, (rootA, 2L, 2L), (rootB, 2L, 2L), Seq("k"))
    val p = feed.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2, p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("refusals: clashing non-key columns; missing join key") {
    val rootA = tmpRoot("graft_jiA4")
    val rootB = tmpRoot("graft_jiB4")
    Warehouse.writeSnapshot(Seq((1L, 10L)).toDF("k", "x"), rootA)
    Warehouse.writeSnapshot(Seq((1L, 20L)).toDF("k", "x"), rootB)  // x on both sides
    Warehouse.appendSnapshot(Seq((2L, 1L)).toDF("k", "x"), rootA, 1L, changeFeed = true)
    intercept[IllegalArgumentException] {
      Ivm.joinFeed(spark, (rootA, 2L, 2L), (rootB, 2L, 1L), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Ivm.joinFeed(spark, (rootA, 2L, 2L), (rootB, 2L, 1L), Seq("nope"))
    }
  }
}
