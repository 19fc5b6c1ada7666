package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X186 CHECK constraints — declared once, enforced in the write plan
  * of every row-writing commit path; NULL passes (SQL semantics);
  * violations abort before any commit.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/t"

  private def violates(f: => Any): Unit = {
    val e = intercept[Exception](f)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("CHECK constraint")),
      s"expected a CHECK violation, got: $e")
  }

  test("violations abort writeSnapshot/commitSnapshot/append before any commit") {
    val root = tmp("graft_ct")
    Warehouse.setSnapshotConstraint(spark, root, "v-positive", "v > 0")
    violates {
      Warehouse.writeSnapshot(Seq((1L, 5L), (2L, -1L)).toDF("id", "v"), root)
    }
    assert(Warehouse.snapshots(spark, root).isEmpty, "no version may commit")
    // clean write passes; NULL passes (SQL CHECK semantics)
    Warehouse.writeSnapshot(
      Seq((1L, Some(5L)), (2L, None)).toDF("id", "v"), root)
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
    violates {
      Warehouse.appendSnapshot(Seq((3L, -9L)).toDF("id", "v"), root, 1L)
    }
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
    violates {
      Warehouse.commitSnapshot(Seq((3L, 0L)).toDF("id", "v"), root, 1L)
    }
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
    Warehouse.appendSnapshot(Seq((3L, 9L)).toDF("id", "v"), root, 1L)
    assert(Warehouse.readSnapshot(spark, root).count() === 3)
  }

  test("row-level writes validate their rewrites; drop lifts the gate") {
    val root = tmp("graft_ct2")
    Warehouse.writeSnapshot(Seq((1L, 5L), (2L, 7L)).toDF("id", "v"), root)
    Warehouse.setSnapshotConstraint(spark, root, "v-positive", "v > 0")
    violates {
      Warehouse.updateWhere(spark, root, col("id") === 1L, Map("v" -> lit(-5L)))
    }
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
    violates {
      Warehouse.mergeIntoSnapshot(spark, root, Seq((9L, -1L)).toDF("id", "v"),
        Seq("id"), Seq(Warehouse.InsertWhen(lit(true))))
    }
    // a delete whose survivors satisfy the constraint passes
    Warehouse.deleteWhere(spark, root, col("id") === 2L)
    assert(Warehouse.readSnapshot(spark, root).count() === 1)
    // drop the constraint: the same update now lands
    assert(Warehouse.dropSnapshotConstraint(spark, root, "v-positive"))
    assert(!Warehouse.dropSnapshotConstraint(spark, root, "v-positive"))
    Warehouse.updateWhere(spark, root, col("id") === 1L, Map("v" -> lit(-5L)))
    assert(Warehouse.readSnapshot(spark, root).select("v").as[Long].head() === -5L)
  }

  test("bad expressions fail at declaration; constraints survive and list") {
    val root = tmp("graft_ct3")
    intercept[Exception] {
      Warehouse.setSnapshotConstraint(spark, root, "broken", "v >>> !!")
    }
    Warehouse.setSnapshotConstraint(spark, root, "a", "v > 0")
    Warehouse.setSnapshotConstraint(spark, root, "b", "id < 100")
    assert(Warehouse.snapshotConstraints(spark, root) ===
      Map("a" -> "v > 0", "b" -> "id < 100"))
    violates {
      Warehouse.writeSnapshot(Seq((200L, 5L)).toDF("id", "v"), root)
    }
  }
}
