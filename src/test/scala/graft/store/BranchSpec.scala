package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X171 snapshot branches — write-audit-publish over the global
  * version sequence.
  */
class BranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  test("branch commits advance the branch ref only; main readers never see them") {
    val root = tmp("graft_branch")
    Warehouse.writeSnapshot(spark.range(0, 100).toDF("id"), root)
    assert(Warehouse.createBranch(spark, root, "audit") === 1L)
    // duplicate create refuses — a branch is a lineage, not a tag
    intercept[IllegalArgumentException] {
      Warehouse.createBranch(spark, root, "audit")
    }
    val v2 = Warehouse.commitToBranch(
      spark.range(0, 150).toDF("id"), root, "audit", expectedBranchVersion = 1L)
    assert(v2 === 2L)
    // the branch sees the staged write; main (`_latest`) does not
    assert(Warehouse.branchHead(spark, root, "audit") === 2L)
    assert(Warehouse.readSnapshotBranch(spark, root, "audit").count() === 150)
    assert(Warehouse.readSnapshot(spark, root).count() === 100)
    // branch-lineage CAS: stale expected head conflicts
    intercept[Warehouse.SnapshotConflictException] {
      Warehouse.commitToBranch(spark.range(0, 1).toDF("id"), root, "audit", 1L)
    }
    // the branch commit is a first-class version: pinned-readable,
    // listed in history alongside main's
    assert(Warehouse.readSnapshot(spark, root, Some(2L)).count() === 150)
    assert(Warehouse.snapshots(spark, root) === Seq(1L, 2L))
    assert(Warehouse.snapshotBranches(spark, root) === Seq(("audit", 2L, true)))
  }

  test("appendToBranch extends the branch head by reference; publish is one pointer write") {
    val root = tmp("graft_wap")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").repartition(2), root)
    Warehouse.createBranch(spark, root, "nightly")
    // two staged append batches — each writes ONLY its own files
    val v2 = Warehouse.appendToBranch(
      spark.range(1000, 1010).toDF("id"), root, "nightly", 1L)
    val v3 = Warehouse.appendToBranch(
      spark.range(2000, 2010).toDF("id"), root, "nightly", v2)
    assert((v2, v3) === ((2L, 3L)))
    // zero-rewrite: the branch head's read spans v=1 carried files
    val files = Warehouse.readSnapshotBranch(spark, root, "nightly").inputFiles
    assert(files.exists(_.contains("/v=1/")) && files.exists(_.contains("/v=3/")))
    // empty batch: branch unchanged, no empty version
    assert(Warehouse.appendToBranch(
      spark.range(0, 0).toDF("id"), root, "nightly", v3) === v3)
    assert(Warehouse.snapshots(spark, root) === Seq(1L, 2L, 3L))
    // AUDIT on the branch, main untouched...
    assert(Warehouse.readSnapshotBranch(spark, root, "nightly").count() === 120)
    assert(Warehouse.readSnapshot(spark, root).count() === 100)
    // ...then PUBLISH: one pointer write makes it the table
    assert(Warehouse.publishBranch(spark, root, "nightly") === 3L)
    assert(Warehouse.readSnapshot(spark, root).count() === 120)
    // the branch survives publish for further staging; drop removes it
    assert(Warehouse.branchHead(spark, root, "nightly") === 3L)
    assert(Warehouse.dropBranch(spark, root, "nightly"))
    intercept[RuntimeException] { Warehouse.branchHead(spark, root, "nightly") }
  }

  test("publishBranch refuses when main advanced past the branch point") {
    val root = tmp("graft_branch_stale")
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id"), root)
    Warehouse.createBranch(spark, root, "b")
    Warehouse.commitToBranch(spark.range(0, 20).toDF("id"), root, "b", 1L)
    // a direct main write lands AFTER the branch's version
    Warehouse.commitSnapshot(spark.range(0, 30).toDF("id"), root,
      expectedVersion = Warehouse.currentSnapshot(spark, root))
    val e = intercept[IllegalArgumentException] {
      Warehouse.publishBranch(spark, root, "b")
    }
    assert(e.getMessage.contains("un-publish main's commit"),
      s"lineage refusal expected, got: ${e.getMessage}")
    // main's write was never un-published
    assert(Warehouse.readSnapshot(spark, root).count() === 30)
  }

  test("expireSnapshots keeps branch heads alive until the branch is dropped") {
    val root = tmp("graft_branch_expiry")
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id"), root)
    Warehouse.createBranch(spark, root, "wip")
    Warehouse.appendToBranch(spark.range(100, 110).toDF("id"), root, "wip", 1L) // v2 head
    // main moves on: two more published versions
    Warehouse.commitSnapshot(spark.range(0, 40).toDF("id"), root, 2L)  // v3
    Warehouse.commitSnapshot(spark.range(0, 50).toDF("id"), root, 3L)  // v4
    val dropped = Warehouse.expireSnapshots(spark, root, keepLast = 1)
    // v2 (branch head) survives outside the keepLast window; its
    // manifest reference keeps v=1's files alive too (file sharing)
    assert(!dropped.contains(2L))
    assert(Warehouse.readSnapshotBranch(spark, root, "wip").count() === 20)
    assert(Warehouse.readSnapshot(spark, root).count() === 50)
    // drop the branch → the head loses its root and ages out
    Warehouse.dropBranch(spark, root, "wip")
    val dropped2 = Warehouse.expireSnapshots(spark, root, keepLast = 1)
    assert(dropped2.contains(2L))
    assert(Warehouse.snapshots(spark, root) === Seq(4L))
    assert(Warehouse.readSnapshot(spark, root).count() === 50)
  }
}
