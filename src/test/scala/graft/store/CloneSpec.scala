package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X181 cloneSnapshot — zero-copy shallow clone: the clone's v=1
  * manifest references the source's bytes in place; writes diverge
  * into the clone's own root; compactSnapshot materializes.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("clone reads the source zero-copy; writes diverge; compact materializes") {
    val dir = tmp("graft_clone")
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    Warehouse.writeSnapshot(
      spark.range(0, 1000).toDF("id").withColumn("v", col("id") * 2)
        .repartitionByRange(3, col("id")), src)
    Warehouse.appendSnapshot(Seq((5000L, 1L)).toDF("id", "v"), src, 1L)
    assert(Warehouse.cloneSnapshot(spark, src, dst) === 1L)
    // zero-copy: every clone input file lives under the SOURCE root
    val cloned = Warehouse.readSnapshot(spark, dst)
    assert(cloned.count() === 1001)
    assert(cloned.inputFiles.forall(_.contains("/src/")), "clone must reference source bytes")
    assert(cloned.exceptAll(Warehouse.readSnapshot(spark, src)).isEmpty)
    // row count / stats pruning ride the copied accounting (zero I/O)
    assert(Warehouse.snapshotRowCount(spark, dst) === Some(1001L))
    assert(Warehouse.readSnapshotRange(spark, dst, "id", Some(0L), Some(10L))
      .inputFiles.length < 4)
    // writes diverge: delete on the clone never touches the source
    Warehouse.deleteWhere(spark, dst, col("id") < 100)
    assert(Warehouse.readSnapshot(spark, dst).count() === 901)
    assert(Warehouse.readSnapshot(spark, src).count() === 1001)
    // appends land in the clone's root; untouched source bytes still referenced
    Warehouse.appendSnapshot(Seq((9000L, 9L)).toDF("id", "v"), dst, 2L)
    val files = Warehouse.readSnapshot(spark, dst).inputFiles
    assert(files.exists(_.contains("/src/")) && files.exists(_.contains("/dst/")))
    // materialize: one compact severs every source reference
    Warehouse.compactSnapshot(spark, dst)
    assert(Warehouse.readSnapshot(spark, dst).inputFiles.forall(_.contains("/dst/")))
    assert(Warehouse.readSnapshot(spark, dst).count() === 902)
    // a second clone into the same destination refuses
    intercept[IllegalArgumentException] {
      Warehouse.cloneSnapshot(spark, src, dst)
    }
  }

  test("time-travel clone pins a historical version; sink epochs do not transfer") {
    val dir = tmp("graft_clone_tt")
    val src = s"$dir/src"
    Warehouse.commitStreamBatch(spark.range(0, 50).toDF("id"), src, "app-a", 0L)
    Warehouse.commitStreamBatch(spark.range(50, 80).toDF("id"), src, "app-a", 1L)
    val dst = s"$dir/dst"
    Warehouse.cloneSnapshot(spark, src, dst, version = Some(1L))
    assert(Warehouse.readSnapshot(spark, dst).count() === 50)
    // the clone is a different table: no inherited stream idempotence
    assert(Warehouse.lastCommittedEpoch(spark, dst, "app-a") === None)
    Warehouse.commitStreamBatch(spark.range(1000, 1010).toDF("id"), dst, "app-a", 0L)
    assert(Warehouse.readSnapshot(spark, dst).count() === 60)
    assert(Warehouse.readSnapshot(spark, src).count() === 80)
  }
}
