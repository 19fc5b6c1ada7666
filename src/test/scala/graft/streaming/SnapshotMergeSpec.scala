package graft.streaming

import graft.SparkSpec
import graft.store.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches upsert into versioned snapshots; replays are no-ops") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_smerge").toString + "/t"
    val input = MemoryStream[(Int, Double)]
    val q = input.toDF().toDF("k", "v").writeStream
      .foreachBatch(SnapshotMerge.upsertBatch(root, Seq("k")) _)
      .start()
    try {
      input.addData((1, 10.0), (2, 20.0), (2, 20.0)) // in-batch full-row dup folds
      q.processAllAvailable()
      assert(Warehouse.readSnapshot(spark, root).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap === Map(1 -> 10.0, 2 -> 20.0))
      input.addData((2, 99.0), (3, 30.0)) // update + insert
      q.processAllAvailable()
      input.addData((2, 99.0), (3, 30.0)) // replayed delivery: same state
      q.processAllAvailable()
      val fin = Warehouse.readSnapshot(spark, root).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(fin === Map(1 -> 10.0, 2 -> 99.0, 3 -> 30.0))
      // each micro-batch is one immutable version; time travel works back
      assert(Warehouse.snapshots(spark, root).size === 3)
      assert(Warehouse.readSnapshot(spark, root, Some(1L)).count() === 2)
    } finally q.stop()
  }
}
