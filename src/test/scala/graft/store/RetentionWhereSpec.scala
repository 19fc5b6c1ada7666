package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X182 readSnapshotWhere (multi-column stats pruning) and X183
  * expireSnapshotsOlderThan (age-based retention).
  */
class RetentionWhereSpec extends SparkSpec {
  import spark.implicits._

  test("2-D box read on a zordered table prunes by the intersection of both ranges") {
    val root = java.nio.file.Files.createTempDirectory("graft_where").toString + "/t"
    val df = spark.range(0, 40000).toDF("i")
      .select((col("i") % 200).as("x"), (col("i") / 200).as("y"),
        col("i").as("payload"))
    Warehouse.writeSnapshot(graft.ops.Layout.zorder(df, Seq("x", "y"), 16), root)
    val full = Warehouse.readSnapshot(spark, root)
    val box = Warehouse.readSnapshotWhere(spark, root,
      Seq(("x", Some(10L), Some(20L)), ("y", Some(10L), Some(20L))))
    // identical-results law vs the unpruned filtered read
    val expected = full.filter(col("x").between(10, 20) && col("y").between(10, 20))
    assert(box.count() === expected.count())
    assert(box.exceptAll(expected).isEmpty && expected.exceptAll(box).isEmpty)
    // the intersection prunes strictly harder than either single range
    val nx = Warehouse.readSnapshotRange(spark, root, "x", Some(10L), Some(20L))
      .inputFiles.length
    val ny = Warehouse.readSnapshotRange(spark, root, "y", Some(10L), Some(20L))
      .inputFiles.length
    assert(box.inputFiles.length <= math.min(nx, ny))
    assert(box.inputFiles.length < 16, "2-D box must skip most of a 16-file zorder layout")
    // unknown column refuses loudly
    intercept[IllegalArgumentException] {
      Warehouse.readSnapshotWhere(spark, root, Seq(("nope", Some(1L), None)))
    }
  }

  test("age-based expiry keeps the young suffix and the keepLast floor") {
    val root = java.nio.file.Files.createTempDirectory("graft_age").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id"), root)
    (1L to 3L).foreach(i =>
      Warehouse.appendSnapshot(Seq(100L + i).toDF("id"), root, i))
    assert(Warehouse.snapshots(spark, root) === Seq(1L, 2L, 3L, 4L))
    // everything is younger than a day: nothing expires
    assert(Warehouse.expireSnapshotsOlderThan(spark, root, 86400000L) === Seq.empty)
    // cutoff now: only the keepLast floor survives
    val dropped = Warehouse.expireSnapshotsOlderThan(spark, root, 0L, keepLast = 2)
    assert(dropped === Seq(1L, 2L))
    assert(Warehouse.snapshots(spark, root) === Seq(3L, 4L))
    // carried references survive the sweep: full content still readable
    assert(Warehouse.readSnapshot(spark, root).count() === 13)
  }

  test("age-based expiry survives out-of-order commit instants (review r12)") {
    val root = java.nio.file.Files.createTempDirectory("graft_age2").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id"), root)
    (1L to 3L).foreach(i =>
      Warehouse.appendSnapshot(Seq(100L + i).toDF("id"), root, i))   // v1..v4
    // backdate v1 AND v3: a slow commit can claim version N yet stamp
    // its manifest after N+1 published, so instants are NOT monotone
    // in version order — the old suffix-takeWhile stopped at v3 and
    // would expire the younger-than-cutoff v2 beneath it
    def backdate(v: Long): Unit = {
      // through the Hadoop FS (the local FS is checksummed — a raw
      // java.nio rewrite leaves a stale .crc and the manifest reads
      // as bit rot)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mf = new org.apache.hadoop.fs.Path(s"$root/_manifest-v$v")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val in = fs.open(mf)
      val node = try mapper.readTree(in)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close()
      node.put("committedAtMs", 1000L)
      val out = fs.create(mf, true)
      out.write(mapper.writeValueAsBytes(node)); out.close()
    }
    backdate(1L); backdate(3L)
    val dropped = Warehouse.expireSnapshotsOlderThan(spark, root, 3600000L, keepLast = 1)
    assert(dropped === Seq(1L),
      "retention keeps everything from the OLDEST young version up — " +
        "v3's stale instant must not expire the young v2 beneath it")
    assert(Warehouse.snapshots(spark, root) === Seq(2L, 3L, 4L))
    assert(Warehouse.readSnapshot(spark, root).count() === 13)
  }
}
