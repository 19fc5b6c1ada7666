package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X173 mergeIntoSnapshot — file-grain MERGE over the snapshot
  * warehouse: only files containing source keys are rewritten,
  * inserts land as new files in the same commit, untouched files are
  * carried by reference.
  */
class MergeSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def manifestEntries(root: String, v: Long): Seq[String] = {
    val p = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(s"$root/_manifest-v$v"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toString)), "UTF-8"))
    (0 until node.get("files").size()).map(node.get("files").get(_).asText())
  }

  test("merge rewrites only files containing source keys; inserts land in the same commit") {
    val root = tmp("graft_msnap")
    // 3 range files: ids 0-99 / 100-199 / 200-299
    Warehouse.writeSnapshot(
      spark.range(0, 300).toDF("id").withColumn("v", col("id") * 10)
        .repartitionByRange(3, col("id")), root)
    // source hits file 1 only (ids 5, 7) + one insert (id 1000)
    val source = Seq((5L, -1L), (7L, -2L), (1000L, -3L)).toDF("id", "v")
    val next = Warehouse.mergeIntoSnapshot(spark, root, source, Seq("id"), Seq(
      Warehouse.DeleteWhen(col("s.id") === 7),
      Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v"))),
      Warehouse.InsertWhen(lit(true))))
    assert(next === 2L)
    val latest = Warehouse.readSnapshot(spark, root)
    assert(latest.count() === 300) // 300 - 1 delete + 1 insert
    assert(latest.filter(col("id") === 5).select("v").as[Long].head() === -1L)
    assert(latest.filter(col("id") === 7).isEmpty)
    assert(latest.filter(col("id") === 1000).select("v").as[Long].head() === -3L)
    // untouched rows pass through
    assert(latest.filter(col("id") === 150).select("v").as[Long].head() === 1500L)
    // two of v1's three files carried by reference
    val carried = manifestEntries(root, 2L).filter(_.startsWith("v=1/"))
    assert(carried.size === 2, s"expected 2 carried references, got $carried")
    // pinned history intact
    assert(Warehouse.readSnapshot(spark, root, Some(1L)).count() === 300)
  }

  test("insert-only merge (all keys miss) commits inserts and carries every old file") {
    val root = tmp("graft_msnap_ins")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("v", col("id"))
        .repartitionByRange(2, col("id")), root)
    val source = Seq((500L, 500L), (501L, 501L)).toDF("id", "v")
    val next = Warehouse.mergeIntoSnapshot(spark, root, source, Seq("id"), Seq(
      Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v"))),
      Warehouse.InsertWhen(lit(true))))
    assert(next === 2L)
    val latest = Warehouse.readSnapshot(spark, root)
    assert(latest.count() === 102)
    assert(manifestEntries(root, 2L).count(_.startsWith("v=1/")) === 2)
    // no matching keys and insert clause misses everything: no-op
    val noIns = Seq((600L, 0L)).toDF("id", "v")
    assert(Warehouse.mergeIntoSnapshot(spark, root, noIns, Seq("id"), Seq(
      Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v"))),
      Warehouse.InsertWhen(col("s.id") < 0))) === 2L)
    // update/delete-only merge whose keys all miss: no-op, no commit
    assert(Warehouse.mergeIntoSnapshot(spark, root, noIns, Seq("id"), Seq(
      Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v"))))) === 2L)
  }

  test("changeFeed records the merge as insert/update/delete; feed-apply law holds") {
    val root = tmp("graft_msnap_cdf")
    Warehouse.writeSnapshot(
      spark.range(0, 60).toDF("id").withColumn("v", col("id"))
        .repartitionByRange(2, col("id")), root)
    val source = Seq((3L, -3L), (40L, -40L), (900L, -900L)).toDF("id", "v")
    val next = Warehouse.mergeIntoSnapshot(spark, root, source, Seq("id"), Seq(
      Warehouse.DeleteWhen(col("s.id") === 40),
      Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v"))),
      Warehouse.InsertWhen(lit(true))), changeFeed = true)
    val feed = Warehouse.readChangeFeed(spark, root, next, next)
    val byType = feed.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType === Map("insert" -> 1L, "update" -> 1L,
      "update_preimage" -> 1L, "delete" -> 1L))
    assert(feed.filter(col("_change_type") === "update")
      .select("v").as[Long].head() === -3L)
    // apply(read(n-1), feed(n)) ≡ read(n)
    val replayed = Warehouse.applyChangeFeed(
      Warehouse.readSnapshot(spark, root, Some(next - 1)),
      feed.drop("_commit_version"), Seq("id"))
    assert(replayed.exceptAll(Warehouse.readSnapshot(spark, root)).isEmpty)
    assert(Warehouse.readSnapshot(spark, root).exceptAll(replayed).isEmpty)
  }

  test("q_merge_snapshot emits exactly q_merge's rows (shared oracle)") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.SparkEntry.queries("q_merge")(spark, dir)
    val snap = graft.SparkEntry.queries("q_merge_snapshot")(spark, dir)
    assert(snap.count() === plain.count())
    assert(snap.exceptAll(plain).isEmpty && plain.exceptAll(snap).isEmpty)
  }

  test("duplicate source keys are rejected before any write") {
    val root = tmp("graft_msnap_dup")
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id").withColumn("v", col("id")), root)
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Warehouse.mergeIntoSnapshot(spark, root, dup, Seq("id"), Seq(
        Warehouse.UpdateWhen(lit(true), Map("v" -> col("s.v")))))
    }
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
  }
}
