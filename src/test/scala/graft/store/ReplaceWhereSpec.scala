package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X204 replaceWhere — predicate-scoped overwrite in one commit:
  * matching rows out, batch in, untouched files carried.
  */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def entriesOf(root: String, v: Long): Seq[String] = {
    val p = org.apache.hadoop.fs.Path.getPathWithoutSchemeAndAuthority(
      new org.apache.hadoop.fs.Path(s"$root/_manifest-v$v"))
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p.toString)), "UTF-8"))
    (0 until node.get("files").size()).map(node.get("files").get(_).asText())
  }

  test("law: end state = (old where !pred) ∪ batch; non-slice files carried") {
    val root = tmpRoot("graft_rw1")
    Warehouse.writeSnapshot(
      spark.range(0, 400).toDF("id").withColumn("bucket", col("id") % 4)
        .withColumn("v", col("id"))
        .repartitionByRange(4, col("bucket")), root)
    val before = entriesOf(root, 1L).map(e => s"v=1/$e")
    val batch = Seq((9000L, 2L, -1L), (9001L, 2L, -2L)).toDF("id", "bucket", "v")
    val v2 = Warehouse.replaceWhere(spark, root, col("bucket") === 2L, batch,
      scanBound = Some(("bucket", Some(2L), Some(2L))))
    assert(v2 === 2L)
    val got = Warehouse.readSnapshot(spark, root)
    assert(got.where(col("bucket") === 2L).count() === 2, "slice fully replaced")
    assert(got.count() === 300 + 2)
    // files of other buckets carried by reference
    val after = entriesOf(root, 2L).toSet
    assert(before.count(after) >= 3, s"untouched bucket files must carry: $after")
  }

  test("reload idempotence: re-running the same replaceWhere converges") {
    val root = tmpRoot("graft_rw2")
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("day", col("id") % 5)
        .withColumn("v", col("id")), root)
    val batch = Seq((500L, 3L, 1L), (501L, 3L, 2L)).toDF("id", "day", "v")
    Warehouse.replaceWhere(spark, root, col("day") === 3L, batch)
    val first = Warehouse.readSnapshot(spark, root).orderBy("id").collect().toSeq
    Warehouse.replaceWhere(spark, root, col("day") === 3L, batch)
    val second = Warehouse.readSnapshot(spark, root).orderBy("id").collect().toSeq
    assert(first === second, "the reload must converge, not duplicate")
  }

  test("batch row outside the predicate aborts before any commit") {
    val root = tmpRoot("graft_rw3")
    Warehouse.writeSnapshot(
      spark.range(0, 50).toDF("id").withColumn("day", col("id") % 5)
        .withColumn("v", col("id")), root)
    val vBefore = Warehouse.currentSnapshot(spark, root)
    intercept[Exception] {
      Warehouse.replaceWhere(spark, root, col("day") === 3L,
        Seq((500L, 4L, 1L)).toDF("id", "day", "v")) // day=4 outside slice
    }
    assert(Warehouse.currentSnapshot(spark, root) === vBefore)
  }

  test("no-match predicate still lands the batch (reload of an empty slice)") {
    val root = tmpRoot("graft_rw4")
    Warehouse.writeSnapshot(
      spark.range(0, 20).toDF("id").withColumn("day", lit(1L))
        .withColumn("v", col("id")), root)
    Warehouse.replaceWhere(spark, root, col("day") === 9L,
      Seq((100L, 9L, 0L)).toDF("id", "day", "v"))
    val got = Warehouse.readSnapshot(spark, root)
    assert(got.count() === 21)
    assert(got.where(col("day") === 9L).count() === 1)
  }

  test("composes with deletion vectors and the column map; feed records delete+insert") {
    val root = tmpRoot("graft_rw5")
    Warehouse.writeSnapshot(
      spark.range(0, 60).toDF("id").withColumn("val", col("id") % 3), root)
    Warehouse.renameSnapshotColumn(spark, root, "val", "grp")
    Warehouse.deleteWhereDv(spark, root, col("id") === 0L) // a dv'd row in the slice
    val batch = Seq((700L, 0L)).toDF("id", "grp")
    Warehouse.replaceWhere(spark, root, col("grp") === 0L, batch, changeFeed = true)
    val got = Warehouse.readSnapshot(spark, root)
    assert(got.where(col("grp") === 0L).count() === 1)
    assert(got.count() === 40 + 1, "dv-deleted row neither resurrects nor double-counts")
    val v = Warehouse.currentSnapshot(spark, root)
    val feed = Warehouse.readChangeFeed(spark, root, v, v)
    val byType = feed.groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType === Map("delete" -> 19L, "insert" -> 1L),
      s"19 live slice rows deleted (id=0 was already dv-dead), got $byType")
    // physical layout frozen: files carry 'val', never 'grp'
    val raw = spark.read.parquet(s"$root/v=*/part-*")
    assert(raw.columns.contains("val") && !raw.columns.contains("grp"))
  }

  test("schema drift refused") {
    val root = tmpRoot("graft_rw6")
    Warehouse.writeSnapshot(
      spark.range(0, 10).toDF("id").withColumn("v", col("id")), root)
    intercept[IllegalArgumentException] {
      Warehouse.replaceWhere(spark, root, col("id") < 5L,
        Seq((1L, "x")).toDF("id", "v"))
    }
  }
}
