package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X175 appendSnapshot schema evolution — additive column evolution
  * on the snapshot warehouse: the committed schema grows the batch's
  * new columns, carried files read them as null, pinned old versions
  * keep their narrower schema.
  */
class SchemaEvolveSpec extends SparkSpec {
  import spark.implicits._

  test("append with a new column evolves the schema; old rows read null; history pinned") {
    val root = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    Warehouse.writeSnapshot(
      spark.range(0, 100).toDF("id").withColumn("v", col("id") * 2), root)
    val batch = Seq((1000L, 0L, "a"), (1001L, 2L, "b")).toDF("id", "v", "q")
    val v2 = Warehouse.appendSnapshot(batch, root, 1L, evolveSchema = true)
    assert(v2 === 2L)
    val latest = Warehouse.readSnapshot(spark, root)
    assert(latest.columns.toSeq === Seq("id", "v", "q"))
    assert(latest.count() === 102)
    // carried v=1 files read the new column as null
    assert(latest.filter(col("id") < 100 && col("q").isNull).count() === 100)
    assert(latest.filter(col("id") === 1000L).select("q").as[String].head() === "a")
    // pinned read of v=1 keeps the pre-evolution schema
    assert(Warehouse.readSnapshot(spark, root, Some(1L)).columns.toSeq === Seq("id", "v"))
    // a later exact-schema append must now match the EVOLVED schema
    intercept[IllegalArgumentException] {
      Warehouse.appendSnapshot(Seq((5L, 5L)).toDF("id", "v"), root, 2L)
    }
    // ... but an evolving append missing a committed column null-fills it
    val v3 = Warehouse.appendSnapshot(
      Seq((2000L, "c")).toDF("id", "q"), root, 2L, evolveSchema = true)
    assert(v3 === 3L)
    val r = Warehouse.readSnapshot(spark, root).filter(col("id") === 2000L)
    assert(r.select("q").as[String].head() === "c")
    assert(r.select("v").isEmpty === false && r.filter(col("v").isNull).count() === 1)
  }

  test("shared-column type drift is refused even under evolveSchema") {
    val root = java.nio.file.Files.createTempDirectory("graft_evolve_t").toString + "/t"
    Warehouse.writeSnapshot(spark.range(0, 10).toDF("id").withColumn("v", col("id")), root)
    intercept[IllegalArgumentException] {
      Warehouse.appendSnapshot(
        Seq((1L, "x")).toDF("id", "v"), root, 1L, evolveSchema = true)
    }
    assert(Warehouse.currentSnapshot(spark, root) === 1L)
  }

  test("stats pruning still prunes on pre-evolution columns after an evolving append") {
    val root = java.nio.file.Files.createTempDirectory("graft_evolve_p").toString + "/t"
    Warehouse.writeSnapshot(
      spark.range(0, 1000).toDF("id").repartitionByRange(4, col("id")), root)
    Warehouse.appendSnapshot(
      Seq((5000L, "z")).toDF("id", "q"), root, 1L, evolveSchema = true)
    val pruned = Warehouse.readSnapshotRange(spark, root, "id", Some(0L), Some(10L))
    assert(pruned.inputFiles.length < 5, "manifest stats must still prune carried files")
    assert(pruned.count() === 11)
  }
}
