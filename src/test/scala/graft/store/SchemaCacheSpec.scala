package graft.store

import graft.SparkSpec

/** The layout-aware scan fan-out contract (SchemaCache.readWide):
  * a layout that cannot feed the cluster (row groups < cores) fans
  * out to cluster parallelism; a layout that can is read untouched —
  * the guard is what makes the fan-out free at scale.
  */
class SchemaCacheSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def fanned(df: org.apache.spark.sql.DataFrame): Boolean =
    plan(df).contains(
      s"RoundRobinPartitioning(${spark.sparkContext.defaultParallelism})")

  test("readWide fans a single-row-group file out to cluster parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("sc_narrow").toString
    val p = s"$dir/t.parquet"
    (1 to 1000).toDF("id").coalesce(1).write.mode("overwrite").parquet(p)
    assert(fanned(SchemaCache.readWide(spark, p)),
      "starved layout must fan out to defaultParallelism")
    // the plain read stays untouched either way
    assert(!plan(SchemaCache.read(spark, p)).contains("RoundRobinPartitioning"))
  }

  test("readWide is a no-op when the layout already feeds the cluster") {
    val dir = java.nio.file.Files.createTempDirectory("sc_wide").toString
    val p = s"$dir/t.parquet"
    // >= defaultParallelism files, each >= 1 row group
    (1 to 1000).toDF("id").repartition(8)
      .write.option("maxRecordsPerFile", "50").mode("overwrite").parquet(p)
    assert(!plan(SchemaCache.readWide(spark, p)).contains("RoundRobinPartitioning"),
      "well-laid-out table must not pay an exchange")
  }

  test("invalidate clears the cached layout as well as the schema") {
    val dir = java.nio.file.Files.createTempDirectory("sc_inval").toString
    val p = s"$dir/t.parquet"
    (1 to 100).toDF("id").coalesce(1).write.mode("overwrite").parquet(p)
    assert(fanned(SchemaCache.readWide(spark, p)))
    // rewrite to a wide layout; a stale row-group count would keep fanning
    (1 to 1000).toDF("id").repartition(8)
      .write.option("maxRecordsPerFile", "50").mode("overwrite").parquet(p)
    SchemaCache.invalidate(p)
    assert(!plan(SchemaCache.readWide(spark, p)).contains("RoundRobinPartitioning"))
  }
}
