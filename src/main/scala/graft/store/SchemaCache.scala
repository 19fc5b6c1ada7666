package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Per-path parquet schema cache — the metastore role for path-based
  * reads. A bare `spark.read.parquet(path)` re-lists the directory and
  * re-reads footers for schema inference on EVERY call (~80 ms
  * measured at sf0.1, vs ~13 ms with a declared schema); repeated
  * readers (per-query table loads, per-micro-batch warehouse merges)
  * pay that once here.
  *
  * Invalidation contract: appends and partition overwrites keep a
  * table's schema, so writers only need [[invalidate]] after a
  * schema-CHANGING rewrite — Warehouse's full-rewrite paths call it
  * unconditionally (cheap, and a rewrite is the only moment a schema
  * can legally change).
  */
object SchemaCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  /** Read `path` with the cached schema, inferring and caching on
    * first sight.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = cache.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def invalidate(path: String): Unit = cache.remove(path)

  def clear(): Unit = cache.clear()
}
