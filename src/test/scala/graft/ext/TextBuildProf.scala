package graft.ext

import graft.Tables
import graft.store.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization round: phase timing for buildTextIndex + the
  * indexed BM25 probe — scalars pass vs meta commit vs postings
  * layout+write vs probe, so the indexed-retrieval keys' build cost
  * decomposes into its real phases.
  */
object TextBuildProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[textprof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (r <- 1 to runs) {
      println(s"--- run $r ---")
      System.gc()
      val docs = Tables.documents(spark, sfDir)
      val root = java.nio.file.Files.createTempDirectory("graft_tbp").toString + "/t"
      // the scalars pass alone (the build's first job)
      time("scalars: narrow doc-grain agg") {
        docs.select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
          .groupBy("doc_id").agg(first(col("dl")).as("dl"))
          .agg(count(lit(1)), count(col("dl")), sum(col("dl"))).head()
      }
      // posting explode alone (noop sink — compute cost, no write)
      time("postings explode -> noop") {
        docs.select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"),
            explode_outer(graft.functions.native.tokenCounts(col("text"))).as("tc"))
          .write.mode("overwrite").format("noop").save()
      }
      time("full buildTextIndex") {
        TextIndex.buildTextIndex(docs, root)
      }
      time("bm25TopKIndexed probe -> noop") {
        TextIndex.bm25TopKIndexed(spark, root, Seq(1 -> Seq("hash", "join"), 2 -> Seq("window", "agg", "scan"), 3 -> Seq("vector", "merge")), 20)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
