package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling of the group-pairs ngram dedup stages. */
object DedupProf {
  def time(label: String)(f: => Unit): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    f
    println(f"[dprof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir)
    println(s"[dprof] docs rows: ${docs.count()}")
    val stats = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("distinct_shingles"), sum("df").as("index_rows"),
        sum(col("df") * (col("df") - 1) / 2).as("pairs")).head()
    println(s"[dprof] distinct_shingles=${stats.getLong(0)} index_rows=${stats.getLong(1)} pairs=${stats.getDouble(2)}")

    def stages(tag: String): Unit = {
      time(s"$tag/postings")(noop(docs
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).cast("long").as("n"), explode(col("sh")).as("s"))
        .groupBy("s").agg(collect_list(struct(col("doc_id"), col("n"))).as("ids"))))
      time(s"$tag/full")(noop(Dedup.ngramJaccardPairs(docs, 3, 0.8, Some(100))))
    }

    stages("warmup")
    stages("base")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    stages("bigFallback")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    stages("noCoalesceTuning")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
    stages("both")
    spark.stop()
  }
}
