package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main — not part of the driver contract. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())
    time("ngram broadcast #1")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    time("ngram broadcast #2")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    // shuffle-hash variant via hint
    val ex = docs
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val a = ex.select(col("doc_id").as("a"), col("n").as("na"), col("s"))
    val b = ex.select(col("doc_id").as("b"), col("n").as("nb"), col("s"))
    val shuffled = a.hint("shuffle_hash").join(b.hint("shuffle_hash"), a("s") === b("s") && a("a") < b("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"), first("na").as("na"), first("nb").as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.8)
    time("ngram shufflehash #1")(shuffled.count())
    time("ngram shufflehash #2")(shuffled.count())
    val plan = shuffled.queryExecution.executedPlan.toString
    println("[scratch] ReusedExchange present: " + plan.contains("ReusedExchange"))
    spark.stop()
  }
}
