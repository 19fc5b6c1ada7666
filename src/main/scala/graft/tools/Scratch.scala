package graft.tools

import graft.{SparkEntry, Tables}
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
    time("warmup")(Tables.events(spark, dir).count())
    val topk = SparkEntry.queries("q_topk_group")(spark, dir)
    time("topk #1")(topk.count())
    time("topk #2")(SparkEntry.queries("q_topk_group")(spark, dir).count())
    println("=== topk plan ===")
    topk.explain("formatted")
    println("=== q_project plan (pushdown check) ===")
    SparkEntry.queries("q_project")(spark, dir).explain("formatted")
    println("=== q_join_big plan ===")
    SparkEntry.queries("q_join_big")(spark, dir).explain("formatted")
    println("=== q_dedup_ngram plan (exchange reuse check) ===")
    SparkEntry.queries("q_dedup_ngram")(spark, dir).explain("formatted")
    spark.stop()
  }
}
