package graft.tools

import graft.Tables
import graft.ext.Similarity
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
    val e = Tables.embeddings(spark, dir)
    time("warmup count")(e.count())
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    time("lsh full #1")(Similarity.lshTopK(q, c, 10).count())
    time("lsh full #2")(Similarity.lshTopK(q, c, 10).count())
    time("brute topk")(Similarity.bruteForceTopK(q, c, 10).count())
    spark.stop()
  }
}
