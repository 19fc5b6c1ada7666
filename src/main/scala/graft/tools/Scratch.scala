package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main — not part of the driver contract. */
object Scratch {
  def time(label: String)(f: => Unit): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    f
    println(f"[scratch] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()

    for (rep <- 1 to 4) {
      for (q <- Seq("q_rollup", "q_join_big", "q_join_bcast", "q_dedup_ngram",
                    "q_dedup_keep", "q_json_struct", "q_stream_ohlc")) {
        time(q)(noop(SparkEntry.queries(q)(spark, dir)))
      }
    }
    spark.stop()
  }
}
