package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 ad-hoc profiling main — not part of the driver contract. */
object Prof6 {
  def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()
  def time(label: String)(f: => Unit): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    f
    println(f"[prof6] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    val prices = Tables.prices(spark, dir)
    val window = 30
    val w = Window.partitionBy("asset").orderBy("ts_utc").rowsBetween(-(window - 1), 0)

    def viaPercentile = prices.select(col("ts_utc"), col("asset"),
      when(count(col("price")).over(w) >= window,
        round(expr("percentile(price, 0.5)").over(w), 6)).as("med30"))

    def viaSortArray = {
      val arr = sort_array(collect_list(col("price")).over(w))
      val c = size(arr)
      val med = (element_at(arr, (c + 1) / 2) + element_at(arr, c / 2 + 1)) / 2.0
      prices.select(col("ts_utc"), col("asset"),
        when(count(col("price")).over(w) >= window, round(med, 6)).as("med30"))
    }

    for (p <- 1 to 2) {
      time(s"p$p percentile window")(noop(viaPercentile))
      time(s"p$p sort_array window")(noop(viaSortArray))
    }
    // equality check
    val a = viaPercentile.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    val b = viaSortArray.collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    println("[prof6] identical=" + (a == b) + " n=" + a.size)
    spark.stop()
  }
}
