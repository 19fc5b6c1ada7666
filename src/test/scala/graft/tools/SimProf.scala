package graft.tools

import graft.Tables
import graft.ext.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc timing of the simhash group-pairs rework. */
object SimProf {
  def time(label: String)(f: => Unit): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    f
    println(f"[sprof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  def noop(df: DataFrame): Unit = df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, dir)
    (1 to 3).foreach { i =>
      time(s"simhashNearDups pass $i") { noop(Dedup.simhashNearDups(docs)) }
    }
    println("[sprof] pairs: " + Dedup.simhashNearDups(docs).count())
    spark.stop()
  }
}
