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

    // A/B: current thin-pair shape vs verify-in-stage-then-dedup
    val cust = Tables.table(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    def variants(c: org.apache.spark.sql.Column) = array_distinct(concat(array(c),
      when(length(c) > 0, transform(sequence(lit(1), length(c)), i =>
        concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c)))))
        .otherwise(array(c))))
    def verifyFirst(): DataFrame = {
      val v = cust.select(col("id"), col("s"), explode(variants(col("s"))).as("__key"))
      v.select(col("id").as("a"), col("s").as("__sa"), col("__key"))
        .join(v.select(col("id").as("b"), col("s").as("__sb"), col("__key")), Seq("__key"))
        .filter(col("a") < col("b"))
        .withColumn("dist", levenshtein(col("__sa"), col("__sb"), 1).cast("long"))
        .filter(col("dist") >= 0)
        .select("a", "b", "dist").distinct()
    }
    def thinHashed(): DataFrame = {
      val v = cust.select(col("id"),
        explode(transform(variants(col("s")), x => xxhash64(x))).as("__key"))
      val cand = v.select(col("id").as("a"), col("__key"))
        .join(v.select(col("id").as("b"), col("__key")), Seq("__key"))
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      cand.join(cust.select(col("id").as("a"), col("s").as("__sa")), Seq("a"))
        .join(cust.select(col("id").as("b"), col("s").as("__sb")), Seq("b"))
        .withColumn("dist", levenshtein(col("__sa"), col("__sb"), 1).cast("long"))
        .filter(col("dist") >= 0)
        .select("a", "b", "dist")
    }
    for (rep <- 1 to 3) {
      time(s"thin_pairs#$rep")(noop(graft.ops.FuzzyJoin.editDistancePairs(cust, "id", "s", 1)))
      time(s"thin_hashed#$rep")(noop(thinHashed()))
      time(s"verify_first#$rep")(noop(verifyFirst()))
    }
    spark.stop()
  }
}
