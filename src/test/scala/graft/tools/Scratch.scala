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

    // A/B: q_json_struct component costs — map parse vs struct parse vs
    // variant for props; roundtrip cost in isolation
    import org.apache.spark.sql.types._
    val e = Tables.events(spark, dir)
    def roundtrip = from_json(
      to_json(struct(
        struct(col("user_id").as("uid"), col("event_type").as("et")).as("who"),
        col("value").as("v"))),
      StructType.fromDDL("who STRUCT<uid: BIGINT, et: STRING>, v DOUBLE"))
    def mapParse(): DataFrame =
      e.select(col("event_id"), from_json(col("props"), MapType(StringType, StringType)).as("__p"))
        .select(col("event_id"), element_at(col("__p"), "k").cast("long").as("k"))
    def structParse(): DataFrame =
      e.select(col("event_id"), from_json(col("props"), StructType.fromDDL("k STRING")).as("__p"))
        .select(col("event_id"), col("__p.k").cast("long").as("k"))
    def variantParse(): DataFrame =
      e.select(col("event_id"), parse_json(col("props")).as("__p"))
        .select(col("event_id"),
          try_variant_get(col("__p"), "$.k", "long").as("k"))
    def getJson(): DataFrame =
      e.select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
    def roundtripOnly(): DataFrame =
      e.select(col("event_id"), roundtrip.as("__n"))
        .select(col("event_id"), col("__n.who.uid").as("uid"), col("__n.who.et").as("et"), col("__n.v").as("v"))
    def current(): DataFrame = SparkEntry.queries("q_json_struct")(spark, dir)
    for (rep <- 1 to 3) {
      time(s"current#$rep")(noop(current()))
      time(s"map_parse#$rep")(noop(mapParse()))
      time(s"struct_parse#$rep")(noop(structParse()))
      time(s"variant#$rep")(noop(variantParse()))
      time(s"get_json#$rep")(noop(getJson()))
      time(s"roundtrip#$rep")(noop(roundtripOnly()))
    }
    spark.stop()
  }
}
