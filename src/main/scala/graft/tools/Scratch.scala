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

    for (rep <- 1 to 3) {
      // batch equivalent of the stream aggregation, for the floor
      time("batch_ohlc_equiv") {
        noop(Tables.events(spark, dir)
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type").as("asset"))
          .agg(min_by(col("value"), col("ts")).as("open"), max(col("value")).as("high"),
            min(col("value")).as("low"), max_by(col("value"), col("ts")).as("close")))
      }
      // streaming agg only, counting micro-batches, no warehouse
      time("stream_agg_noop_sink") {
        val batches = new java.util.concurrent.atomic.AtomicInteger(0)
        val q = graft.streaming.StreamingOhlc.debugStream(spark, s"$dir/events.parquet", s"dbg_$rep")
          .writeStream.outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            batches.incrementAndGet(); b.write.mode("overwrite").format("noop").save(); ()
          }.start()
        q.processAllAvailable(); q.stop()
        println(s"[scratch]   micro-batches: ${batches.get()}")
      }
      time("q_stream_ohlc")(noop(SparkEntry.queries("q_stream_ohlc")(spark, dir)))
      for (sp <- Seq(1, 2, 4, 8)) time(s"runIncremental(statePartitions=$sp)") {
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft_sp${sp}_${System.nanoTime()}"
        noop(graft.streaming.StreamingOhlc.runIncremental(
          spark, s"$dir/events.parquet", wh, s"sp${sp}_$rep", statePartitions = sp))
      }
    }
    spark.stop()
  }
}
