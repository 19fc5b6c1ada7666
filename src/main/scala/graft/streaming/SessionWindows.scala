package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming gap-based sessionization via the DECLARATIVE API:
  * `session_window(ts, gap)` windowed aggregation. Sibling of
  * [[StreamingSessions]] (the `flatMapGroupsWithState` form): the
  * built-in session window handles state/merge/eviction itself and
  * stays whole-stage-plannable, while the FMGWS form owns arbitrary
  * per-session state (ids, custom payloads). Prefer this one unless
  * the session record needs state the windowed agg can't express.
  * The state store keeps one in-flight session per (user, open
  * window); windows MERGE as late events bridge gaps, and the
  * watermark finalizes and evicts sessions whose close time falls
  * behind it — bounded state at any corpus size, keyed and shuffled
  * once on user_id.
  *
  * Boundary semantics: a session window spans `[first_ts, last_ts +
  * gap)`, so an event exactly `gap` after the previous one does NOT
  * merge — the break condition is `delta >= gap`, one tick STRICTER
  * than the batch sessionizer's `delta > gap` (dag-free choice there,
  * SQL-window heritage). The two agree except for events landing
  * exactly on the gap boundary; the oracle for each query pins its own
  * semantics.
  */
object SessionWindows {

  private def eventsRawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Bounded replay of the events file into finalized sessions:
    * (user_id, session_start, last_ts, n_events). Complete output mode
    * holds every session in the memory sink; production uses update
    * mode + foreachBatch keyed upsert on (user_id, session_start) like
    * StreamingOhlc.runIncremental.
    */
  def run(spark: SparkSession, eventsPath: String, queryName: String,
          gap: String = "30 minutes", statePartitions: Int = 8): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.streaming.schemaInference", "false")
    val src = new java.io.File(eventsPath)
    val streamDir =
      if (src.isFile) {
        val d = java.nio.file.Files.createTempDirectory(s"graft_stream_$queryName")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getName), src.toPath)
        d.toString
      } else eventsPath
    val tsType = graft.Tables.rawTsType(s, eventsPath)
    val q = s.readStream
      .schema(eventsRawSchema(tsType))
      .parquet(streamDir)
      .select(graft.Tables.tsToTimestamp(s, tsType).as("ts"), col("user_id"))
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("last_ts"), col("n_events"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    s.table(queryName)
  }
}
