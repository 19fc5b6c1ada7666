package graft

import graft.ops.{Indicators, Normalize, Ohlc}
import graft.store.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 appears as a `queries` entry, with
  * matching ANSI SQL in `oracleSql` (DuckDB) over the same parquet
  * tables. Column names/aliases are kept identical on both sides —
  * the driver's compare sorts columns by name before hashing.
  *
  * The `events` table plays the reference's raw_prices fact table
  * (FIXTURES.md §B role mapping): ts→ts_utc, event_type→asset,
  * value→price.
  */
object SparkEntry {

  /** Daily OHLC per asset from the events fact table. */
  private def dailyOhlc(s: SparkSession, dir: String): DataFrame =
    Ohlc.daily(Tables.prices(s, dir))

  /** OHLC + rolling indicators (the reference's daily_metrics). */
  private def enriched(s: SparkSession, dir: String): DataFrame =
    Indicators.enrich(dailyOhlc(s, dir))

  /** Shared oracle CTEs mirroring dailyOhlc/enriched. */
  private val dailyCte =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS date, event_type AS asset,
      |         arg_min(value, ts) AS open, max(value) AS high,
      |         min(value) AS low, arg_max(value, ts) AS close
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  private val enrichedCte = dailyCte +
    """, ret_t AS (
      |  SELECT *, close / lag(close) OVER (PARTITION BY asset ORDER BY date) - 1 AS ret
      |  FROM daily
      |), enriched AS (
      |  SELECT *,
      |    CASE WHEN count(close) OVER w7 >= 7 THEN avg(close) OVER w7 END AS ma7,
      |    CASE WHEN count(close) OVER w30 >= 30 THEN avg(close) OVER w30 END AS ma30,
      |    CASE WHEN count(ret) OVER w30 >= 30 THEN stddev_samp(ret) OVER w30 END AS vol30
      |  FROM ret_t
      |  WINDOW w7 AS (PARTITION BY asset ORDER BY date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |         w30 AS (PARTITION BY asset ORDER BY date ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
      |)""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the reference's full analytical core — daily OHLC + indicators.
    */
  def entry(spark: SparkSession): DataFrame =
    enriched(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4/§2.5 aggregations + windows (A1, W1-W4) ----
    "q_ohlc" -> ((s, dir) => dailyOhlc(s, dir)),
    "q_ret" -> ((s, dir) => enriched(s, dir).select("date", "asset", "close", "ret")),
    "q_ma7" -> ((s, dir) => enriched(s, dir).select("date", "asset", "close", "ma7")),
    "q_ma30" -> ((s, dir) => enriched(s, dir).select("date", "asset", "close", "ma30")),
    "q_vol30" -> ((s, dir) => enriched(s, dir).select("date", "asset", "ret", "vol30")),

    // ---- §2.1 scans (S5, S7) ----
    "q_scan_table" -> ((s, dir) => Tables.lineitem(s, dir)),
    "q_scan_csv" -> ((s, dir) => {
      // CSV round-trip: parquet → ISO-string CSV (S4) → declared-schema
      // scan (S5); oracle reads the parquet directly with the same
      // string formatting.
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_scan_csv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val src = Tables.events(s, dir).select(
        Normalize.tsToIso(col("ts")).as("ts_utc"), col("value").as("price"))
      Warehouse.writeCsv(src, out)
      Warehouse.readCsv(s, out, graft.model.Schemas.rawCsvSchema)
    }),

    // ---- §2.2 projections / filters (P1-P8) ----
    "q_project" -> ((s, dir) => Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice")),
    "q_lit_col" -> ((s, dir) => Tables.events(s, dir)
      .select(col("event_id"), lit("BTC-USD").as("asset"), col("value").as("price"))),
    "q_cast" -> ((s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").cast("string").cast("double").as("n_chars_d"))),
    "q_filter_eq" -> ((s, dir) => Tables.events(s, dir).filter(col("event_type") === "click")),
    "q_filter_between" -> ((s, dir) => Tables.events(s, dir).filter(
      col("ts").between(lit("2024-01-10 00:00:00").cast("timestamp"),
                        lit("2024-01-20 23:59:59").cast("timestamp")))),
    "q_point_lookup" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val k = o.agg(min(col("o_orderkey"))).head().getLong(0)
      o.filter(col("o_orderkey") === k)
    }),
    "q_report_window" -> ((s, dir) => {
      val e = enriched(s, dir)
      val maxDate = e.agg(max(col("date"))).head().getDate(0)
      e.filter(col("asset") === "click")
        .filter(col("date").between(date_sub(lit(maxDate), 14), lit(maxDate)))
        .select("date", "close", "ma7", "ma30")
    }),
    "q_null_check" -> ((s, dir) => enriched(s, dir)
      .filter(col("ma30").isNull).select("date", "asset")),

    // ---- §2.3 dedup / sort (D1, D2) ----
    "q_dedup" -> ((s, dir) => Normalize.dedupKeepFirst(Tables.events(s, dir),
      keys = Seq("user_id", "event_type"), order = Seq("ts", "event_id"))),
    "q_sort" -> ((s, dir) => Tables.events(s, dir)
      .select("event_id", "ts", "value").orderBy("ts", "event_id")),

    // ---- §2.4 counts (A2, A3) ----
    "q_count_day" -> ((s, dir) => Tables.events(s, dir)
      .filter(col("event_type") === "click")
      .groupBy(to_date(col("ts")).as("date")).agg(count(lit(1)).as("n"))),
    "q_count_all" -> ((s, dir) => Tables.events(s, dir).agg(count(lit(1)).as("n"))),

    // ---- §2.1 warehouse sinks (S8, S9) ----
    "q_insert_ignore" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val existing = o.filter(col("o_orderkey") % 3 =!= 0)
      val incoming = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      Warehouse.insertIfAbsent(existing, incoming, Seq("o_orderkey"))
    }),
    "q_upsert" -> ((s, dir) => {
      // existing: enriched metrics for the first 20 days; incoming:
      // re-stated OHLC (×2) for days 15+ — updates OHLC only, keeps ret.
      val e = enriched(s, dir).select("date", "asset", "open", "high", "low", "close", "ret")
      val existing = e.filter(col("date") < lit("2024-01-21").cast("date"))
      val incoming = dailyOhlc(s, dir)
        .filter(col("date") >= lit("2024-01-15").cast("date"))
        .select(col("date"), col("asset"), (col("open") * 2).as("open"),
          (col("high") * 2).as("high"), (col("low") * 2).as("low"), (col("close") * 2).as("close"))
      Warehouse.upsert(existing, incoming, keys = Seq("date", "asset"),
        updateCols = Seq("open", "high", "low", "close"))
    }))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_ohlc" -> s"$dailyCte SELECT * FROM daily",
    "q_ret" -> s"$enrichedCte SELECT date, asset, close, ret FROM enriched",
    "q_ma7" -> s"$enrichedCte SELECT date, asset, close, ma7 FROM enriched",
    "q_ma30" -> s"$enrichedCte SELECT date, asset, close, ma30 FROM enriched",
    "q_vol30" -> s"$enrichedCte SELECT date, asset, ret, vol30 FROM enriched",
    "q_scan_table" -> "SELECT * FROM lineitem",
    "q_scan_csv" ->
      "SELECT strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_utc, value AS price FROM events",
    "q_project" -> "SELECT l_orderkey, l_extendedprice FROM lineitem",
    "q_lit_col" -> "SELECT event_id, 'BTC-USD' AS asset, value AS price FROM events",
    "q_cast" -> "SELECT doc_id, CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) AS n_chars_d FROM documents",
    "q_filter_eq" -> "SELECT * FROM events WHERE event_type = 'click'",
    "q_filter_between" ->
      "SELECT * FROM events WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 23:59:59'",
    "q_point_lookup" -> "SELECT * FROM orders WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)",
    "q_report_window" -> (enrichedCte +
      """ SELECT date, close, ma7, ma30 FROM enriched
        | WHERE asset = 'click'
        |   AND date BETWEEN (SELECT max(date) FROM enriched) - 14 AND (SELECT max(date) FROM enriched)""".stripMargin),
    "q_null_check" -> s"$enrichedCte SELECT date, asset FROM enriched WHERE ma30 IS NULL",
    "q_dedup" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "q_sort" -> "SELECT event_id, ts, value FROM events ORDER BY ts, event_id",
    "q_count_day" ->
      "SELECT CAST(ts AS DATE) AS date, count(*) AS n FROM events WHERE event_type = 'click' GROUP BY 1",
    "q_count_all" -> "SELECT count(*) AS n FROM events",
    "q_insert_ignore" ->
      """WITH existing AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
        | incoming AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
        |                     o_orderdate, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0)
        | SELECT * FROM existing
        | UNION ALL
        | SELECT i.* FROM incoming i WHERE NOT EXISTS (
        |   SELECT 1 FROM existing e WHERE e.o_orderkey = i.o_orderkey)""".stripMargin,
    "q_upsert" -> (enrichedCte +
      """, existing AS (
        |  SELECT date, asset, open, high, low, close, ret FROM enriched WHERE date < DATE '2024-01-21'
        |), incoming AS (
        |  SELECT date, asset, open * 2 AS open, high * 2 AS high, low * 2 AS low, close * 2 AS close
        |  FROM daily WHERE date >= DATE '2024-01-15'
        |)
        |SELECT COALESCE(n.date, o.date) AS date, COALESCE(n.asset, o.asset) AS asset,
        |       COALESCE(n.open, o.open) AS open, COALESCE(n.high, o.high) AS high,
        |       COALESCE(n.low, o.low) AS low, COALESCE(n.close, o.close) AS close,
        |       o.ret AS ret
        |FROM existing o FULL JOIN incoming n ON o.date = n.date AND o.asset = n.asset""".stripMargin))
}
