package graft.ingest

import graft.SparkSpec
import graft.ingest.BinanceSource._

/** Offline ingest coverage (zero-egress): the parser against a
  * captured Binance-shaped klines payload, retry/backoff counting
  * (dag_btc_daily.py:64-104 parity), and the distributed fetchMany
  * path on the fixture fetcher.
  */
class BinanceSourceSpec extends SparkSpec {

  // shape captured from the public /api/v3/klines docs: array of
  // 12-field arrays, numerics unquoted, prices as quoted strings,
  // pretty-printed with newlines between rows
  private val payload =
    """[
      |  [1499040000000, "0.01634790", "0.80000000", "0.01575800", "0.01577100", "148976.11427815", 1499644799999, "2434.19055334", 308, "1756.87402397", "28.46694368", "0"],
      |  [1499043600000, "0.01577100", "0.81000000", "0.01505800", "0.01512100", "151000.00000000", 1499648399999, "2500.00000000", 310, "1800.00000000", "30.00000000", "0"]
      |]""".stripMargin

  test("parseKlines: quoted strings, whitespace, 12 fields, preserved verbatim") {
    val f = new HttpFetcher()
    val rows = f.parseKlines(payload)
    assert(rows.length === 2)
    val r = rows.head
    assert(r._1 === 1499040000000L) // open_time
    assert(r._2 === "0.01634790") // open — string, exactly as sent
    assert(r._3 === "0.80000000") // high
    assert(r._4 === "0.01575800") // low
    assert(r._5 === "0.01577100") // close
    assert(r._6 === "148976.11427815") // volume
    assert(r._7 === 1499644799999L) // close_time
    assert(r._9 === 308L) // n_trades
    assert(rows(1)._1 === 1499043600000L)
  }

  test("parseKlines: empty array and single-row payloads") {
    val f = new HttpFetcher()
    assert(f.parseKlines("[]").isEmpty)
    assert(f.parseKlines("""[[1, "a", "b", "c", "d", "e", 2, "f", 3, "g", "h", "i"]]""").length === 1)
  }

  test("retry: linear backoff, succeeds after transient failures, counts attempts (S2)") {
    var calls = 0
    val out = retry(attempts = 4, backoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
  }

  test("retry: exhausts attempts and rethrows the LAST error (dag:64-104)") {
    var calls = 0
    val e = intercept[RuntimeException] {
      retry(attempts = 3, backoffMs = 1) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls === 3)
    assert(e.getMessage === "boom 3")
  }

  test("fetchDay: declared kline schema, 24 hourly rows, deterministic") {
    val fx = new FixtureFetcher()
    val spec = FetchSpec("BTC-USD", "2024-01-05")
    val df = fetchDay(spark, fx, spec)
    assert(df.schema === graft.model.Schemas.klineSchema)
    assert(df.count() === 24)
    assert(fx.fetch(spec) === fx.fetch(spec))
  }

  test("fetchMany: executor-distributed backfill covers every (asset, day) spec") {
    val specs = for {
      asset <- Seq("BTC-USD", "ETH-USD")
      day <- Seq("2024-01-01", "2024-01-02", "2024-01-03")
    } yield FetchSpec(asset, day)
    val df = fetchMany(spark, new FixtureFetcher(), specs)
    assert(df.count() === specs.size * 24L)
    val byAsset = df.groupBy("asset").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byAsset === Map("BTC-USD" -> 72L, "ETH-USD" -> 72L))
    // every hour of every requested day present exactly once per asset
    assert(df.select("asset", "open_time").distinct().count() === specs.size * 24L)
  }
}
