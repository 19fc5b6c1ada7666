package graft

import graft.ingest.BinanceSource
import graft.ingest.BinanceSource.{FetchSpec, FixtureFetcher}

/** Golden end-to-end: the whole DAG over a synthetic fixture, including
  * re-run idempotency (SURVEY.md §5).
  */
class PipelineSpec extends SparkSpec {

  test("runRange produces one metrics row per day and re-runs are idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh").toString
    val p = new Pipeline(spark, root, new FixtureFetcher())
    p.runRange("BTC-USD", "2024-01-01", "2024-01-08")

    val metrics = spark.read.parquet(s"$root/daily_metrics")
    assert(metrics.count() === 8)
    val byDate = metrics.collect().map(r => r.getDate(0).toString -> r).toMap
    // ret NULL on day 1, non-null day 2; ma7 first non-null day 7
    assert(byDate("2024-01-01").isNullAt(6))
    assert(!byDate("2024-01-02").isNullAt(6))
    (1 to 6).foreach(d => assert(byDate(f"2024-01-0$d").isNullAt(7), s"ma7 day $d"))
    assert(!byDate("2024-01-07").isNullAt(7) && !byDate("2024-01-08").isNullAt(7))

    // raw facts: 24 rows/day, no duplicate (ts, asset) keys
    val raw = spark.read.parquet(s"$root/raw_prices")
    assert(raw.count() === 8 * 24)

    // replay two days: byte-identical warehouse state
    val before = metrics.orderBy("date").collect().toSeq
    p.runDay("BTC-USD", "2024-01-03")
    p.runDay("BTC-USD", "2024-01-08")
    val after = spark.read.parquet(s"$root/daily_metrics").orderBy("date").collect().toSeq
    assert(after === before)
    assert(spark.read.parquet(s"$root/raw_prices").count() === 8 * 24)
  }

  test("backfillAll (set-based, one pass) equals runRange (per-day replay)") {
    val days = (1 to 8).map(d => f"2024-01-0$d")
    val rootA = java.nio.file.Files.createTempDirectory("graft_wh_a").toString
    new Pipeline(spark, rootA, new FixtureFetcher()).runRange("BTC-USD", days.head, days.last)
    val rootB = java.nio.file.Files.createTempDirectory("graft_wh_b").toString
    new Pipeline(spark, rootB, new FixtureFetcher()).backfillAll("BTC-USD", days)
    val a = spark.read.parquet(s"$rootA/daily_metrics").orderBy("date").collect().toSeq
    val b = spark.read.parquet(s"$rootB/daily_metrics").orderBy("date").collect().toSeq
    assert(a === b)
  }

  test("quality checks pass on the golden warehouse and catch a thin day") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    val p = new Pipeline(spark, root, new FixtureFetcher())
    p.runDay("BTC-USD", "2024-02-01") // includes qualityChecks — must not throw
  }

  test("renderReport writes PNG (reference savefig parity) and SVG chart artifacts (S11/S12)") {
    val root = java.nio.file.Files.createTempDirectory("graft_wh3").toString
    val p = new Pipeline(spark, root, new FixtureFetcher())
    p.runRange("BTC-USD", "2024-01-01", "2024-01-03")
    // runDay renders the reference's own artifact format: a raster PNG
    val f = new java.io.File(s"$root/reports/BTC-USD_2024-01-03.png")
    assert(f.exists() && f.length() > 0)
    val img = javax.imageio.ImageIO.read(f)
    assert(img != null, "report artifact is not a decodable PNG")
    assert(img.getWidth === 980 && img.getHeight === 420)
    assert((img.getRGB(2, 2) & 0xffffff) === 0xffffff) // white background
    // the close polyline must have put ink on the canvas in its series
    // color (antialiasing blends edges, so scan for near-matches)
    val c0 = graft.report.ChartGeom.SeriesColors.head
    def near(rgb: Int): Boolean = {
      def d(a: Int, b: Int, s: Int) = math.abs(((a >> s) & 0xff) - ((b >> s) & 0xff))
      d(rgb, c0, 16) < 64 && d(rgb, c0, 8) < 64 && d(rgb, c0, 0) < 64
    }
    val inked = (for { x <- (0 until img.getWidth).iterator; y <- 0 until img.getHeight }
      yield img.getRGB(x, y)).count(near)
    assert(inked > 50, s"expected a drawn close series, found $inked matching pixels")
    // the vector form stays available through the same sink
    p.renderReport("BTC-USD", "2024-01-03", s"$root/reports/BTC-USD_2024-01-03.svg")
    val svg = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/reports/BTC-USD_2024-01-03.svg")), "UTF-8")
    assert(svg.startsWith("<svg"))
    assert("<polyline ".r.findAllIn(svg).size === 3) // close, ma7, ma30
    assert(svg.contains("2024-01-01") && svg.contains("2024-01-03"))
    // ma7/ma30 all-null at day 3 → their polylines have no points, close does
    assert(svg.contains("close"))
  }

  test("retry: succeeds after transient failures, rethrows after exhaustion (S2)") {
    var calls = 0
    val v = BinanceSource.retry(attempts = 4, backoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error("transient")
      "ok"
    }
    assert(v === "ok" && calls === 3)
    intercept[RuntimeException] {
      BinanceSource.retry(attempts = 2, backoffMs = 1) { sys.error("always") }
    }
  }

  test("fixture fetcher is deterministic and day-shaped") {
    val f = new FixtureFetcher()
    val a = f.fetch(FetchSpec("BTC-USD", "2024-01-01"))
    val b = f.fetch(FetchSpec("BTC-USD", "2024-01-01"))
    assert(a === b)
    assert(a.size === 24)
    assert(a.head._1 === 1704067200000L)
  }
}
