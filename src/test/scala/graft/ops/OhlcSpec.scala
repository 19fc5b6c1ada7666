package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class OhlcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("open/close are the ts-ordered endpoints; high/low the extremes (dag:195-199)") {
    val prices = Seq(
      (ts("2024-01-01 03:00:00"), "BTC", 102.0), // not first despite row order
      (ts("2024-01-01 00:00:00"), "BTC", 100.0), // open
      (ts("2024-01-01 23:00:00"), "BTC", 101.0), // close
      (ts("2024-01-01 12:00:00"), "BTC", 99.0),  // low
      (ts("2024-01-01 13:00:00"), "BTC", 110.0), // high
      (ts("2024-01-02 00:00:00"), "BTC", 50.0),  // next day
      (ts("2024-01-01 02:00:00"), "ETH", 7.0)    // other asset
    ).toDF("ts_utc", "asset", "price")

    val out = Ohlc.daily(prices).collect().map(r =>
      (r.getDate(0).toString, r.getString(1)) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

    assert(out(("2024-01-01", "BTC")) === ((100.0, 110.0, 99.0, 101.0)))
    assert(out(("2024-01-02", "BTC")) === ((50.0, 50.0, 50.0, 50.0)))
    assert(out(("2024-01-01", "ETH")) === ((7.0, 7.0, 7.0, 7.0)))
  }

  test("weekly resample: Monday buckets, endpoints by raw ts across days") {
    val prices = Seq(
      // 2024-01-01 is a Monday; 01-07 (Sun) is the same ISO week
      (ts("2024-01-01 00:00:00"), "BTC", 100.0), // week open
      (ts("2024-01-03 12:00:00"), "BTC", 140.0), // week high
      (ts("2024-01-07 23:00:00"), "BTC", 120.0), // week close (Sunday)
      (ts("2024-01-08 00:00:00"), "BTC", 50.0)   // next week (Monday)
    ).toDF("ts_utc", "asset", "price")
    val out = Ohlc.weekly(prices).collect().map(r =>
      (r.getDate(0).toString, r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(("2024-01-01", "BTC")) === ((100.0, 140.0, 100.0, 120.0)))
    assert(out(("2024-01-08", "BTC")) === ((50.0, 50.0, 50.0, 50.0)))
  }

  test("OHLC invariant: low <= min(open,close) <= max(open,close) <= high") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      d <- 1 to 5; h <- 0 until 24
    } yield (ts(f"2024-01-0$d $h%02d:00:00"), "BTC", 100.0 + rnd.nextGaussian() * 10)
    val out = Ohlc.daily(rows.toDF("ts_utc", "asset", "price")).collect()
    out.foreach { r =>
      val (o, h, l, c) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(l <= math.min(o, c) && math.max(o, c) <= h)
    }
  }
}
