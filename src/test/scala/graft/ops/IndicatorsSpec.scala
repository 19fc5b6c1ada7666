package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  /** 40 consecutive days of daily closes for one asset. */
  private lazy val daily = {
    val closes = (1 to 40).map(i => 100.0 + i + math.sin(i) * 5)
    closes.zipWithIndex.map { case (c, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), "BTC", c)
    }.toDF("date", "asset", "close")
  }

  private lazy val rows: Array[Row] =
    Indicators.enrich(daily).orderBy("date").collect()

  private def nullUntil(col: String, firstNonNull: Int): Unit = {
    val idx = rows.head.schema.fieldIndex(col)
    rows.zipWithIndex.foreach { case (r, i) =>
      val day = i + 1
      if (day < firstNonNull) assert(r.isNullAt(idx), s"$col should be NULL on day $day")
      else assert(!r.isNullAt(idx), s"$col should be non-NULL on day $day")
    }
  }

  test("ret NULL on day 1 only (pct_change, dag:264)") { nullUntil("ret", 2) }
  test("ma7 first non-null exactly day 7 (min_periods=7, dag:265)") { nullUntil("ma7", 7) }
  test("ma30 first non-null exactly day 30 (min_periods=30, dag:266)") { nullUntil("ma30", 30) }
  test("vol30 lags ma30 by one row — first non-null day 31 (NULL-ret offset, dag:267)") {
    nullUntil("vol30", 31)
  }

  test("ret matches close/lag(close)-1") {
    val idx = rows.head.schema.fieldIndex("ret")
    val closes = rows.map(_.getDouble(rows.head.schema.fieldIndex("close")))
    (1 until rows.length).foreach { i =>
      assert(math.abs(rows(i).getDouble(idx) - (closes(i) / closes(i - 1) - 1)) < 1e-12)
    }
  }

  test("ma7 is the trailing 7-row mean") {
    val idx = rows.head.schema.fieldIndex("ma7")
    val closes = rows.map(_.getDouble(rows.head.schema.fieldIndex("close")))
    (6 until rows.length).foreach { i =>
      val want = closes.slice(i - 6, i + 1).sum / 7
      assert(math.abs(rows(i).getDouble(idx) - want) < 1e-9)
    }
  }

  test("vol30 is SAMPLE stddev (ddof=1) of trailing 30 rets") {
    val schema = rows.head.schema
    val rets = rows.map(r => if (r.isNullAt(schema.fieldIndex("ret"))) Double.NaN
                             else r.getDouble(schema.fieldIndex("ret")))
    val idx = schema.fieldIndex("vol30")
    (30 until rows.length).foreach { i =>
      val wnd = rets.slice(i - 29, i + 1).filterNot(_.isNaN)
      val mean = wnd.sum / wnd.size
      val sampleStd = math.sqrt(wnd.map(x => (x - mean) * (x - mean)).sum / (wnd.size - 1))
      assert(math.abs(rows(i).getDouble(idx) - sampleStd) < 1e-12)
    }
  }

  test("rolling mean of a constant series is the constant") {
    val const = (0 until 10).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(i)), "X", 5.0))
      .toDF("date", "asset", "close")
    val out = Indicators.enrich(const).orderBy("date").collect()
    val idx = out.head.schema.fieldIndex("ma7")
    (6 until 10).foreach(i => assert(out(i).getDouble(idx) === 5.0))
  }

  test("pct_change is ROW-based across date gaps (dag:264 parity)") {
    val gappy = Seq(
      (java.sql.Date.valueOf("2024-01-01"), "X", 100.0),
      (java.sql.Date.valueOf("2024-01-05"), "X", 110.0) // 4-day gap, still one lag
    ).toDF("date", "asset", "close")
    val out = Indicators.enrich(gappy).orderBy("date").collect()
    assert(math.abs(out(1).getDouble(out.head.schema.fieldIndex("ret")) - 0.10) < 1e-12)
  }

  test("windows are per-asset partitioned (no cross-asset leakage)") {
    val two = (0 until 8).flatMap(i => Seq(
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i)), "A", 10.0),
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i)), "B", 20.0)))
      .toDF("date", "asset", "close")
    val out = Indicators.enrich(two).collect()
    val s = out.head.schema
    out.filter(!_.isNullAt(s.fieldIndex("ma7"))).foreach { r =>
      val want = if (r.getString(s.fieldIndex("asset")) == "A") 10.0 else 20.0
      assert(r.getDouble(s.fieldIndex("ma7")) === want)
    }
  }

  test("rollingMedian: min_periods guard, odd/even frame selection, per-asset") {
    def t(i: Int) = java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00")
    val prices = Seq(
      (t(0), "X", 4.0), (t(1), "X", 1.0), (t(2), "X", 10.0), (t(3), "X", 2.0),
      (t(0), "Y", 100.0), (t(1), "Y", 200.0), (t(2), "Y", 300.0))
      .toDF("ts_utc", "asset", "price")
    val out = Indicators.rollingMedian(prices, window = 3)
      .orderBy("asset", "ts_utc").collect()
    val med = out.head.schema.fieldIndex("med3")
    assert(out(0).isNullAt(med) && out(1).isNullAt(med)) // min_periods
    assert(out(2).getDouble(med) === 4.0)  // median(4,1,10)
    assert(out(3).getDouble(med) === 2.0)  // median(1,10,2)
    assert(out(4).isNullAt(med) && out(5).isNullAt(med))
    assert(out(6).getDouble(med) === 200.0) // Y's own window
  }

  test("rollingMedian: even frame interpolates the two middles") {
    def t(i: Int) = java.sql.Timestamp.valueOf(s"2024-01-0${i + 1} 00:00:00")
    val prices = Seq((t(0), "X", 1.0), (t(1), "X", 2.0), (t(2), "X", 3.0), (t(3), "X", 10.0))
      .toDF("ts_utc", "asset", "price")
    val out = Indicators.rollingMedian(prices, window = 4).orderBy("ts_utc").collect()
    assert(out(3).getDouble(out.head.schema.fieldIndex("med4")) === 2.5)
  }
}
