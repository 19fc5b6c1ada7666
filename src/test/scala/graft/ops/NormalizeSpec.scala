package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("epoch-ms → UTC timestamp → ISO string round trip (F1, F2)") {
    val df = Seq(1704067200000L).toDF("open_time") // 2024-01-01T00:00:00Z
      .select(Normalize.tsToIso(Normalize.epochMsToTs(col("open_time"))).as("iso"))
    assert(df.head().getString(0) === "2024-01-01T00:00:00Z")
  }

  test("string price cast to double (F7/P3, dag:89)") {
    val df = Seq("42694.12").toDF("close").select(Normalize.castPrice(col("close")).as("p"))
    assert(df.head().getDouble(0) === 42694.12)
  }

  test("dedupKeepFirst keeps the row with the smallest order key per group (D1, dag:93)") {
    val df = Seq(
      ("k1", 2L, "second"),
      ("k1", 1L, "first"),
      ("k2", 9L, "only")
    ).toDF("key", "seq", "payload")
    val out = Normalize.dedupKeepFirst(df, keys = Seq("key"), order = Seq("seq"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out === Map("k1" -> "first", "k2" -> "only"))
  }

  test("dedup is idempotent: f(f(x)) = f(x)") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 3.0)).toDF("key", "seq", "v")
    val once = Normalize.dedupKeepFirst(df, Seq("key"), Seq("seq"))
    val twice = Normalize.dedupKeepFirst(once, Seq("key"), Seq("seq"))
    assert(once.orderBy("key").collect().toSeq === twice.orderBy("key").collect().toSeq)
  }

  test("klinesToPrices: full extract transform chain (dag:83-92)") {
    val kline = Seq((1704067200000L, "1.0", "2.0", "0.5", "1.5", "9", 0L, "0", 0L, "0", "0", "0"))
      .toDF("open_time", "open", "high", "low", "close", "volume", "close_time",
        "qav", "num_trades", "taker_base_vol", "taker_quote_vol", "ignore")
    val row = Normalize.klinesToPrices(kline).head()
    assert(row.getTimestamp(0).toInstant.toString === "2024-01-01T00:00:00Z")
    assert(row.getDouble(1) === 1.5)
  }
}
