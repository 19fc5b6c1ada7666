package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The limb-sum must be BIT-IDENTICAL to the wide-decimal sum it
  * replaces — that equality is what lets the DuckDB oracle (which
  * sums decimals) keep hash-matching the fast path.
  */
class ExactSumsSpec extends SparkSpec {

  test("limb sum equals wide-decimal sum bit-for-bit (random 2dp values, negatives included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // 2dp values in [-1e6, 1e6], grouped, with enough rows to exercise
    // partial aggregation across partitions
    val df = (1 to 20000).map { i =>
      (i % 7, math.round((rnd.nextDouble() - 0.5) * 2e8) / 100.0)
    }.toDF("g", "x").repartition(8)

    val fast = df.groupBy("g").agg(ExactSums.moneySum(col("x")).as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val exact = df.groupBy("g")
      .agg(sum(col("x").cast("decimal(18,2)")).cast("double").as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(fast.toSeq == exact.toSeq) // == on double: bit-identical values
  }

  test("limb split is exact for negative units (arithmetic shift + mask)") {
    import spark.implicits._
    val vals = Seq(-1L, -1048576L, -1048577L, 1048575L, 0L, 9999999999L, -9999999999L)
    val df = vals.toDF("u")
    val out = df.agg(ExactSums.limbSumUnits(col("u"), 2).as("s")).head().getDouble(0)
    assert(out == vals.sum / 100.0)
  }

  test("scale-4 product units match decimal product sum (join_big form)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map { _ =>
      (math.round(rnd.nextDouble() * 1e8) / 100.0, // price, 2dp
        math.round(rnd.nextDouble() * 10.0) / 100.0) // discount, 2dp in [0, 0.1]
    }.toDF("p", "d").repartition(4)
    val fast = df.agg(ExactSums.limbSumUnits(
      ExactSums.units(col("p"), 2) * (lit(100L) - ExactSums.units(col("d"), 2)), 4).as("s"))
      .head().getDouble(0)
    val exact = df.agg(sum(col("p").cast("decimal(18,2)") *
        (lit(BigDecimal(1)) - col("d").cast("decimal(4,2)"))).cast("double").as("s"))
      .head().getDouble(0)
    assert(fast == exact)
  }
}
