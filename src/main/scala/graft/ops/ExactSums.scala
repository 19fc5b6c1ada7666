package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, order-independent money sums without Spark's wide-decimal
  * aggregation buffer.
  *
  * Why: `sum(decimal(p,s))` allocates a buffer of precision p+10; past
  * precision 18 that leaves the compact-long representation and every
  * add goes through Java BigDecimal — measured 5-10x slower than a
  * plain long/double sum on the same data (and the per-row Decimal
  * allocation costs again as much). But a double sum is
  * order-DEPENDENT in the last ulps (partial-aggregation order varies
  * run to run), so it can't be the exact/reproducible form.
  *
  * The scalable exact form: fixed-point integers summed as two int64
  * "limbs". A 2-decimal-place value x (stored as double) is converted
  * to integer units u = round(x*100) — exact recovery: x is the
  * nearest double of u/100, so |x*100 - u| <= 3u*2^-53 < 1e-7 for
  * u < 1e13, far below the 0.5 rounding margin. Units are split
  * u = hi*2^20 + lo via arithmetic shift + mask (exact for negatives
  * in two's complement: hi = u >> 20 is floor division, lo = u & mask
  * is the non-negative remainder) and each limb is summed as a plain
  * long:
  *
  *   sum(u) = sum(hi)*2^20 + sum(lo)   — recombined exactly in
  *                                       decimal on the final
  *                                       (per-group) rows only.
  *
  * Overflow envelope: lo in [0, 2^20) and |hi| <= |u|/2^20, so with
  * per-row units up to 1e10 (a 1e8-cent price times a 1e2 factor)
  * both limb sums stay inside int64 up to ~8.8e12 rows per group —
  * comfortably past a 100 TB table's row count. The wide-decimal form
  * (`sum(cast(c as decimal(18,2)))`) remains the fallback beyond that.
  *
  * The result is bit-identical to DuckDB's
  * `CAST(sum(CAST(c AS DECIMAL)) AS DOUBLE)`: both sides compute the
  * same exact rational and round once to the nearest double.
  */
object ExactSums {
  private val LimbBits = 20
  private val LimbMask = (1L << LimbBits) - 1

  /** Integer units of a fixed-scale value column:
    * floor(c*10^scale + 0.5) as long — NOT `round()`, whose double
    * path allocates a java.math.BigDecimal per row (measured ~2× on
    * the whole aggregate); floor is a native double op. Exact for
    * values with `scale` decimal places while |units| < ~1e13: the
    * product sits within 1e-7 of the integer (see scaladoc above), so
    * adding 0.5 and flooring recovers it exactly, positives and
    * negatives alike. (True half-way inputs — values beyond `scale`
    * places — round toward +inf rather than decimal HALF_UP; callers
    * declare the scale, so such inputs are out of contract.)
    */
  def units(c: Column, scale: Int): Column =
    floor(c * math.pow(10, scale) + lit(0.5)).cast("long")

  /** Exact sum of an integer-units column, returned as double value
    * units/10^scale. Aggregates two long limbs; recombines in decimal
    * precision on the final rows only (never per input row).
    */
  def limbSumUnits(u: Column, scale: Int): Column = {
    val hi = sum(shiftright(u, LimbBits))
    val lo = sum(u.bitwiseAND(lit(LimbMask)))
    ((hi.cast("decimal(38,0)") * lit(1L << LimbBits) + lo.cast("decimal(38,0)")) /
      lit(math.pow(10, scale).toLong)).cast("double")
  }

  /** Exact order-independent sum of a fixed-scale money column. */
  def moneySum(c: Column, scale: Int = 2): Column =
    limbSumUnits(units(c, scale), scale)
}
