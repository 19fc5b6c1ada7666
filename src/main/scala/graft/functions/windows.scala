package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, AttributeReference, CreateNamedStruct, Divide,
  EqualTo, Expression, GreaterThan, If, IsNull, LessThan, Literal, Multiply,
  Subtract
}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Recursive exponentially-weighted moving average as a declarative
  * window function — the primitive behind the classic technical
  * indicators (EMA/MACD signal line, Wilder RSI/ATR smoothing) that
  * NO built-in Spark window aggregate can express: the recurrence
  * `s_t = α·x_t + (1−α)·s_{t−1}` depends on the previous OUTPUT, not
  * on a frame of inputs.
  *
  * Spark-first shape: a custom [[AggregateWindowFunction]] — the same
  * machinery `rank`/`dense_rank` are built on — whose running-frame
  * buffer IS the recursion state, advanced by pure Catalyst update
  * expressions inside `WindowExec`. One shuffle on the partition key,
  * sequential within a partition (the recursion is inherently serial
  * per series — any engine pays this), O(1) state per series,
  * parallel across assets. This is preference path (b) from the build
  * charter (custom Expression) — not `mapPartitions`, and not the
  * `(1−α)^{−i}` cumulative-sum factorization, which overflows doubles
  * beyond ~600 rows per series and so cannot survive years of daily
  * (let alone tick-grain) history at 100 TB.
  *
  * Seeding (`seedPeriods`):
  *  - `1` → pandas `ewm(span, adjust=False)`: state seeds to the first
  *    non-null input (x/1.0 ≡ x in IEEE 754);
  *  - `n` → Wilder: NULL until `n` non-null inputs arrived, then the
  *    plain mean of those `n`, then the recurrence. (Wilder's
  *    `(prev·13 + x)/14` is algebraically α=1/14 smoothing; it is
  *    emitted here as `α·x + (1−α)·prev` — the exact arithmetic the
  *    DuckDB oracle replays, keeping results bit-identical.)
  * NULL inputs neither update state nor count toward the seed (the
  * first `ret`/`gain` row of every series is NULL by construction).
  *
  * Reference anchor: the indicator family extends the reference's
  * rolling-mean enrichment (dag_btc_daily.py:264-267) with the
  * standard recursive indicators its pandas stack gets from
  * `Series.ewm` — same per-asset series grain, same min_periods
  * discipline (SURVEY.md §2.5).
  */
case class SeededEwma(child: Expression, alpha: Double, seedPeriods: Int)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
  require(seedPeriods >= 1, s"seedPeriods must be >= 1, got $seedPeriods")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seeded_ewma"

  private lazy val state = AttributeReference("ewmaState", DoubleType)()
  private lazy val cnt = AttributeReference("ewmaCnt", LongType, nullable = false)()
  private lazy val cum = AttributeReference("ewmaCum", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(state, cnt, cum)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal(0L), Literal(0.0))

  // MutableProjection evaluates every update expression against the
  // OLD buffer before writing any of them back, so state/cnt/cum on
  // the right-hand sides are all pre-update values.
  override lazy val updateExpressions: Seq[Expression] = {
    val isN = IsNull(child)
    val n1 = Add(cnt, Literal(1L))
    val newCum = Add(cum, child)
    val seeded = Divide(newCum, Literal(seedPeriods.toDouble))
    val recur = Add(Multiply(Literal(alpha), child), Multiply(Literal(1.0 - alpha), state))
    Seq(
      If(isN, state,
        If(LessThan(n1, Literal(seedPeriods.toLong)), Literal.create(null, DoubleType),
          If(EqualTo(n1, Literal(seedPeriods.toLong)), seeded, recur))),
      If(isN, cnt, n1),
      If(isN, cum, newCum))
  }

  override lazy val evaluateExpression: Expression = state

  override protected def withNewChildInternal(newChild: Expression): SeededEwma =
    copy(child = newChild)
}

/** Holt double-exponential (level + trend) smoothing as a window
  * recursion — the forecasting step up from [[SeededEwma]]: a plain
  * EWMA lags a trending series by design; Holt's second state tracks
  * the slope so the one-step-ahead forecast `level + trend` stays on
  * the line. The coupled recurrence
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * depends on BOTH previous outputs — two buffer slots, same
  * AggregateWindowFunction machinery (rank/dense_rank's), advanced by
  * pure Catalyst update expressions inside WindowExec. Seeding is the
  * standard flat start: first non-null x → l = x, b = 0 (the trend
  * estimate warms up through β like every textbook Holt
  * implementation with unknown initial slope). NULL inputs neither
  * update state nor emit fresh values (state carries). Returns
  * struct(level, trend, forecast) where forecast = l_t + b_t, the
  * one-step-ahead prediction made after absorbing row t.
  *
  * MutableProjection evaluates every update against the OLD buffer
  * before writing any back, so the trend update re-derives l_t from
  * pre-update state — the exact multiply-add order the recursive-CTE
  * oracle replays, keeping doubles bit-identical cross-engine (the
  * SeededEwma/q_ema_macd precedent).
  */
case class HoltLinear(child: Expression, alpha: Double, beta: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
  require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType), StructField("trend", DoubleType),
    StructField("forecast", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "holt_linear"

  private lazy val level = AttributeReference("holtLevel", DoubleType)()
  private lazy val trend = AttributeReference("holtTrend", DoubleType)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(level, trend)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType), Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val isN = IsNull(child)
    val seedRow = IsNull(level)
    // l_t from the OLD buffer — shared (inlined) by both updates
    val newLevel = Add(Multiply(Literal(alpha), child),
      Multiply(Literal(1.0 - alpha), Add(level, trend)))
    val newTrend = Add(Multiply(Literal(beta), Subtract(newLevel, level)),
      Multiply(Literal(1.0 - beta), trend))
    Seq(
      If(isN, level, If(seedRow, child, newLevel)),
      If(isN, trend, If(seedRow, Literal(0.0), newTrend)))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("level"), level,
      Literal("trend"), trend,
      Literal("forecast"), Add(level, trend)))

  override protected def withNewChildInternal(newChild: Expression): HoltLinear =
    copy(child = newChild)
}

/** Two-sided CUSUM (cumulative-sum change detection) as a window
  * recursion — the Page (1954) control-chart statistic every
  * monitoring pipeline runs over a metric stream: detect a sustained
  * shift of the mean away from `target` while ignoring one-off noise
  * smaller than the `allowance` half-band.
  *
  *   s⁺_t = max(0, s⁺_{t−1} + (x_t − target − allowance))
  *   s⁻_t = max(0, s⁻_{t−1} + (target − allowance − x_t))
  *
  * Each side accumulates only signed deviation BEYOND the allowance
  * and resets at zero — the reset is why no built-in frame aggregate
  * expresses it (the value depends on the previous OUTPUT, the
  * [[SeededEwma]] argument). Alarm thresholding (s > h) is left to
  * the caller: the statistic is the reusable part, the threshold is
  * policy. NULL inputs carry state (gap days don't reset the chart).
  * Returns struct(pos, neg). The max(0, ·) is emitted as a
  * compare-and-select on the exact Add/Subtract order the
  * recursive-CTE oracle replays with greatest(0, ·) — bit-identical
  * cross-engine for non-NaN inputs.
  */
case class CusumState(child: Expression, target: Double, allowance: Double)
    extends AggregateWindowFunction with UnaryLike[Expression] {
  require(allowance >= 0, s"allowance must be >= 0, got $allowance")

  override def dataType: DataType = StructType(Seq(
    StructField("pos", DoubleType, nullable = false),
    StructField("neg", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "cusum_state"

  private lazy val pos = AttributeReference("cusumPos", DoubleType, nullable = false)()
  private lazy val neg = AttributeReference("cusumNeg", DoubleType, nullable = false)()

  override def aggBufferAttributes: Seq[AttributeReference] = Seq(pos, neg)

  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val isN = IsNull(child)
    val up = Add(pos, Subtract(Subtract(child, Literal(target)), Literal(allowance)))
    val dn = Add(neg, Subtract(Subtract(Literal(target), Literal(allowance)), child))
    Seq(
      If(isN, pos, If(GreaterThan(up, Literal(0.0)), up, Literal(0.0))),
      If(isN, neg, If(GreaterThan(dn, Literal(0.0)), dn, Literal(0.0))))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("pos"), pos, Literal("neg"), neg))

  override protected def withNewChildInternal(newChild: Expression): CusumState =
    copy(child = newChild)
}
