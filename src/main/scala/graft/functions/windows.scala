package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  Add, AggregateWindowFunction, AttributeReference, Divide, EqualTo,
  Expression, If, IsNull, LessThan, Literal, Multiply
}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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
