package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Mat.MatOps

/** Join / set / analytic operators beyond the reference's surface —
  * the relational core any 100 TB engine needs. Everything here is
  * declarative DataFrame API so Catalyst plans it: dimension joins are
  * explicitly `broadcast()` (no shuffle of the fact side), fact-fact
  * joins shuffle on the join key once, and the as-of join uses the
  * union + last-non-null window form — one shuffle on the
  * partitioning key, no range-explosion, the standard scalable shape
  * for time-series point-in-time correctness.
  */
object Relational {

  /** Fact ⋈ broadcast dims: revenue per nation. `broadcast()` keeps
    * the orders side shuffle-free (BroadcastHashJoin both hops).
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(broadcast(customer.select("c_custkey", "c_nationkey")),
        orders("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      // exact order-independent sum (reproducible run-to-run and
      // engine-to-engine, unlike a double sum which drifts in the last
      // ulps with aggregation order) — limb-sum form, not the 5-10x
      // slower wide-decimal aggregation buffer (see ExactSums)
      .agg(count(lit(1)).as("n_orders"),
        ExactSums.moneySum(col("o_totalprice")).as("revenue"))

  /** Fact ⋈ fact: one shuffle each side on the join key, then
    * hash-aggregate — the canonical large-join shape.
    */
  def revenueByPriority(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"),
        // price*(1-discount) in exact scale-4 integer units: cents
        // times (100 - discount-cents), all long arithmetic — equals
        // the decimal product exactly (both inputs are 2dp)
        (ExactSums.units(col("l_extendedprice"), 2) *
          (lit(100L) - ExactSums.units(col("l_discount"), 2))).as("rev_units"))
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(ExactSums.limbSumUnits(col("rev_units"), 4).as("revenue"),
        count(lit(1)).as("n_items"))

  /** Left-semi: customers that have at least one order — no payload
    * from the right side crosses the wire, just existence.
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders.select("o_custkey"),
      customer("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Left-outer join with null-side aggregation: every customer with
    * their order count, zero for customers who never ordered (the rows
    * an inner join silently drops). Orders pre-aggregate to one row
    * per custkey BEFORE the join, so the outer join is dim-sized on
    * both sides — never join-then-count a fact table when the count
    * can partial-aggregate first.
    */
  def customerOrderCounts(customer: DataFrame, orders: DataFrame): DataFrame = {
    val counts = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    customer.join(counts, customer("c_custkey") === counts("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
  }

  /** ROLLUP aggregate: per (returnflag, linestatus) + subtotals +
    * grand total. Spark plans one Expand + hash-aggregate.
    */
  def rollupQtyRevenue(lineitem: DataFrame): DataFrame =
    lineitem.rollup("l_returnflag", "l_linestatus")
      .agg(ExactSums.moneySum(col("l_quantity")).as("sum_qty"),
        ExactSums.moneySum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))

  /** Set difference on a key domain: users who did `a` but never `b`. */
  def usersExcept(events: DataFrame, a: String, b: String): DataFrame =
    events.filter(col("event_type") === a).select("user_id")
      .except(events.filter(col("event_type") === b).select("user_id"))

  /** Exact distinct cardinality per group (one shuffle; Spark plans
    * partial distinct then count). The approximate companion is
    * `approxDistinctUsers` — HLL, constant memory at any scale.
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(countDistinct("user_id").as("n_users"))

  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy("event_type").agg(approx_count_distinct("user_id", rsd).as("n_users_approx"))

  /** Exact interpolated percentiles per group. At 100 TB swap
    * `percentile` for `percentile_approx` (t-digest, mergeable) — the
    * exact form materializes each group's values.
    */
  def valueQuantiles(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(
      expr("percentile(value, 0.5)").as("p50"),
      expr("percentile(value, 0.9)").as("p90"),
      expr("percentile(value, 0.99)").as("p99"))

  /** Per-asset distribution + time-drift statistics in ONE hash
    * aggregate: count, mean, sample stddev, and the correlation /
    * sample covariance of price against time (days since epoch — days
    * rather than seconds keeps the co-moment magnitudes small so 6 dp
    * rounding is far above float noise). corr > 0 = drifting upward.
    * All of these are one-pass mergeable co-moment aggregates (partial
    * maps merge associatively), so the plan is a map-side partial +
    * one thin shuffle per group at any scale.
    */
  def groupStats(prices: DataFrame): DataFrame = {
    val tDays = col("ts_utc").cast("double") / lit(86400.0)
    prices.groupBy("asset").agg(
      count(lit(1)).as("n"),
      round(avg(col("price")), 6).as("mean_price"),
      round(stddev_samp(col("price")), 6).as("sd_price"),
      round(corr(col("price"), tDays), 6).as("corr_drift"),
      round(covar_samp(col("price"), tDays), 6).as("covar_drift"))
  }

  /** The 100 TB form of [[valueQuantiles]]: `approx_percentile`
    * (KLL-style mergeable sketch, error ≤ 1/accuracy of the rank) —
    * constant memory per group where the exact form materializes the
    * group's values. Rows-only vs the oracle (sketch results are
    * implementation-defined); closeness to exact is unit-asserted.
    */
  def valueQuantilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type").agg(
      expr(s"approx_percentile(value, 0.5, $accuracy)").as("p50"),
      expr(s"approx_percentile(value, 0.9, $accuracy)").as("p90"),
      expr(s"approx_percentile(value, 0.99, $accuracy)").as("p99"))

  /** Top-k rows per group by value (rank ≤ k), deterministic
    * tie-break on event_id.
    */
  def topKPerGroup(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(desc("value"), asc("event_id"))
    events.select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSec`. Two
    * windows over one shuffle on user_id, then a hash-aggregate.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = events.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_sess",
        when(unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    gapped.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
  }

  /** Skew-resistant equi-join: salt the skewed (left) side into
    * `buckets` sub-keys and replicate the small right side once per
    * bucket, so a single hot key spreads over `buckets` tasks instead
    * of one straggler. Semantically identical to
    * `left.join(right, key)`. AQE's skew-join handles sort-merge skew
    * automatically; explicit salting is for the cases AQE can't split
    * (e.g. a single key too large for one task's build side, or
    * aggregations keyed on the hot key).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Pivot: one column per event_type, exact order-independent value
    * sums via the limb-sum form (ExactSums) — NOT
    * `sum(cast(decimal(18,6)))`, whose precision-28 BigDecimal buffer
    * would be allocated once per pivot column per group (measured 2×
    * on q_pivot). Value list is declared, not discovered — at scale a
    * discovery pass first (`.distinct.collect`) or a fixed vocabulary
    * avoids a blind two-pass pivot.
    */
  def pivotUserValues(events: DataFrame, types: Seq[String]): DataFrame =
    events.groupBy("user_id")
      .pivot("event_type", types)
      .agg(ExactSums.moneySum(col("value"), 6))

  /** Unpivot (melt): the wide per-type columns back to long
    * (user_id, event_type, total) rows, null cells dropped — the
    * inverse of [[pivotUserValues]]. The native `unpivot` operator is
    * a single Expand pass: one scan, no union-of-selects, no join;
    * output rows = non-null cells.
    */
  def unpivotUserValues(wide: DataFrame, types: Seq[String]): DataFrame =
    wide.unpivot(Array(col("user_id")), types.map(col).toArray, "event_type", "total")
      .filter(col("total").isNotNull)

  /** CUBE over two dimensions — counts per (type, day), per type,
    * per day, and grand total in one Expand + hash-aggregate pass.
    */
  def cubeCounts(events: DataFrame): DataFrame =
    events.cube(col("event_type"), to_date(col("ts")).as("date"))
      .agg(count(lit(1)).as("n"))

  /** The tie-aware ranking family over one window: rank (gaps),
    * dense_rank (no gaps), percent_rank ((rank−1)/(n−1)) and cume_dist
    * (rows ≤ current / n). All four are functions of the ORDER KEY
    * alone, so ties make them deterministic across engines and
    * partitionings — unlike row_number/ntile, whose within-tie order
    * is arbitrary (q_topk_group pins row_number with a unique
    * tie-break key instead). One shuffle on the partition key; the
    * sort is per-partition.
    */
  def rankFamily(lineitem: DataFrame): DataFrame = {
    // All four functions are determined by (partition key, order key)
    // alone, so compute them at KEY-DISTINCT grain and broadcast-join
    // back: rank = 1 + rows strictly below, dense_rank = distinct-key
    // row_number, percent_rank/cume_dist from the same cumulative
    // counts. The fact table never sorts and never shuffles — vs the
    // direct window form, which plans one task per partition-key value
    // (3 here) each totally sorting its share, the thing that dies at
    // 100 TB. The distinct grain is |flags|×|quantities| (~150 rows);
    // if the order key were near-unique this degenerates to the
    // direct-window cost and the window form is no worse — the switch
    // point is key cardinality vs row count (docs/SCALE.md).
    val counts = lineitem.groupBy("l_returnflag", "l_quantity")
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val below = coalesce(
      sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val n = sum(col("__c")).over(Window.partitionBy("l_returnflag"))
    val ranked = counts.select(col("l_returnflag"), col("l_quantity"),
      (below + 1L).as("rnk"),
      row_number().over(w).cast("long").as("drnk"),
      when(n > 1L, below.cast("double") / (n - 1L).cast("double"))
        .otherwise(lit(0.0)).as("prnk"),
      ((below + col("__c")).cast("double") / n.cast("double")).as("cdist"))
    lineitem.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .join(broadcast(ranked), Seq("l_returnflag", "l_quantity"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("rnk"), col("drnk"), col("prnk"), col("cdist"))
  }

  /** GROUPING SETS — the general form CUBE/ROLLUP specialize: exactly
    * the requested grouping combinations, one Expand + hash-aggregate
    * pass (no union of separate scans). `gid` disambiguates which set
    * each row belongs to via `grouping()`, the standard way to tell a
    * stored NULL from a rolled-up one.
    */
  def groupingSetCounts(events: DataFrame): DataFrame = {
    val e = events.withColumn("d", to_date(col("ts")))
    e.groupingSets(
        Seq(Seq(col("event_type"), col("d")), Seq(col("event_type")), Seq()),
        col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"),
        (grouping(col("event_type")) * 2 + grouping(col("d"))).cast("long").as("gid"))
  }

  /** Hopping (sliding) event-time windows: `duration` windows
    * advancing every `slide`, so each event lands in duration/slide
    * windows — the batch twin of Structured Streaming's
    * `window(ts, d, s)`. Plans as one Expand (the per-event window
    * fan-out) + hash-aggregate: no self-join, no range join, output
    * rows = events × (d/s) pre-aggregation.
    */
  def hoppingCounts(events: DataFrame, duration: String = "1 day",
                    slide: String = "12 hours"): DataFrame =
    events.groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))

  /** Set intersection on a key domain: users who did both `a` and `b`. */
  def usersIntersect(events: DataFrame, a: String, b: String): DataFrame =
    events.filter(col("event_type") === a).select("user_id")
      .intersect(events.filter(col("event_type") === b).select("user_id"))

  /** Bag-semantics set ops (SQL EXCEPT ALL / INTERSECT ALL): per-row
    * multiplicity arithmetic, not membership — a user with 3 clicks
    * and 1 purchase keeps 2 rows under exceptAll, 1 under
    * intersectAll. Spark plans both as a single count-per-key
    * aggregate + generate (no join), one shuffle on the key — same
    * cost as the DISTINCT forms, unlike the naive
    * row_number-then-anti-join encoding.
    */
  def usersExceptAll(events: DataFrame, a: String, b: String): DataFrame =
    events.filter(col("event_type") === a).select("user_id")
      .exceptAll(events.filter(col("event_type") === b).select("user_id"))

  def usersIntersectAll(events: DataFrame, a: String, b: String): DataFrame =
    events.filter(col("event_type") === a).select("user_id")
      .intersectAll(events.filter(col("event_type") === b).select("user_id"))

  /** Ordered string aggregation (ANSI LISTAGG / string_agg with ORDER
    * BY): per group, the comma-joined sorted list of distinct member
    * values. Sorting INSIDE the aggregate value (`sort_array` over a
    * `collect_set`) keeps the result deterministic under any
    * partitioning — an unordered listagg is engine-arbitrary and can
    * never hash-compare. One hash-agg shuffle; the per-group array is
    * bounded by the group's distinct cardinality (here: ≤31 dates), so
    * buffer size is a data contract, not a scale hazard — unbounded
    * groups want the top-N or histogram forms instead (docs/SCALE.md).
    */
  def activeDaysAgg(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(array_join(sort_array(collect_set(to_date(col("ts")).cast("string"))), ",")
        .as("active_days"))

  /** Retention cohort matrix: users grouped by first-seen day, counted
    * on each later active day as an offset from their cohort day —
    * (cohort, offset, n_users), offset 0 being the cohort size. Two
    * user-grain aggregates (first-seen min, distinct active days) and
    * one join, all hash-partitioned on user_id so the join reuses the
    * aggregates' shuffle; the output is calendar² grain, tiny at any
    * scale. count(*) suffices after the join — (user, day) is distinct
    * and cohort is functionally dependent on user.
    */
  def retentionCohorts(events: DataFrame, maxOffset: Int = 30): DataFrame = {
    // ONE event-grain scan: cohort = min(day) is derivable from the
    // distinct (user, day) frame, so firstSeen rides active instead of
    // re-scanning the fact table; active materialized once for its two
    // consumers (cluster swap: persist(DISK_ONLY))
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .matBoundary
    val firstSeen = active.groupBy("user_id")
      .agg(min(col("day")).as("cohort"))
    active.join(firstSeen, "user_id")
      .select(col("cohort"), datediff(col("day"), col("cohort")).cast("long").as("offset"))
      .filter(col("offset") <= maxOffset)
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))
  }

  /** Two-step funnel conversion by cohort day: for each user's FIRST
    * `stepA` event, did a `stepB` event follow within `windowSec`
    * seconds? Emits (cohort, n_users, n_converted, conv_rate) at the
    * day-of-first-A grain. Strictly-after semantics (B at the same
    * instant as A does not convert — a funnel implies order). Shape:
    * one filtered agg per step, user-grain join (co-partitioned with
    * the aggs' own shuffle), then a calendar-grain rollup — the fact
    * table is read twice but never joined to itself at event grain.
    */
  def funnelConversion(events: DataFrame, stepA: String = "click",
                       stepB: String = "purchase",
                       windowSec: Long = 86400L): DataFrame = {
    // firstA feeds the conversion join AND the cohort rollup —
    // materialize the user-grain frame once (cluster swap:
    // persist(DISK_ONLY); user grain is small next to event grain)
    val firstA = events.filter(col("event_type") === stepA)
      .groupBy("user_id").agg(min(col("ts")).as("ts_a"))
      .matBoundary
    val conv = events.filter(col("event_type") === stepB)
      .join(firstA, "user_id")
      .filter(col("ts") > col("ts_a") &&
        col("ts") <= col("ts_a") + expr(s"INTERVAL $windowSec SECONDS"))
      .select("user_id").distinct()
      .withColumn("converted", lit(1L))
    firstA.join(conv, Seq("user_id"), "left_outer")
      .groupBy(to_date(col("ts_a")).as("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
      .withColumn("conv_rate",
        round(col("n_converted").cast("double") / col("n_users").cast("double"), 6))
  }

  /** Higher central moments per group — population skewness and excess
    * kurtosis of `value`:
    *
    *   skew = m₃ / m₂^1.5          kurt_excess = m₄ / m₂² − 3
    *
    * Computed TWO-PASS (per-group mean, broadcast back, then one hash
    * aggregate of centered powers) rather than by binomial expansion
    * of raw power sums: the one-pass expansion subtracts nearly-equal
    * O(μ⁴)-scale terms, and that catastrophic cancellation amplifies
    * each engine's own float-summation-order noise far past any
    * rounding — centered sums keep the relative error at machine
    * epsilon, which 6 dp rounding then absorbs. The explicit algebra
    * (not the builtin `skewness`/`kurtosis` names) is also what makes
    * the result engine-portable: builtins disagree across engines on
    * population-vs-sample convention. Cost: one extra scan; both
    * aggregates are mergeable partial+final hash aggs, the mean join
    * is broadcast (group-cardinality rows), so nothing new shuffles.
    */
  def valueMoments(events: DataFrame): DataFrame = {
    val mu = events.groupBy("event_type").agg(avg(col("value")).as("__mu"))
    val d = col("value") - col("__mu")
    events.join(broadcast(mu), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        avg(pow(d, 2)).as("m2"), avg(pow(d, 3)).as("m3"), avg(pow(d, 4)).as("m4"))
      .select(col("event_type"), col("n"),
        round(col("m3") / pow(col("m2"), 1.5), 6).as("skew"),
        round(col("m4") / pow(col("m2"), 2) - lit(3.0), 6).as("kurt_excess"))
  }

  /** Calendar-range trailing mean: avg over the previous `days`
    * CALENDAR days (rangeBetween on a day-number ordering), not the
    * previous N rows — differs from the row-frame form exactly when
    * dates have gaps.
    */
  def maCalendar(daily: DataFrame, days: Int): DataFrame = {
    val w = Window.partitionBy("asset")
      .orderBy(datediff(col("date"), lit("1970-01-01").cast("date")))
      .rangeBetween(-(days - 1), Window.currentRow)
    daily.select(col("date"), col("asset"), col("close"),
      avg("close").over(w).as(s"ma${days}_cal"))
  }

  /** As-of join: for each left row, the latest right row with
    * right.ts ≤ left.ts within the same key — point-in-time
    * correctness for feature/label joins. Implemented as
    * union → single window (last non-null) → filter back to left
    * rows: ONE shuffle on the key (verified — the plan has exactly one
    * Exchange), no per-row range scan, no cross-product — the shape
    * that survives 100 TB (a range join would explode; a per-key sort
    * is linear after the shuffle).
    *
    * Duplicate right timestamps resolve deterministically to the max
    * value: the sort order ends with the value column, and the
    * last-non-null frame picks the final (largest) one — equivalent
    * to pre-aggregating `max(value)` per (key, ts) without the extra
    * shuffle that groupBy would add. Right values must be non-null.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, tsCol: String, valueCol: String,
               asofPrefix: String = "asof_"): DataFrame = {
    val r = right.select(col(key), col(tsCol), col(valueCol).as("__rv"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r.select((Seq(key, tsCol, "__rv", "__side")).map(col): _*),
      allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts → "≤"
    // semantics; __rv last → dup right timestamps resolve to max value
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asofPrefix + valueCol, last("__rv", ignoreNulls = true).over(w))
      .withColumn(asofPrefix + "ts",
        last(when(col("__side") === 0, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__rv", "__side")
  }

  /** FULL OUTER join of two per-user activity aggregates — both null
    * sides preserved (users who only click AND users who only buy),
    * zero-filled. Both sides pre-aggregate to user grain BEFORE the
    * join (the same fact-side reduction as the left-outer variant), so
    * the join input is |users|, not |events|.
    */
  def fullOuterUserTotals(events: DataFrame, a: String = "click",
                          b: String = "purchase"): DataFrame = {
    val ca = events.filter(col("event_type") === a)
      .groupBy("user_id").agg(count(lit(1)).as("n_a"))
    val cb = events.filter(col("event_type") === b)
      .groupBy("user_id").agg(count(lit(1)).as("n_b"))
    ca.join(cb, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_a"), lit(0L)).as("n_" + a),
        coalesce(col("n_b"), lit(0L)).as("n_" + b))
  }

  /** Left ANTI join with payload: per-user `a`-activity for users with
    * NO `b` event above `bValueMin` (NOT EXISTS with a predicate on
    * the probed side). Unlike EXCEPT (set semantics, q_set_except) the
    * anti-join carries the left side's aggregate columns through; the
    * existence probe ships only distinct qualifying right keys.
    */
  def antiJoinUsers(events: DataFrame, a: String = "click",
                    b: String = "purchase", bValueMin: Double = 200.0): DataFrame = {
    val ca = events.filter(col("event_type") === a)
      .groupBy("user_id").agg(count(lit(1)).as("n_" + a))
    val kb = events.filter(col("event_type") === b && col("value") > bValueMin)
      .select("user_id").distinct()
    ca.join(kb, Seq("user_id"), "left_anti")
  }

  /** Exact heavy hitters: keys whose row share is ≥ `minShare`. Two
    * mergeable aggregates (per-key counts, then the 1-row total
    * broadcast back over the counts) — no driver collect, no sort.
    * The threshold multiplies in DOUBLE on both engines (the oracle
    * casts explicitly) so boundary keys resolve identically. The
    * single-pass constant-memory companion for exploratory use is
    * [[countMinSketchOf]]; this exact form is itself scale-safe —
    * the counts frame is |keys|, not |rows|.
    */
  def heavyHitters(df: DataFrame, keyCol: String, minShare: Double): DataFrame = {
    require(minShare > 0 && minShare <= 1, s"minShare in (0,1], got $minShare")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") >= lit(minShare) * col("__total"))
      .select(col(keyCol), col("n"),
        round(col("n") / col("__total"), 6).as("share"))
  }

  /** Count-min sketch of per-key frequencies — the single-pass,
    * constant-memory, MERGEABLE companion to [[heavyHitters]] (built
    * on Spark's `count_min_sketch` aggregate; Cormode & Muthukrishnan
    * '05). The sketch is width ⌈e/eps⌉ × depth ⌈ln(1/(1−confidence))⌉
    * counters regardless of data size; estimates overestimate by at
    * most eps·N with probability ≥ confidence (never underestimate).
    * Returned to the driver — the sketch IS a bounded summary; probe
    * it for any candidate key without another scan. The
    * ENGINE-PORTABLE twin is [[graft.ext.Sketches.countMinSketch]]
    * (X213): md5-lane counters as a DataFrame — distributed probes,
    * mergeable by union, and a cross-engine oracle, where this form's
    * bit layout is Spark-internal.
    */
  def countMinSketchOf(df: DataFrame, keyCol: String, eps: Double = 0.0001,
                       confidence: Double = 0.99, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = df.selectExpr(
      s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, $seed) AS s")
      .head().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  /** ORDER-INDEPENDENT table checksum (X216) — the replica-verification
    * handshake: two sides each compute one row over their own data and
    * compare (n_rows, checksum); equality means content-equality up to
    * the chosen columns' string forms, with no rows moved and no sort
    * anywhere. Per row: md5 over the columns'
    * unit-separator-joined string forms (u001f between columns, so
    * ("ab","c") differs from ("a","bc"); NULL renders as the u001e
    * sentinel, so (NULL,'a') differs from ('a',NULL));
    * the checksum SUMS two 32-bit hex windows of each digest as
    * DECIMAL(38,0) — addition commutes, so partitioning and row order
    * are irrelevant, and the md5-window contract makes it
    * engine-portable (the X187 move again). Collisions are
    * sum-of-random-64-bit-grade — fine for a drift DETECTOR; follow a
    * mismatch with [[graft.store.Warehouse.diffFrames]] for the rows.
    * Column string forms must be engine-stable: integers, strings,
    * dates are; raw doubles are NOT (format drift) — round or
    * fixed-point them first.
    */
  def tableChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    val h = md5(concat_ws("\u001f",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u001e"))): _*))
    df.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(conv(substring(col("h"), 1, 8), 16, 10)
          .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("sum_w0"),
        coalesce(sum(conv(substring(col("h"), 9, 8), 16, 10)
          .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("sum_w1"))
  }

  /** One-row key-skew report: distinct keys, total rows, the max key's
    * share, and the top-`topK` keys' combined share — the diagnostic
    * that decides between a plain shuffle join and the salted join
    * ([[saltedJoin]]) / AQE skew split at 100 TB. The top-K sum is
    * order-insensitive (ties at the boundary contribute the same
    * count either way), so it is engine-deterministic without any
    * tie-break contract.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val tot = counts.agg(count(lit(1)).as("n_keys"), sum(col("n")).as("total"),
      max(col("n")).as("__max_n"))
    val top = counts.orderBy(desc("n"), asc(keyCol)).limit(topK)
      .agg(sum(col("n")).as("__top_n"))
    tot.crossJoin(top).select(col("n_keys"), col("total"),
      round(col("__max_n") / col("total"), 6).as("max_share"),
      round(col("__top_n") / col("total"), 6).as(s"top${topK}_share"))
  }

  /** Calendar gap-fill + forward-fill — the pandas
    * `asfreq('D').ffill()` resample the reference's stack gets for
    * free, as a declarative plan: per-asset calendar spine
    * (`sequence(min, max, 1 day)` exploded from a 1-row-per-asset
    * agg — the spine costs |assets| agg rows, not a shuffle of the
    * data), LEFT join of the observed days onto the spine, then
    * last-non-null carry-forward over a running window. One shuffle
    * on asset for the window; `was_gap` marks synthesized rows.
    * Leading gaps (before an asset's first observation) stay NULL —
    * ffill has nothing to carry.
    */
  def calendarFill(observed: DataFrame): DataFrame = {
    val spine = observed.groupBy("asset")
      .agg(min(col("date")).as("__mn"), max(col("date")).as("__mx"))
      .select(col("asset"),
        explode(sequence(col("__mn"), col("__mx"), expr("INTERVAL 1 DAY"))).as("date"))
    val w = Window.partitionBy("asset").orderBy("date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq("asset", "date"), "left")
      .select(col("date"), col("asset"),
        last(col("close"), ignoreNulls = true).over(w).as("close_ffill"),
        col("close").isNull.as("was_gap"))
  }

  /** Pairwise Pearson correlation of daily returns across assets:
    * (asset_a < asset_b, n overlapping days, corr). Returns come from
    * one per-asset window pass; the pair grid is a self-equi-join on
    * date — k assets make k·(k−1)/2 pairs per day, so the join output
    * is tiny relative to the input and the `corr` hash-agg is
    * mergeable. At 100 TB the daily table is already the reduced tier
    * (one row per asset-day), so the date join never touches raw
    * ticks; for thousands of assets the same shape holds with the
    * date-keyed join shuffling the slim (date, asset, ret) triple.
    */
  def corrMatrix(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    // rets feeds both self-join sides — materialize once so the
    // tick-grain daily aggregate upstream doesn't run twice
    val rets = daily.select(col("date"), col("asset"),
      (col("close") / lag(col("close"), 1).over(w) - 1).as("ret"))
      .filter(col("ret").isNotNull)
      .matBoundary
    rets.as("x").join(rets.as("y"),
        col("x.date") === col("y.date") && col("x.asset") < col("y.asset"))
      .groupBy(col("x.asset").as("asset_a"), col("y.asset").as("asset_b"))
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("x.ret"), col("y.ret")), 6).as("ret_corr"))
  }

  /** The offset/positional window-function surface over daily closes:
    * lead, multi-row lag, first_value, and nth_value on the running
    * frame — each NULL exactly where the offset/position falls outside
    * the partition (SQL semantics, mirrored by the oracle).
    */
  def windowOffsets(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy("asset").orderBy("date")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("date"), col("asset"), col("close"),
      lead(col("close"), 1).over(w).as("next_close"),
      lag(col("close"), 7).over(w).as("close_7ago"),
      first_value(col("close")).over(wRun).as("first_close"),
      nth_value(col("close"), 3).over(wRun).as("third_close"))
  }

  /** Slowly-changing-dimension Type 2 history build: collapse a keyed
    * change stream to one row per VALUE RUN with
    * [effective_from, effective_to) validity and an is_current flag —
    * the warehouse-standard way to keep dimension history queryable
    * with an as-of predicate.
    *
    * Two window passes over the same (key, ts) partitioning — ONE
    * shuffle total (the second window reuses the first's ordering):
    * pass 1 drops rows whose attribute equals the previous row's
    * (run-length collapse, null-safe via `<=>`), pass 2 closes each
    * survivor with the NEXT survivor's ts. `tieCol` breaks equal-ts
    * ties deterministically. Output grain = number of value CHANGES —
    * at 100 TB typically orders of magnitude below the event grain,
    * and everything before the collapse is a per-partition window,
    * never a join.
    */
  def scdType2(changes: DataFrame, keyCols: Seq[String], attrCol: String,
               tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val collapsed = changes
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      // partition head + every null-safe value change survives
      .filter(col("rn") === 1 || !(col("prev_attr") <=> col(attrCol)))
      .drop("rn", "prev_attr")
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    collapsed.select(
      (keyCols.map(col) :+ col(attrCol) :+
        col(tsCol).as("effective_from") :+
        lead(col(tsCol), 1).over(w2).as("effective_to") :+
        lead(col(tsCol), 1).over(w2).isNull.as("is_current")): _*)
  }

  /** Population Stability Index per event_type between a reference
    * period (ts < `splitTs`) and the current period — the standard
    * drift monitor for a feature distribution. Buckets are the
    * reference period's exact deciles (6-dp rounded so both engines
    * bucket on identical cutpoints), plus the two open tails; each
    * period's bucket shares are additively smoothed
    * (p = (n+0.5)/(N+5)) so an empty bucket contributes a finite
    * term instead of ln 0. PSI = Σ_b (p_cur−p_ref)·ln(p_cur/p_ref).
    *
    * Shape: cutpoints are a |types|-row agg broadcast back; bucketing
    * is a 9-element array probe per row inside the scan; the full
    * type×period×bucket spine is generated (not discovered) so
    * zero-count buckets exist before smoothing. One event-grain
    * shuffle (the bucket count agg, map-side partial); everything
    * after is |types|×20 rows. At 100 TB swap the exact decile agg
    * for `approx_percentile` — the spine/smoothing algebra is
    * unchanged.
    */
  def psiDrift(events: DataFrame, splitTs: String = "2024-01-16"): DataFrame = {
    val split = lit(splitTs).cast("timestamp")
    // cuts feeds the bucket join AND the spine — materialize the
    // |event types|-row frame once so the reference-period scan and
    // exact-percentile aggregate don't run per consumer
    val cuts = events.filter(col("ts") < split)
      .groupBy("event_type")
      .agg(transform(
        expr("percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"),
        c => round(c, 6)).as("cuts"))
      .matBoundary
    val counts = events
      .join(broadcast(cuts), "event_type")
      .withColumn("period", when(col("ts") < split, "ref").otherwise("cur"))
      .withColumn("bucket",
        size(filter(col("cuts"), c => c <= col("value"))).cast("long"))
      .groupBy("event_type", "period", "bucket").agg(count(lit(1)).as("n"))
    val spine = cuts.select("event_type")
      .withColumn("period", explode(array(lit("ref"), lit("cur"))))
      .withColumn("bucket", explode(sequence(lit(0L), lit(9L))))
    val shares = spine
      .join(counts, Seq("event_type", "period", "bucket"), "left_outer")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("tot", sum("n").over(
        Window.partitionBy("event_type", "period")))
      .withColumn("p", (col("n") + 0.5) / (col("tot") + 5.0))
    shares.groupBy("event_type", "bucket")
      .agg(max(when(col("period") === "ref", col("p"))).as("p_ref"),
        max(when(col("period") === "cur", col("p"))).as("p_cur"))
      .withColumn("term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      .groupBy("event_type")
      .agg(round(sum("term"), 6).as("psi"))
  }

  /** Global z-score anomaly flags: each event scored against its
    * event_type's full-period mean/stddev, flagged when |z| (6-dp
    * rounded, so the comparison is engine-deterministic) exceeds
    * `zMax`. The one-pass batch form of a streaming monitor; per-type
    * stats are a mergeable |types|-row agg broadcast back, the scoring
    * is per-row inside the scan, zero event-grain shuffles.
    */
  def anomalyFlags(events: DataFrame, zMax: Double = 3.0): DataFrame = {
    val stats = events.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
    events.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 6))
      .filter(abs(col("z")) > zMax)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
  }

  /** Winsorize: clip each value into its group's [p_lo, p_hi]
    * percentile band — the robust feature normalization that keeps
    * outlier rows (vs [[anomalyFlags]], which reports them) so
    * downstream stats aren't dominated by a few extreme ticks.
    *
    * 100 TB shape: the exact percentile pass materializes each
    * group's values (fine at |types| groups); past ~10⁷ values/group
    * swap `percentile` for `approx_percentile` — the clip itself is
    * unchanged (docs/SCALE.md switch table). Cuts are a |groups|-row
    * broadcast; clipping runs per-row inside the scan, zero
    * event-grain shuffles.
    */
  def winsorize(events: DataFrame, lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val cuts = events.groupBy("event_type").agg(
      expr(s"percentile(value, $lo)").as("p_lo"),
      expr(s"percentile(value, $hi)").as("p_hi"))
    events.join(broadcast(cuts), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        round(least(greatest(col("value"), col("p_lo")), col("p_hi")), 6).as("value_w"))
  }

  /** Daily event-RATE spikes: each (type, day) count scored against
    * the type's distribution of daily counts — the aggregate-grain
    * sibling of [[anomalyFlags]] (value outliers) for volume
    * monitoring: a crawler gone hot, a source gone dark.
    *
    * 100 TB shape: one partial-aggregable count collapses the event
    * grain to |types|×|days| rows; the stats and z-scoring all run at
    * calendar grain. Zero event-grain shuffles beyond the count agg.
    */
  def rateSpikes(events: DataFrame, zMax: Double = 2.0): DataFrame = {
    val daily = events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type")
      .agg(avg("n").as("mu"), stddev_samp(col("n")).as("sigma"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("n") - col("mu")) / col("sigma"), 6))
      .filter(abs(col("z")) > zMax)
      .select("event_type", "day", "n", "z")
  }

  /** Per-group OLS trend fit of value on time (epoch days):
    * slope/intercept/r² via the SQL linear-regression aggregates.
    * All three are functions of the same five partial-aggregable sums
    * (n, Σx, Σy, Σxy, Σx²), so the 100 TB shape is ONE map-side-
    * combined pass over the fact grain and a |groups|-row result — no
    * window, no join, no second scan. 6-dp rounding keeps the float
    * compare engine-deterministic (same discipline as [[groupStats]]).
    */
  def trendFit(events: DataFrame): DataFrame = {
    val t = (col("ts").cast("double") / lit(86400.0)).as("t")
    events.select(col("event_type"), col("value"), t)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("regr_slope(value, t)"), 6).as("slope"),
        round(expr("regr_intercept(value, t)"), 6).as("intercept"),
        round(expr("regr_r2(value, t)"), 6).as("r2"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: count and conditional probability of each
    * (prev_type → next_type) step, ordered by (ts, event_id) within
    * user. The classic user-journey / curriculum-sequencing profile.
    *
    * 100 TB shape: the lag needs events clustered by user — ONE
    * shuffle+sort at event grain (unavoidable: adjacency is defined
    * per user) feeding a partial-aggregable pair count; the
    * probability normalization then runs on the |types|² aggregate,
    * never back on the event grain.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val steps = events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
    steps.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("prev_type")), 6))
  }

  /** Fixed-width numeric histogram per group: `bins` equal-width
    * buckets between the group's min and max (max lands in the last
    * bucket). The standard distribution profile for feature/QA
    * dashboards, exact — the approximate siblings are
    * [[valueQuantilesApprox]] / count-min.
    *
    * 100 TB shape: two passes over the fact grain, both partial-
    * aggregable — a |groups|-row min/max agg broadcast back, then
    * bucket-assign inside the scan and a map-side-combined
    * (group, bin) count. Zero event-grain shuffles. Bin edges are
    * computed in the same IEEE double expression order on both
    * engines, so bucket assignment is compare-exact.
    */
  def valueHistogram(events: DataFrame, bins: Int = 20): DataFrame = {
    val b = events.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    events.join(broadcast(b), "event_type")
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / lit(bins))),
            lit(bins - 1L)).cast("long")))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
  }
}
