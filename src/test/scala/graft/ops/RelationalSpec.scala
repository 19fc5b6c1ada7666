package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: at-or-before match, ties take same-instant right row, no-match is null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0), // before any right row
      (2L, ts("2024-01-01 11:00:00"), 7L, 2.0), // exactly at right ts → match it
      (3L, ts("2024-01-01 12:30:00"), 7L, 3.0), // between rights → earlier one
      (4L, ts("2024-01-01 15:00:00"), 8L, 4.0)  // other key
    ).toDF("event_id", "ts", "user_id", "value")
    val right = Seq(
      (7L, ts("2024-01-01 11:00:00"), 100.0),
      (7L, ts("2024-01-01 12:00:00"), 200.0),
      (8L, ts("2024-01-01 14:00:00"), 300.0)
    ).toDF("user_id", "ts", "value")
    val out = Relational.asofJoin(left, right, "user_id", "ts", "value")
      .orderBy("event_id")
      .select("event_id", "asof_value", "asof_ts")
      .collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getDouble(1) === 100.0 && out(1).getTimestamp(2) === ts("2024-01-01 11:00:00"))
    assert(out(2).getDouble(1) === 200.0 && out(2).getTimestamp(2) === ts("2024-01-01 12:00:00"))
    assert(out(3).getDouble(1) === 300.0)
  }

  test("asofJoin: duplicate right timestamps deterministically resolve to max value") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 7L, 0.0)).toDF("event_id", "ts", "user_id", "value")
    val right = Seq(
      (7L, ts("2024-01-01 11:00:00"), 5.0),
      (7L, ts("2024-01-01 11:00:00"), 9.0)
    ).toDF("user_id", "ts", "value")
    val out = Relational.asofJoin(left, right, "user_id", "ts", "value").collect()
    assert(out.head.getAs[Double]("asof_value") === 9.0)
  }

  test("sessionize: gap strictly greater than gapSec starts a new session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (2L, ts("2024-01-01 10:30:00"), 7L), // exactly 1800s → same session
      (3L, ts("2024-01-01 11:00:01"), 7L), // 1801s → new session
      (4L, ts("2024-01-01 10:00:00"), 8L)
    ).toDF("event_id", "ts", "user_id")
    val out = Relational.sessionize(df, 1800L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_events") === 2) // user 7 session 0
    assert(out(1).getAs[Long]("n_events") === 1) // user 7 session 1
    assert(out(2).getAs[Long]("n_events") === 1) // user 8
    assert(out(0).getAs[Timestamp]("session_end") === ts("2024-01-01 10:30:00"))
  }

  test("hoppingCounts: each event lands in exactly duration/slide windows") {
    val events = Seq(
      (1L, "click", ts("2024-01-01 06:00:00")),  // windows 2023-12-31 12:00 and 2024-01-01 00:00
      (2L, "click", ts("2024-01-01 18:00:00")))  // windows 2024-01-01 00:00 and 12:00
      .toDF("event_id", "event_type", "ts")
    val out = Relational.hoppingCounts(events)
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2))).sorted
    assert(out.toSeq === Seq(
      ("2023-12-31 12:00:00.0", 1L), ("2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 12:00:00.0", 1L)))
  }

  test("customerOrderCounts: never-ordered customers survive with zero") {
    val customer = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val out = Relational.customerOrderCounts(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(out.toSeq === Seq((1L, 2L), (2L, 0L), (3L, 1L)))
  }

  test("unpivot inverts pivot: long rows equal the direct grouped sums, nulls dropped") {
    val events = Seq(
      (1L, "click", 1.5), (1L, "click", 2.5), (1L, "view", 3.0),
      (2L, "view", 4.0)) // user 2 never clicks → null cell → dropped
      .map { case (u, t, v) => (u, t, v, ts("2024-01-01 10:00:00")) }
      .toDF("user_id", "event_type", "value", "ts")
    val types = Seq("click", "view")
    val long = Relational.unpivotUserValues(
        Relational.pivotUserValues(events, types), types)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    assert(long.toSeq === Seq((1L, "click", 4.0), (1L, "view", 3.0), (2L, "view", 4.0)))
  }

  test("usersExcept is set difference with distinct semantics") {
    val df = Seq(
      (1L, "click", 1L), (2L, "click", 1L), (3L, "click", 2L),
      (4L, "purchase", 2L), (5L, "purchase", 3L)
    ).toDF("event_id", "event_type", "user_id")
    val out = Relational.usersExcept(df, "click", "purchase").as[Long].collect().sorted
    assert(out.toSeq === Seq(1L))
  }

  test("topKPerGroup: k rows per group, value desc, deterministic ties") {
    val df = Seq(
      (1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 1.0), (4L, "b", 2.0)
    ).toDF("event_id", "event_type", "value")
    val out = Relational.topKPerGroup(df, 2).orderBy("event_type", "rank").collect()
    assert(out.map(_.getAs[Long]("event_id")).toSeq === Seq(1L, 2L, 4L))
  }

  test("broadcast join plan: fact side has no shuffle before the join") {
    val orders = Seq((1L, 10L, 100.0)).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, "c", 1L)).toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((1L, "DE", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val plan = Relational.revenueByNation(orders, customer, nation)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("approx percentiles are within the sketch's rank-error of exact (sf0.01 events)") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val exact = Relational.valueQuantiles(events).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = Relational.valueQuantilesApprox(events, accuracy = 10000).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // accuracy=10000 → rank error ≤ n/10000; with ~2000 values/group the
    // sketch is exact up to interpolation — allow a small value tolerance
    exact.foreach { case (g, (p50, p90, p99)) =>
      val (a50, a90, a99) = approx(g)
      assert(math.abs(a50 - p50) <= math.abs(p50) * 0.02 + 0.05, s"$g p50 $a50 vs $p50")
      assert(math.abs(a90 - p90) <= math.abs(p90) * 0.02 + 0.05, s"$g p90 $a90 vs $p90")
      assert(math.abs(a99 - p99) <= math.abs(p99) * 0.02 + 0.05, s"$g p99 $a99 vs $p99")
    }
  }

  test("approx distinct is within 3·rsd of exact per group (sf0.01 events)") {
    // teeth for the oracle-less q_approx_distinct: the HLL estimate at
    // rsd=0.02 must sit within 3 standard errors of the exact count
    // for EVERY group — a broken sketch config would blow straight
    // past that
    val events = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val rsd = 0.02
    val exact = Relational.distinctUsers(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Relational.approxDistinctUsers(events, rsd)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (g, n) =>
      assert(math.abs(approx(g) - n) <= math.max(3 * rsd * n, 1),
        s"group $g: approx ${approx(g)} vs exact $n exceeds 3·rsd")
    }
  }

  test("to_json/from_json round-trip preserves nested struct fields incl. nulls") {
    // coverage moved out of q_json_struct (which now parses only the
    // real props payload): serialize a nested struct per row, reparse
    // with an explicit schema, and require field-exact equality
    val df = Seq(
      (1L, Some("click"), Some(1.5)),
      (2L, None, Some(-0.25)),
      (3L, Some("view"), None)
    ).toDF("uid", "et", "v")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "who STRUCT<uid: BIGINT, et: STRING>, v DOUBLE")
    val rt = df.select(from_json(
        to_json(struct(struct(col("uid"), col("et")).as("who"), col("v"))),
        schema).as("n"))
      .select(col("n.who.uid").as("uid"), col("n.who.et").as("et"), col("n.v").as("v"))
    assert(rt.collect().toSet === df.collect().toSet)
  }

  test("groupStats: exact co-moments on a linear-drift fixture") {
    // price = 10·t_days + 5 exactly → corr 1, covar/var relationships known
    val day = 86400L
    val rows = (0 until 4).map(i =>
      (new Timestamp(i * day * 1000L), "X", 10.0 * i + 5.0))
    val df = rows.toDF("ts_utc", "asset", "price")
    val out = Relational.groupStats(df).head()
    assert(out.getString(0) === "X" && out.getLong(1) === 4L)
    assert(out.getDouble(2) === 20.0)          // mean of 5,15,25,35
    // var_samp(price) = 100·var_samp(t days) = 100·(5/3); sd = sqrt
    assert(math.abs(out.getDouble(3) - math.sqrt(100.0 * 5.0 / 3.0)) < 1e-6)
    assert(out.getDouble(4) === 1.0)           // perfectly linear
    // covar_samp(price, t) = 10·var_samp(t) = 10·(5/3)
    assert(math.abs(out.getDouble(5) - 10.0 * 5.0 / 3.0) < 1e-6)
  }

  test("corrMatrix: perfectly correlated and anti-correlated return series") {
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    // A and B move proportionally (corr +1); C moves opposite in sign
    val a = Seq(100.0, 110.0, 104.5, 125.4)
    val b = a.map(_ * 2)                       // identical returns
    val c = Seq(100.0, 90.0, 94.5, 75.6)       // opposite-sign returns
    val daily = (1 to 4).flatMap(i => Seq(
      (d(i), "A", a(i - 1)), (d(i), "B", b(i - 1)), (d(i), "C", c(i - 1))))
      .toDF("date", "asset", "close")
    val out = Relational.corrMatrix(daily).orderBy("asset_a", "asset_b").collect()
    val s = out.head.schema
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getDouble(s.fieldIndex("ret_corr"))).toMap
    assert(out.forall(_.getLong(s.fieldIndex("n_days")) == 3L))
    assert(m(("A", "B")) === 1.0)
    assert(m(("A", "C")) < 0)
  }

  test("windowOffsets: offsets NULL outside the partition, nth_value needs 3 rows") {
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    val daily = (1 to 9).map(i => (d(i), "X", 100.0 + i)).toDF("date", "asset", "close")
    val out = Relational.windowOffsets(daily).orderBy("date").collect()
    val s = out.head.schema
    assert(out(8).isNullAt(s.fieldIndex("next_close")))          // last row: no lead
    assert(out(0).getDouble(s.fieldIndex("next_close")) === 102.0)
    (0 until 7).foreach(i => assert(out(i).isNullAt(s.fieldIndex("close_7ago"))))
    assert(out(7).getDouble(s.fieldIndex("close_7ago")) === 101.0)
    out.foreach(r => assert(r.getDouble(s.fieldIndex("first_close")) === 101.0))
    assert(out(1).isNullAt(s.fieldIndex("third_close")))
    assert(out(2).getDouble(s.fieldIndex("third_close")) === 103.0)
  }

  test("heavyHitters: only keys at/above the share threshold survive") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++ (1 to 15).map(i => s"u$i"))
      .toDF("k")
    val out = Relational.heavyHitters(df, "k", 0.2).orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("hot", "warm"))
    val hot = out.head
    assert(hot.getLong(1) === 60L && hot.getDouble(2) === 0.6)
  }

  test("keySkew: max and top-K shares on a known distribution") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(15)("c") ++ Seq.fill(5)("d"))
      .toDF("k")
    val r = Relational.keySkew(df, "k", topK = 2).collect().head
    val s = r.schema
    assert(r.getLong(s.fieldIndex("n_keys")) === 4L)
    assert(r.getLong(s.fieldIndex("total")) === 100L)
    assert(r.getDouble(s.fieldIndex("max_share")) === 0.5)
    assert(r.getDouble(s.fieldIndex("top2_share")) === 0.8)
  }

  test("countMinSketchOf: estimates never undercount, bounded overcount") {
    val df = (Seq.fill(500)(7L) ++ Seq.fill(100)(8L) ++ (1L to 400L)).toDF("k")
    val n = 1000L
    val eps = 0.01
    val cms = Relational.countMinSketchOf(df, "k", eps = eps, confidence = 0.99)
    assert(cms.estimateCount(7L) >= 500L)
    assert(cms.estimateCount(8L) >= 100L)
    assert(cms.estimateCount(7L) <= 500L + (eps * n).toLong + 1)
    assert(cms.estimateCount(8L) <= 100L + (eps * n).toLong + 1)
  }

  test("scdType2: runs collapse, validity intervals chain, nulls collapse too") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      // key (u1, dim): A A B A — middle repeat collapses, A reappearing opens a NEW run
      (1L, "dim", t("2024-01-01 00:00:00"), 1L, Some("A")),
      (1L, "dim", t("2024-01-02 00:00:00"), 2L, Some("A")),
      (1L, "dim", t("2024-01-03 00:00:00"), 3L, Some("B")),
      (1L, "dim", t("2024-01-04 00:00:00"), 4L, Some("A")),
      // key (2, dim): null → null → X (null run collapses via <=>)
      (2L, "dim", t("2024-01-01 00:00:00"), 5L, None),
      (2L, "dim", t("2024-01-02 00:00:00"), 6L, None),
      (2L, "dim", t("2024-01-03 00:00:00"), 7L, Some("X")))
      .toDF("user_id", "event_type", "ts", "event_id", "attr")
    val out = Relational.scdType2(changes, Seq("user_id", "event_type"),
        "attr", "ts", "event_id")
      .orderBy("user_id", "effective_from").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getString(2), r.getTimestamp(3).toString.take(10),
        if (r.isNullAt(4)) "open" else r.getTimestamp(4).toString.take(10), r.getBoolean(5)))
    assert(u1.toSeq === Seq(
      ("A", "2024-01-01", "2024-01-03", false),
      ("B", "2024-01-03", "2024-01-04", false),
      ("A", "2024-01-04", "open", true)))
    val u2 = out.filter(_.getLong(0) == 2L)
      .map(r => (Option(r.getString(2)), r.getBoolean(5)))
    assert(u2.toSeq === Seq((None, false), (Some("X"), true)))
  }

  test("calendarFill: spine completes the calendar, ffill carries last close, leading gap stays null") {
    def d(i: Int) = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, i))
    val observed = Seq(
      (d(2), "X", 10.0), (d(5), "X", 20.0),  // gap 3,4; leading day 2 is the min
      (d(1), "Y", 1.0), (d(2), "Y", 2.0))
      .toDF("date", "asset", "close")
    val out = Relational.calendarFill(observed).orderBy("asset", "date").collect()
    val s = out.head.schema
    val x = out.filter(_.getString(s.fieldIndex("asset")) == "X")
    assert(x.length === 4) // days 2..5
    assert(x.map(_.getDate(s.fieldIndex("date")).toString).toSeq ===
      Seq("2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05"))
    assert(x.map(_.getDouble(s.fieldIndex("close_ffill"))).toSeq === Seq(10.0, 10.0, 10.0, 20.0))
    assert(x.map(_.getBoolean(s.fieldIndex("was_gap"))).toSeq === Seq(false, true, true, false))
    val y = out.filter(_.getString(s.fieldIndex("asset")) == "Y")
    assert(y.length === 2 && y.forall(!_.getBoolean(s.fieldIndex("was_gap"))))
  }
  test("exceptAll/intersectAll: multiset multiplicity arithmetic") {
    // user 1: 3 clicks, 1 purchase -> exceptAll keeps 2, intersectAll 1
    // user 2: 1 click, 2 purchases -> exceptAll keeps 0, intersectAll 1
    // user 3: purchases only      -> neither
    val df = Seq(
      (1L, "click", 1L), (2L, "click", 1L), (3L, "click", 1L), (4L, "purchase", 1L),
      (5L, "click", 2L), (6L, "purchase", 2L), (7L, "purchase", 2L),
      (8L, "purchase", 3L)
    ).toDF("event_id", "event_type", "user_id")
    val ex = Relational.usersExceptAll(df, "click", "purchase").as[Long].collect().sorted
    assert(ex.toSeq === Seq(1L, 1L))
    val in = Relational.usersIntersectAll(df, "click", "purchase").as[Long].collect().sorted
    assert(in.toSeq === Seq(1L, 2L))
  }

  test("activeDaysAgg: sorted comma-joined distinct days, any partitioning") {
    val df = Seq(
      (1L, "click", ts("2024-01-03 10:00:00"), 1L),
      (2L, "click", ts("2024-01-01 10:00:00"), 1L),
      (3L, "click", ts("2024-01-01 23:00:00"), 2L),
      (4L, "purchase", ts("2024-01-02 00:00:00"), 1L)
    ).toDF("event_id", "event_type", "ts", "user_id")
    def run(np: Int) = Relational.activeDaysAgg(df.repartition(np))
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val expected = Seq("click" -> "2024-01-01,2024-01-03", "purchase" -> "2024-01-02")
    assert(run(1) === expected)
    assert(run(5) === expected)
  }

  test("valueMoments: hand-computed skew/kurtosis per group") {
    val df = ((1 to 5).map(v => ("a", v.toDouble)) ++
      Seq(("b", 1.0), ("b", 1.0), ("b", 1.0), ("b", 7.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("event_id", "event_type", "value")
    val out = Relational.valueMoments(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a: symmetric 1..5 -> skew 0; m2=2, m4=6.8 -> kurt 6.8/4-3 = -1.3
    assert(out("a") === ((5L, 0.0, -1.3)))
    // b: {1,1,1,7} -> m2=6.75, m3=20.25, m4=106.3125
    //    skew = 20.25/6.75^1.5 = sqrt(4/3); kurt = 106.3125/45.5625-3
    assert(out("b") === ((4L, 1.154701, -0.666667)))
  }

  test("retentionCohorts: offsets from first-seen day, offset 0 is cohort size") {
    val df = Seq(
      (1L, "click", ts("2024-01-01 10:00:00"), 1L),
      (2L, "click", ts("2024-01-02 10:00:00"), 1L),
      (3L, "click", ts("2024-01-04 10:00:00"), 1L),
      (4L, "click", ts("2024-01-04 12:00:00"), 1L), // same day: no double count
      (5L, "click", ts("2024-01-02 09:00:00"), 2L)
    ).toDF("event_id", "event_type", "ts", "user_id")
    val out = Relational.retentionCohorts(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("funnelConversion: strictly-after B within the window, per first-A cohort") {
    val df = Seq(
      (1L, "click", ts("2024-01-01 10:00:00"), 1L),    // converts (+10 min)
      (2L, "purchase", ts("2024-01-01 10:10:00"), 1L),
      (3L, "click", ts("2024-01-01 11:00:00"), 2L),    // same-instant B: no
      (4L, "purchase", ts("2024-01-01 11:00:00"), 2L),
      (5L, "click", ts("2024-01-01 12:00:00"), 3L),    // B after window: no
      (6L, "purchase", ts("2024-01-03 12:00:00"), 3L),
      (7L, "click", ts("2024-01-01 13:00:00"), 4L),    // no B at all
      (8L, "purchase", ts("2024-01-01 09:00:00"), 5L)  // B only: not in funnel
    ).toDF("event_id", "event_type", "ts", "user_id")
    val out = Relational.funnelConversion(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("2024-01-01", 4L, 1L, 0.25)))
  }

  test("psiDrift: unchanged distribution scores 0; a shifted one scores higher") {
    // 'flat': identical values in both periods -> every bucket count
    // matches -> psi exactly 0. 'shift': cur values jump above every
    // ref decile -> mass concentrates in the top bucket.
    val vals = (1 to 100).map(_.toDouble)
    val flat =
      vals.map(v => ("flat", ts("2024-01-10 00:00:00"), v)) ++
      vals.map(v => ("flat", ts("2024-01-20 00:00:00"), v))
    val shift =
      vals.map(v => ("shift", ts("2024-01-10 00:00:00"), v)) ++
      vals.map(v => ("shift", ts("2024-01-20 00:00:00"), v + 1000.0))
    val df = (flat ++ shift).zipWithIndex
      .map { case ((t, time, v), i) => (i.toLong, t, time, v) }
      .toDF("event_id", "event_type", "ts", "value")
    val out = Relational.psiDrift(df, "2024-01-16").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("flat") === 0.0)
    assert(out("shift") > 1.0) // total drift; conventional alert is >0.2
  }
  test("anomalyFlags: only |z| above the threshold survives, z vs hand stats") {
    val base = (1 to 50).flatMap(_ => Seq(10.0, 12.0)) // mean 11, tight spread
    val df = (base :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "m", ts("2024-01-01 00:00:00"), v) }
      .toDF("event_id", "event_type", "ts", "value")
    val out = Relational.anomalyFlags(df).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 1000.0)
    assert(out.head.getDouble(3) > 3.0)
  }

  test("winsorize: values clip to the group band, interior values untouched") {
    val df = (1 to 100).map(i => (i.toLong, "g", ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Relational.winsorize(df, 0.1, 0.9).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // exact percentile at p=0.1/0.9 over 1..100: 10.9 and 90.1
    assert(out(1L) === 10.9 && out(5L) === 10.9, "low tail clips to p10")
    assert(out(100L) === 90.1 && out(95L) === 90.1, "high tail clips to p90")
    assert(out(50L) === 50.0, "interior untouched")
  }

  test("rateSpikes: a hot day flags, steady days don't") {
    val day = 86400L * 1000L
    // type "s": 10 events/day for 9 days, 100 on day 10 → one spike
    val df = (0 until 9).flatMap(d => (0 until 10).map(i =>
        ((d * 100 + i).toLong, "s", new Timestamp(d * day), 1.0))) ++
      (0 until 100).map(i => ((900 + i).toLong, "s", new Timestamp(9 * day), 1.0))
    val out = Relational.rateSpikes(df.toDF("event_id", "event_type", "ts", "value")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 100L && out.head.getDouble(3) > 2.0)
  }

  test("trendFit: exact slope/intercept/r2 on a perfectly linear series") {
    // value = 2*t + 5 with t in epoch days → slope 2, intercept 5, r2 1
    val day = 86400L
    val df = (0 to 9).map { i =>
      (i.toLong, "lin", new Timestamp(i * day * 1000L), 2.0 * i + 5.0)
    }.toDF("event_id", "event_type", "ts", "value")
    val r = Relational.trendFit(df).collect().head
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 2.0)
    assert(r.getDouble(3) === 5.0)
    assert(r.getDouble(4) === 1.0)
  }

  test("eventTransitions: counts follow per-user adjacency, probabilities sum to 1") {
    // user 1: a→b→a ; user 2: a→b — transitions: a→b ×2, b→a ×1
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "a"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "a"),
      (5L, ts("2024-01-01 10:01:00"), 2L, "b")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Relational.eventTransitions(df)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("a", "b")) === ((2L, 1.0)))
    assert(out(("b", "a")) === ((1L, 1.0)))
    assert(out.size === 2, "no cross-user transition may appear")
  }

  test("valueHistogram: bins partition the count, max lands in last bin, constant group safe") {
    val df = ((0 to 99).map(i => (i.toLong, "u", ts("2024-01-01 00:00:00"), i.toDouble)) ++
      (100 to 104).map(i => (i.toLong, "c", ts("2024-01-01 00:00:00"), 7.0)))
      .toDF("event_id", "event_type", "ts", "value")
    val out = Relational.valueHistogram(df, bins = 10)
    val u = out.filter(col("event_type") === "u").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(u.values.sum === 100L)
    assert(u.keySet === (0L to 9L).toSet && u.values.forall(_ === 10L),
      s"uniform 0..99 over 10 bins must be flat: $u")
    val c = out.filter(col("event_type") === "c").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(c === Map(0L -> 5L), "constant group goes wholly to bin 0")
  }

}
