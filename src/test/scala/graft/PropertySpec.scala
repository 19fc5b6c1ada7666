package graft

import graft.ext.Dedup
import graft.ops.{Indicators, Ohlc, Relational}
import graft.store.Warehouse
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5) over scalacheck-generated
  * inputs — each property is the algebraic law the operator must
  * satisfy, not an example. Deterministic seeds so failures reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Draw `n` deterministic samples from a generator. */
  private def forAll[A](gen: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(40), Seed(42L + i)).foreach(f)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val priceSeries: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(1.0, 1000.0))

  test("OHLC invariants: low ≤ min(open,close) ≤ max(open,close) ≤ high; endpoints by ts order") {
    forAll(priceSeries) { prices =>
      val rows = prices.zipWithIndex.map { case (p, i) =>
        (new Timestamp(86400000L + i * 3600000L), "A", p)
      }
      val ohlc = Ohlc.daily(rows.toDF("ts_utc", "asset", "price")).collect()
      ohlc.foreach { r =>
        val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"))
        assert(l <= math.min(o, c) && math.max(o, c) <= h)
      }
      // single-day series: open/close are the ts-ordered endpoints
      if (prices.length <= 24) {
        val r = ohlc.head
        assert(r.getAs[Double]("open") === prices.head)
        assert(r.getAs[Double]("close") === prices.last)
      }
    }
  }

  test("rolling mean of a constant series is the constant; ret is 0") {
    forAll2(Gen.choose(1.0, 500.0), Gen.choose(8, 40)) { (c, n) =>
      val daily = (1 to n).map(i => (java.sql.Date.valueOf(f"2024-01-${(i % 28) + 1}%02d"), "A", c, c, c, c))
        .distinct.toDF("date", "asset", "open", "high", "low", "close")
      val e = Indicators.enrich(daily).collect()
      e.foreach { r =>
        if (!r.isNullAt(r.fieldIndex("ma7"))) assert(math.abs(r.getAs[Double]("ma7") - c) < 1e-9)
        if (!r.isNullAt(r.fieldIndex("ret"))) assert(math.abs(r.getAs[Double]("ret")) < 1e-12)
      }
    }
  }

  test("dedup idempotence: f(f(x)) = f(x)") {
    forAll(Gen.nonEmptyListOf(Gen.choose(1L, 20L))) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("event_id", "k")
      val once = graft.ops.Normalize.dedupKeepFirst(df, Seq("k"), Seq("event_id"))
      val twice = graft.ops.Normalize.dedupKeepFirst(once, Seq("k"), Seq("event_id"))
      assert(once.collect().toSet === twice.collect().toSet)
      assert(once.count() === keys.distinct.length)
    }
  }

  test("insertIfAbsent replay: applying the same batch twice = once; no key dupes") {
    forAll2(Gen.listOf(Gen.choose(1L, 15L)), Gen.listOf(Gen.choose(1L, 15L))) { (ex, in) =>
      val existing = ex.distinct.map(k => (k, s"v$k")).toDF("k", "v")
      val incoming = in.distinct.map(k => (k, s"w$k")).toDF("k", "v")
      val once = Warehouse.insertIfAbsent(existing, incoming, Seq("k"))
      val twice = Warehouse.insertIfAbsent(once, incoming, Seq("k"))
      assert(once.collect().toSet === twice.collect().toSet)
      assert(once.groupBy("k").count().filter($"count" > 1).isEmpty)
      // first-wins: every existing value survives untouched
      val vals = once.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      ex.distinct.foreach(k => assert(vals(k) === s"v$k"))
    }
  }

  test("minhash similarity estimate tracks true Jaccard") {
    // identical docs → identical sigs; disjoint docs → (near-)disjoint sigs
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    val sigs = Dedup.minhashSignatures(
      Seq((1L, a), (2L, a), (3L, b)).toDF("doc_id", "text"), n = 3, numHashes = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (x, y) => x == y }
    assert(agree < 8, s"disjoint shingle sets should rarely collide, got $agree/64")
  }

  test("saltedJoin equals plain join") {
    forAll2(Gen.nonEmptyListOf(Gen.choose(1L, 5L)), Gen.nonEmptyListOf(Gen.choose(1L, 5L))) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
      val right = rs.distinct.map(k => (k, s"d$k")).toDF("k", "d")
      val plain = left.join(right, Seq("k")).select("k", "id", "d").collect().toSet
      val salted = Relational.saltedJoin(left, right, "k", buckets = 4)
        .select("k", "id", "d").collect().toSet
      assert(salted === plain)
    }
  }

  test("valueHistogram: bins partition the group count; bin indices stay in [0, bins)") {
    forAll2(Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)), Gen.choose(2, 16)) { (vs, bins) =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, "g", new Timestamp(86400000L), v)
      }.toDF("event_id", "event_type", "ts", "value")
      val out = Relational.valueHistogram(df, bins).collect()
      assert(out.map(_.getLong(2)).sum === vs.length.toLong)
      assert(out.forall { r => val b = r.getLong(1); b >= 0 && b < bins })
    }
  }

  test("eventTransitions: n sums to Σ max(events_per_user − 1, 0); p sums to 1 per prev") {
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 4L), Gen.oneOf("a", "b", "c")))) { evs =>
      val df = evs.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, new Timestamp(86400000L + i * 1000L), u, t)
      }.toDF("event_id", "ts", "user_id", "event_type")
      val out = Relational.eventTransitions(df).collect()
      val expected = evs.groupBy(_._1).values.map(g => math.max(g.size - 1, 0)).sum
      assert(out.map(_.getLong(2)).sum === expected.toLong)
      out.groupBy(_.getString(0)).foreach { case (_, rows) =>
        assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
      }
    }
  }

  private val randomEdges: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L)))
      .map(_.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct)

  test("co-occurrence edge build law: distinct membership, cap drop, all pairs (reference model)") {
    val membership = Gen.nonEmptyListOf(Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 12L)))
    forAll2(membership, Gen.choose(2, 5)) { (rows, cap) =>
      val got = graft.ops.Graphs.coOccurrenceEdges(rows.toDF("g", "i"), "g", "i", cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = rows.groupBy(_._1).values
        .map(_.map(_._2).distinct.sorted)
        .filter(_.size <= cap)
        .flatMap(vs => for (x <- vs; y <- vs if x < y) yield (x, y)).toSet
      assert(got === want, s"cap=$cap rows=$rows")
    }
  }

  test("pagerank conserves unit mass for any undirected graph and iteration count") {
    forAll2(randomEdges, Gen.choose(1, 3)) { (edges, iters) =>
      if (edges.nonEmpty) {
        val r = graft.ops.Graphs.pageRank(edges.toDF("a", "b"), iterations = iters)
          .collect().map(_.getDouble(1))
        assert(math.abs(r.sum - 1.0) < 1e-9, s"edges=$edges iters=$iters sum=${r.sum}")
      }
    }
  }

  test("label propagation with rounds >= diameter = union-find component minima") {
    forAll(randomEdges, n = 3) { edges =>
      if (edges.nonEmpty) {
        val got = graft.ops.Graphs.minLabelPropagate(edges.toDF("a", "b"), rounds = 10)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(n => n -> find(n)).toMap
        assert(got === want, s"edges=$edges")
      }
    }
  }

  test("triangle count is orientation-invariant on random graphs") {
    forAll(randomEdges) { edges =>
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val id = graft.ops.Graphs.triangleCount(df).head().getLong(0)
        val deg = graft.ops.Graphs.triangleCountDegreeOriented(df).head().getLong(0)
        assert(id === deg, s"edges=$edges id=$id deg=$deg")
      }
    }
  }

  test("rankBucket law: binary search == naive boundary count under Spark ordering") {
    import graft.functions.Kernels
    // Spark's total order: NaN ranks greatest; everything else IEEE
    def naive(v: Double, bs: Array[Double]): Int =
      if (v.isNaN) bs.length else bs.count(_ <= v)
    val boundariesGen = Gen.listOf(Gen.oneOf(
      Gen.choose(-1e6, 1e6), Gen.oneOf(0.0, -0.0, 1.0, -1.0))).map(_.sorted.toArray)
    val valueGen = Gen.oneOf(Gen.choose(-2e6, 2e6),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.0))
    forAll2(boundariesGen, Gen.listOfN(20, valueGen)) { (bs, vs) =>
      vs.foreach { v =>
        assert(Kernels.rankBucket(v, bs) === naive(v, bs),
          s"v=$v boundaries=${bs.mkString(",")}")
      }
    }
  }

  test("adamic-adar law: reference model over random graphs (weights = 1/ln(deg of center))") {
    forAll(randomEdges) { edges =>
      if (edges.nonEmpty) {
        val got = graft.ops.Graphs.adamicAdar(edges.toDF("a", "b")).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
        // driver-side reference: adjacency sets, shared-neighbor sums
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        val deg = adj.view.mapValues(_.size).toMap
        val nodes = adj.keys.toSeq.sorted
        val want = (for {
          a <- nodes; b <- nodes if a < b
          shared = adj(a) intersect adj(b) if shared.nonEmpty
        } yield (a, b) -> ((shared.size.toLong,
          math.rint(shared.toSeq.map(z => 1.0 / math.log(deg(z))).sum * 1e6) / 1e6))).toMap
        assert(got.keySet === want.keySet, s"edges=$edges")
        got.foreach { case (k, (c, aa)) =>
          assert(c === want(k)._1, s"common $k edges=$edges")
          assert(math.abs(aa - want(k)._2) < 2e-6, s"aa $k edges=$edges")
        }
      }
    }
  }

  test("rrf fusion law: invariant under list order; score is the rank-reciprocal sum") {
    val ranking: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(Gen.choose(100L, 120L)).map(_.distinct.zipWithIndex
        .map { case (doc, i) => (doc, i + 1L) })
    forAll2(ranking, ranking) { (ra, rb) =>
      val a = ra.map { case (d, r) => (1L, d, r) }.toDF("query_id", "doc_id", "rank")
      val b = rb.map { case (d, r) => (1L, d, r) }.toDF("query_id", "doc_id", "rank")
      def run(ls: Seq[org.apache.spark.sql.DataFrame]) =
        graft.ext.Similarity.rrfFuse(ls, k = 100).collect()
          .map(r => r.getLong(2) -> (r.getDouble(3), r.getLong(4))).toMap
      val ab = run(Seq(a, b))
      assert(ab === run(Seq(b, a)), "fusion must not depend on list order")
      val ranks = (ra.map { case (d, r) => d -> r } ++ rb.map { case (d, r) => d -> r })
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      ranks.foreach { case (doc, rs) =>
        val want = math.rint(rs.map(r => 1.0 / (60.0 + r)).sum * 1e9) / 1e9
        assert(math.abs(ab(doc)._1 - want) < 2e-9, s"doc=$doc")
        assert(ab(doc)._2 === rs.size.toLong)
      }
    }
  }

  test("degree IVM law: old degrees + edge diff == recompute over the new edges (X245)") {
    forAll2(randomEdges, randomEdges) { (oldE, newE) =>
      if (oldE.nonEmpty && newE.nonEmpty) {
        val a = oldE.toDF("a", "b")
        val b = newE.toDF("a", "b")
        val feed = Warehouse.diffFrames(a, b, Seq("a", "b"), preImages = true)
        val got = graft.store.Ivm
          .maintainDegrees(graft.ops.Graphs.degrees(a), feed)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = graft.ops.Graphs.degrees(b)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"old=$oldE new=$newE")
      }
    }
  }

  test("warm-start PPR refresh contracts: j rounds land within d^j of the gap, any graph pair (X245)") {
    forAll2(randomEdges, randomEdges) { (oldE, newE) =>
      // both graphs must contain the seed node; use the smallest node
      // of the NEW graph as seed, present in old too or PPR refuses
      if (oldE.nonEmpty && newE.nonEmpty) {
        val shared = oldE.flatMap(e => Seq(e._1, e._2))
          .intersect(newE.flatMap(e => Seq(e._1, e._2)))
        if (shared.nonEmpty) {
          val seed = Seq(shared.min).toDF("node")
          def toMap(df: org.apache.spark.sql.DataFrame) =
            df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
          val stored = graft.ops.Graphs
            .personalizedPageRank(oldE.toDF("a", "b"), seed, iterations = 20)
            .localCheckpoint(true)
          val star = toMap(graft.ops.Graphs
            .personalizedPageRank(newE.toDF("a", "b"), seed, iterations = 25))
          def l1(m: Map[Long, Double]) = (m.keySet ++ star.keySet).toSeq
            .map(k => math.abs(m.getOrElse(k, 0.0) - star.getOrElse(k, 0.0))).sum
          val gap = l1(toMap(stored))
          val refreshed = toMap(graft.ops.Graphs.refreshPersonalizedPageRank(
            newE.toDF("a", "b"), seed, stored, rounds = 2))
          // the reference ranks are a 25-iteration approximation of the
          // true fixpoint, so allow its own residual (~0.85^25) on top
          assert(l1(refreshed) <= 0.85 * 0.85 * gap + 1e-2,
            s"old=$oldE new=$newE gap=$gap refreshed=${l1(refreshed)}")
        }
      }
    }
  }

  test("estimateRows law: prorated estimate within the clamped-bin bound for random tables and ranges") {
    val table = Gen.nonEmptyListOf(Gen.choose(0.0, 100.0))
    val range = Gen.zip(Gen.choose(-10.0, 110.0), Gen.choose(0.0, 60.0))
    forAll2(table, range) { case (vals, (lo, width)) =>
      val hi = lo + width
      val root = java.nio.file.Files.createTempDirectory("graft_prop_est").toString + "/t"
      Warehouse.writeSnapshot(
        vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "num")
          .repartition(2), root)
      Warehouse.analyzeHistogram(spark, root, "num", bins = 6)
      val est = Warehouse.estimateRows(spark, root, "num", lo, hi, bins = 6).get
      val (bLo, bHi) = (vals.min, vals.max)
      val w = (bHi - bLo) / 6
      // bound: [sum of bins fully inside, sum of bins intersecting]
      def binOf(v: Double): Int =
        if (w == 0.0) 0
        else math.min(5, math.max(0, math.floor((v - bLo) / w).toInt))
      val counts = vals.groupBy(binOf).view.mapValues(_.size.toDouble).toMap
      def binRange(b: Int) = (bLo + b * w, bLo + (b + 1) * w)
      val full = (0 to 5).filter { b =>
        val (l, h) = binRange(b); (if (w == 0.0) lo <= bLo && bLo <= hi else l >= lo && h <= hi)
      }.map(counts.getOrElse(_, 0.0)).sum
      val touch = (0 to 5).filter { b =>
        val (l, h) = binRange(b)
        if (w == 0.0) lo <= bLo && bLo <= hi else h > lo && l < hi
      }.map(counts.getOrElse(_, 0.0)).sum
      assert(est >= full - 1e-9 && est <= touch + 1e-9,
        s"vals=${vals.size} range=[$lo,$hi] est=$est bound=[$full,$touch]")
    }
  }
}
