package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X212 graph analytics — co-occurrence edge build + exact triangle
  * counting on a known small graph.
  */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("co-occurrence edges: canonical, distinct, group-capped") {
    // g1 = {1,2,3} (closes a triangle), g2 = {2,3} (duplicate edge),
    // g3 = {1,4}, g4 = five items (dropped by the cap)
    val df = Seq(
      (1, 1), (1, 2), (1, 3),
      (2, 2), (2, 3),
      (3, 1), (3, 4),
      (4, 10), (4, 11), (4, 12), (4, 13), (4, 14)
    ).toDF("g", "i")
    val e = Graphs.coOccurrenceEdges(df, "g", "i", maxGroupSize = 4)
      .orderBy("a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(e.toSeq === Seq((1, 2), (1, 3), (1, 4), (2, 3)),
      "canonical a<b, duplicates collapsed, capped group dropped")
  }

  test("triangle count: exact on triangle + pendant; degrees and summary agree") {
    val edges = Seq((1, 2), (1, 3), (2, 3), (1, 4)).toDF("a", "b")
    assert(Graphs.triangleCount(edges).head().getLong(0) === 1L)
    val deg = Graphs.degrees(edges).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(deg === Map(1 -> 3L, 2 -> 2L, 3 -> 2L, 4 -> 1L))
    val s = Graphs.graphSummary(edges).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) === (4L, 4L, 1L, 3L))
  }

  test("common neighbors and neighborhood Jaccard on a known graph") {
    // square 1-2-4-3-1: opposite corners (1,4) and (2,3) share two
    // neighbors each, adjacent corners share none beyond the wedge
    val edges = Seq((1, 2), (1, 3), (2, 4), (3, 4)).toDF("a", "b")
    val cn = Graphs.commonNeighbors(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cn === Map((1, 4) -> 2L, (2, 3) -> 2L))
    val j = Graphs.neighborhoodJaccard(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(5)).toMap
    // deg=2 everywhere: jaccard = 2 / (2 + 2 - 2) = 1.0
    assert(j === Map((1, 4) -> 1.0, (2, 3) -> 1.0))
  }

  test("two triangles sharing an edge count as two") {
    val edges = Seq((1, 2), (1, 3), (2, 3), (2, 4), (3, 4)).toDF("a", "b")
    assert(Graphs.triangleCount(edges).head().getLong(0) === 2L)
  }

  test("degree-oriented triangle count equals ID-oriented on skewed graphs") {
    // hub graph: node 1 connected to 2..8, plus cross edges closing
    // triangles at the hub and a detached triangle
    val hub = (2 to 8).map(i => (1, i)) ++
      Seq((2, 3), (4, 5), (6, 7), (10, 11), (10, 12), (11, 12))
    val edges = hub.toDF("a", "b")
    val idCount = Graphs.triangleCount(edges).head().getLong(0)
    val degCount = Graphs.triangleCountDegreeOriented(edges).head().getLong(0)
    assert(idCount === 4L)
    assert(degCount === idCount, "orientation must not change the count")
    // and through the summary flag
    val s = Graphs.graphSummary(edges, degreeOriented = true).head()
    assert(s.getLong(2) === idCount)
  }

  test("integral fast path and generic edge build agree") {
    // same data once as ints (fast path) and once as strings (generic
    // windowed self-join): identical edge sets modulo the item type
    val rows = Seq(
      (1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 1), (3, 4),
      (4, 10), (4, 11), (4, 12), (4, 13), (4, 14))
    val ints = rows.toDF("g", "i")
    val strs = rows.map { case (g, i) => (g, f"$i%03d") }.toDF("g", "i")
    val fast = Graphs.coOccurrenceEdges(ints, "g", "i", maxGroupSize = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val gen = Graphs.coOccurrenceEdges(strs, "g", "i", maxGroupSize = 4)
      .collect().map(r => (r.getString(0).toInt, r.getString(1).toInt)).toSet
    assert(fast === gen)
    assert(fast === Set((1, 2), (1, 3), (1, 4), (2, 3)))
  }

  test("weighted co-occurrence: counts, lift, npmi on a hand example") {
    // g1={1,2}, g2={1,2}, g3={1,3}, g4={2,3}: N=4 kept groups
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2), (4, 3))
      .toDF("g", "i")
    val w = Graphs.weightedCoOccurrenceEdges(df, "g", "i", maxGroupSize = 5)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    val (nPair, nA, nB, lift, npmi) = w((1, 2))
    assert((nPair, nA, nB) === (2L, 3L, 3L))
    assert(math.abs(lift - 8.0 / 9.0) < 1e-12)
    assert(math.abs(npmi - math.log(8.0 / 9.0) / math.log(2.0)) < 1e-6)
    // independence-ish pair (1,3): 1 group of its possible 4
    assert(w((1, 3))._1 === 1L)
  }

  test("weighted co-occurrence: perfect pair gets npmi = 1") {
    val df = Seq((1, 7), (1, 8), (2, 7), (2, 8)).toDF("g", "i")
    val w = Graphs.weightedCoOccurrenceEdges(df, "g", "i", maxGroupSize = 5).head()
    assert(w.getLong(2) === 2L, "n_pair = n_groups")
    assert(w.getDouble(6) === 1.0)
  }

  test("weighted co-occurrence: generic (string) path agrees with integral") {
    val rows = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3), (4, 2), (4, 3))
    val fast = Graphs.weightedCoOccurrenceEdges(rows.toDF("g", "i"), "g", "i", 5)
      .collect().map(r => (r.getInt(0).toString, r.getInt(1).toString) ->
        (r.getLong(2), r.getDouble(6))).toMap
    val gen = Graphs.weightedCoOccurrenceEdges(
        rows.map { case (g, i) => (g, i.toString) }.toDF("g", "i"), "g", "i", 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(6))).toMap
    assert(fast === gen)
  }

  test("pagerank: symmetric triangle converges to uniform, mass conserved") {
    val edges = Seq((1, 2), (1, 3), (2, 3)).toDF("a", "b")
    val r = Graphs.pageRank(edges, iterations = 4).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3.0) < 1e-12,
      "every node of a vertex-transitive graph holds 1/N"))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("weighted pagerank: edge weight splits the source's rank by strength") {
    // undirected star 2 -(3)- 1 -(1)- 3: node 1's rank splits 3:1
    val edges = Seq((1, 2, 3L), (1, 3, 1L)).toDF("a", "b", "w")
    val r = Graphs.pageRank(edges, iterations = 1, weightCol = Some("w")).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(2) - (0.05 + 0.85 * 0.25)) < 1e-12, s"got ${r(2)}")
    assert(math.abs(r(3) - (0.05 + 0.85 / 12.0)) < 1e-12, s"got ${r(3)}")
    assert(math.abs(r(1) - (0.05 + 0.85 * 2.0 / 3.0)) < 1e-12, s"got ${r(1)}")
    assert(math.abs(r.values.sum - 1.0) < 1e-12, "mass conserved under weights")
  }

  test("pagerank: directed graph with a dangling node conserves mass") {
    // 1 -> 2 <- 3: node 2 has no out-edges; its mass redistributes
    val edges = Seq((1, 2), (3, 2)).toDF("a", "b")
    val r = Graphs.pageRank(edges, iterations = 1, undirected = false).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    // r' = 0.15/3 + 0.85*(in + (1/3)/3): hand-computed
    assert(math.abs(r(1) - (0.05 + 0.85 / 9.0)) < 1e-12)
    assert(math.abs(r(3) - (0.05 + 0.85 / 9.0)) < 1e-12)
    assert(math.abs(r(2) - (0.05 + 0.85 * (2.0 / 3.0 + 1.0 / 9.0))) < 1e-12)
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("min-label propagation: converges to nearDupClusters' labels; distance-k before that") {
    // two components: {1,2,3,4} (a path 1-2-3-4) and {10,11}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    // k=3 covers the path's radius from node 1: converged labels
    val l3 = Graphs.minLabelPropagate(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l3 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    val converged = graft.ext.Dedup.nearDupClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l3 === converged, "fixed-k unroll must equal the converged loop once k covers the radius")
    // k=1 is the fused round: node 4 only sees neighbor 3 (label 3)
    val l1 = Graphs.minLabelPropagate(edges, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(4L) === 3L && l1(3L) === 2L && l1(2L) === 1L && l1(1L) === 1L,
      s"round 1 holds the min within distance 1, got $l1")
  }

  test("pageRankConverged: stationary ranking, early exit, loud bound refusal (r13)") {
    // path 1-2-3: stationary ranks are analytic — ends get
    // (1-d)/3 + d*mid/2, the middle gets (1-d)/3 + d*(end_l + end_r)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graphs.pageRankConverged(edges, tol = 1e-11, maxIterations = 300).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "mass conserved at the fixpoint")
    // fixpoint equations hold
    assert(math.abs(r(1L) - (0.05 + 0.85 * r(2L) / 2)) < 1e-9, r.toString)
    assert(math.abs(r(2L) - (0.05 + 0.85 * (r(1L) + r(3L)))) < 1e-9, r.toString)
    assert(r(1L) === r(3L), "symmetric ends converge to identical rank")
    // agrees with the bounded form run far past convergence
    val bounded = Graphs.pageRank(edges, iterations = 200).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.foreach { case (k, v) => assert(math.abs(v - bounded(k)) < 1e-9) }
    // a bound too small to converge refuses loudly
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRankConverged(edges, tol = 1e-11, maxIterations = 2)
    }
    assert(e.getMessage.contains("maxIterations"))
  }

  test("adamic-adar: inverse-log-degree weighting, hand-computed (X242)") {
    // triangle 1-2-3 plus pendant 1-4: degrees 1:3, 2:2, 3:2, 4:1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Graphs.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // (1,2) share 3 (deg 2); (1,3) share 2 (deg 2); (2,3)/(2,4)/(3,4)
    // share node 1 (deg 3); (1,4) share nothing and must be absent
    assert(out((1L, 2L)) === ((1L, r6(1.0 / math.log(2.0)))))
    assert(out((1L, 3L)) === ((1L, r6(1.0 / math.log(2.0)))))
    assert(out((2L, 3L)) === ((1L, r6(1.0 / math.log(3.0)))))
    assert(out((2L, 4L)) === ((1L, r6(1.0 / math.log(3.0)))))
    assert(out((3L, 4L)) === ((1L, r6(1.0 / math.log(3.0)))))
    assert(!out.contains((1L, 4L)) && out.size === 5)
  }

  test("min-label propagation to fixpoint: early exit equals converged CC; bound refusal is loud (r13)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val fix = Graphs.minLabelPropagateFixpoint(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // fixpoint ≡ the bounded unroll at covering radius ≡ the converged
    // production loop — the three labelings must agree exactly
    val bounded = Graphs.minLabelPropagate(edges, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix === bounded, "fixpoint must equal the bounded form at covering radius")
    val converged = graft.ext.Dedup.nearDupClusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix === converged, "fixpoint must equal the converged production loop")
    // a bound too small to converge refuses loudly instead of
    // returning a silently-partial labeling
    val e = intercept[IllegalArgumentException] {
      Graphs.minLabelPropagateFixpoint(edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("converged"))
    // a star converges in 2 probe rounds regardless of size (diameter
    // 2): early exit means the fixpoint form never needs the caller to
    // guess a radius
    val star = (2L to 40L).map(i => (1L, i)).toDF("a", "b")
    val starFix = Graphs.minLabelPropagateFixpoint(star, maxRounds = 5).collect()
    assert(starFix.forall(_.getLong(1) == 1L) && starFix.length == 40)
    // maxRounds means what it says (r13 ADVICE off-by-one): a single
    // edge converges at the init labeling, so maxRounds=1 — which runs
    // exactly ONE probe round — must succeed, not refuse
    val one = Graphs.minLabelPropagateFixpoint(Seq((1L, 2L)).toDF("a", "b"),
      maxRounds = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 1L, 2L -> 1L))
  }

  test("warm-start PPR refresh: contraction bound holds, beats cold start from the old ranks (X245)") {
    import org.apache.spark.sql.functions.col
    // old graph: path 1-2-3-4-5 + far pair 10-11; bracket bridges
    // 5-10 (a structural change far from the seed)
    val oldE = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("a", "b")
    val newE = oldE.unionAll(Seq((5L, 10L)).toDF("a", "b"))
    val seeds = Seq(1L).toDF("node")
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // "converged" references: 30 iterations at d=0.85 puts the
    // iteration residual ~ 0.85^30 ≈ 8e-3 * initial - far below the
    // bounds asserted here
    val oldRanks = Graphs.personalizedPageRank(oldE, seeds, iterations = 30)
      .localCheckpoint(true)
    val newStar = toMap(Graphs.personalizedPageRank(newE, seeds, iterations = 30))
    def l1(a: Map[Long, Double]): Double =
      (a.keySet ++ newStar.keySet).toSeq
        .map(k => math.abs(a.getOrElse(k, 0.0) - newStar.getOrElse(k, 0.0))).sum
    val baseGap = l1(toMap(oldRanks))
    assert(baseGap > 1e-4, "precondition: the bracket actually moved the ranks")
    // the documented contraction: j refresh rounds from the stored
    // ranks land within d^j * ||R_old - R*_new||_1 of the new fixpoint
    for (j <- Seq(1, 2, 3)) {
      val refreshed = toMap(Graphs.refreshPersonalizedPageRank(
        newE, seeds, oldRanks, rounds = j))
      val gap = l1(refreshed)
      assert(gap <= math.pow(0.85, j) * baseGap + 1e-9,
        s"rounds=$j: gap $gap > bound ${math.pow(0.85, j) * baseGap}")
    }
    // ...and the warm start beats a COLD walk of the same depth: 2
    // refresh rounds land closer than 2 cold iterations from seeds
    val cold2 = toMap(Graphs.personalizedPageRank(newE, seeds, iterations = 2))
    val warm2 = toMap(Graphs.refreshPersonalizedPageRank(newE, seeds, oldRanks, rounds = 2))
    assert(l1(warm2) < l1(cold2),
      s"warm ${l1(warm2)} must beat cold ${l1(cold2)} at equal depth")
  }

  test("personalized pagerank: seeds-are-everyone equals plain pagerank; mass stays near seeds (X236)") {
    import org.apache.spark.sql.functions.col
    // a path 1-2-3-4-5 plus a far pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)).toDF("a", "b")
    val allNodes = edges.select(col("a").as("n"))
      .unionAll(edges.select(col("b").as("n"))).distinct()
    // degenerate personalization (S = V) IS standard PageRank — the
    // teleport, init and update collapse to the uniform rule term for
    // term, so the ranks must match BIT-exactly
    val ppr = Graphs.personalizedPageRank(edges, allNodes, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pr = Graphs.pageRank(edges, iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ppr === pr, "S = V must reduce to the uniform walk exactly")
    // seeded at node 1: the seed's component holds all the mass, and
    // rank decays with distance from the seed; the 10-11 island gets 0
    val seeded = Graphs.personalizedPageRank(edges,
        Seq(1L).toDF("n"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(seeded(10L) === 0.0 && seeded(11L) === 0.0, "unreachable island gets nothing")
    assert(seeded(1L) > seeded(3L) && seeded(2L) > seeded(4L),
      s"mass decays away from the seed: $seeded")
    assert(math.abs(seeded.values.sum - 1.0) < 0.3,
      "teleport + forwarded mass stays near 1 on a mostly-dangling-free graph")
    // a seed absent from the graph refuses loudly
    val e = intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(edges, Seq(99L).toDF("n"), iterations = 1)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("personalized pagerank with weights: seed's rank splits by edge weight (r13)") {
    import org.apache.spark.sql.functions.col
    // star 2 -(3)- 1 -(1)- 3 seeded at 1: strength(1) = 4, so after one
    // round node 2 holds d·(3/4) and node 3 d·(1/4) of the seed's rank
    // — the 3:1 split — and the seed holds exactly the teleport
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L)).toDF("a", "b", "w")
    val r = Graphs.personalizedPageRank(edges, Seq(1L).toDF("n"),
        iterations = 1, weightCol = Some("w")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(2L) - 0.85 * 0.75) < 1e-15, s"got ${r(2L)}")
    assert(math.abs(r(3L) - 0.85 * 0.25) < 1e-15, s"got ${r(3L)}")
    assert(r(1L) === (1.0 - 0.85), "seed holds exactly the teleport after round 1")
    // weights all-1 must equal the unweighted walk bit-exactly
    val uw = Graphs.personalizedPageRank(
        edges.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
        Seq(1L).toDF("n"), iterations = 3, weightCol = Some("w")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val plain = Graphs.personalizedPageRank(edges.select(col("a"), col("b")),
        Seq(1L).toDF("n"), iterations = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(uw === plain, "w = 1 must reduce to the unweighted walk exactly")
  }

  test("bounded-distinct aggregate: cap is distinct-count, duplicates don't overflow") {
    // group 1: 3 distinct items seen through 6 duplicate rows — kept at
    // cap 3; group 2: 4 distinct — dropped (NULL → no edges)
    val df = Seq(
      (1, 7), (1, 7), (1, 8), (1, 8), (1, 9), (1, 9),
      (2, 1), (2, 2), (2, 3), (2, 4)).toDF("g", "i")
    val e = Graphs.coOccurrenceEdges(df, "g", "i", maxGroupSize = 3)
      .orderBy("a", "b").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(e.toSeq === Seq((7, 8), (7, 9), (8, 9)))
  }
}
