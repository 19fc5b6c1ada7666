package graft.store

import graft.SparkSpec
import graft.ops.Graphs
import org.apache.spark.sql.functions._

/** X252 graph-view maintenance tick — the load-bearing claims:
  * (1) the seed tick materializes both views ≡ their recomputes;
  * (2) a churn tick folds the feed bracket: degrees EXACT (integer
  *     algebra), warm-refreshed ranks within the PPR contraction
  *     bound of the new graph's converged ranks — and closer than the
  *     stale stored ranks were;
  * (3) the cursor rides the view's own commit (txn stamp): a clean
  *     tick reads zero data bytes (poison pin) and re-ticking after a
  *     bracket is a no-op;
  * (4) a small bracket SKIPS the ranks refresh (recorded, not hidden)
  *     under the policy knob.
  */
class GraphViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/t"

  /** a path-ish graph with a few extra chords, canonical a < b */
  private def edges0 = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
    (1L, 3L), (2L, 5L), (6L, 7L), (7L, 8L), (1L, 8L)
  ).toDF("a", "b")

  private def degMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def l1(a: Map[Long, Double], b: Map[Long, Double]): Double =
    (a.keySet ++ b.keySet).toSeq
      .map(k => math.abs(a.getOrElse(k, 0.0) - b.getOrElse(k, 0.0))).sum

  test("seed tick ≡ recomputes; churn tick: degrees exact, ranks within the contraction bound") {
    val edges = freshRoot("gv_edges")
    val deg = freshRoot("gv_deg")
    val ranks = freshRoot("gv_ranks")
    val policy = GraphView.GraphViewPolicy(seeds = Seq(1L, 4L),
      pprIterations = 8, refreshRounds = 3)
    Warehouse.writeSnapshot(edges0, edges)
    val r0 = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(r0.degreesMaintained && r0.ranksAction === "seeded", r0.toString)
    assert(degMap(Warehouse.readSnapshot(spark, deg)) ===
      degMap(Graphs.degrees(edges0)))
    val seededRanks = rankMap(Warehouse.readSnapshot(spark, ranks))
    assert(l1(seededRanks, rankMap(
      Graphs.personalizedPageRank(edges0, Seq(1L, 4L).toDF("node"), 8))) < 1e-12)
    // churn: insert a bridge + a new tail, delete one chord — with
    // change feeds, the tick's bracket sees both signs
    val v1 = Warehouse.currentSnapshot(spark, edges)
    Warehouse.appendSnapshot(Seq((3L, 8L), (8L, 9L)).toDF("a", "b"), edges, v1,
      changeFeed = true)
    Warehouse.deleteWhere(spark, edges, col("a") === 2L && col("b") === 5L,
      changeFeed = true)
    val r1 = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(r1.degreesMaintained && r1.ranksAction === "refreshed", r1.toString)
    val newEdges = Warehouse.readSnapshot(spark, edges)
      .localCheckpoint(true) // consumed by both recomputes below
    assert(degMap(Warehouse.readSnapshot(spark, deg)) ===
      degMap(Graphs.degrees(newEdges)),
      "maintained degrees must equal the recompute over the new graph")
    // ranks: within the L1 contraction bound of the converged walk on
    // the NEW graph, and strictly closer than the stale seeded ranks
    val converged = rankMap(Graphs.personalizedPageRank(
      newEdges, Seq(1L, 4L).toDF("node"), 30))
    val refreshed = rankMap(Warehouse.readSnapshot(spark, ranks))
    val staleDist = l1(seededRanks, converged)
    val freshDist = l1(refreshed, converged)
    assert(freshDist <= math.pow(0.85, 3) * staleDist + 1e-9,
      s"3 warm rounds must contract by d^3: stale $staleDist fresh $freshDist")
    assert(freshDist < staleDist, "the refresh must move ranks TOWARD the new graph")
  }

  test("clean tick reads zero data bytes; cursor rides the view commit; small brackets skip the walk") {
    val edges = freshRoot("gv2_edges")
    val deg = freshRoot("gv2_deg")
    val ranks = freshRoot("gv2_ranks")
    val policy = GraphView.GraphViewPolicy(seeds = Seq(1L),
      pprIterations = 4, refreshRounds = 2)
    Warehouse.writeSnapshot(edges0, edges)
    GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    val degV = Warehouse.currentSnapshot(spark, deg)
    // clean tick: no new edge version — nothing recomputes, nothing
    // commits, and it must not touch a data byte (poison pin)
    Seq(edges, deg, ranks).foreach { root =>
      Warehouse.readSnapshot(spark, root).inputFiles.foreach { f =>
        val out = new java.io.FileOutputStream(new java.io.File(new java.net.URI(f)))
        out.write("x".getBytes); out.close()
      }
    }
    val clean = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(clean.ranksAction === "clean" && !clean.degreesMaintained, clean.toString)
    assert(Warehouse.currentSnapshot(spark, deg) === degV, "a clean tick must not commit")
  }

  test("refreshMinEdgeFraction: a one-edge bracket skips the walk, a big one fires it") {
    val edges = freshRoot("gv3_edges")
    val deg = freshRoot("gv3_deg")
    val ranks = freshRoot("gv3_ranks")
    // knob: refresh only when the bracket touches >= 30% of edges
    val policy = GraphView.GraphViewPolicy(seeds = Seq(1L),
      pprIterations = 4, refreshRounds = 2, refreshMinEdgeFraction = 0.3)
    Warehouse.writeSnapshot(edges0, edges)
    GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    val ranksV = Warehouse.currentSnapshot(spark, ranks)
    // one appended edge over 11 = 9% < 30%: degrees still fold, the
    // walk is skipped and RECORDED as skipped
    Warehouse.appendSnapshot(Seq((5L, 9L)).toDF("a", "b"), edges,
      Warehouse.currentSnapshot(spark, edges), changeFeed = true)
    val small = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(small.degreesMaintained && small.ranksAction === "skipped_small_bracket",
      small.toString)
    assert(Warehouse.currentSnapshot(spark, ranks) === ranksV,
      "a skipped walk must not commit ranks")
    assert(degMap(Warehouse.readSnapshot(spark, deg)) ===
      degMap(Graphs.degrees(Warehouse.readSnapshot(spark, edges))),
      "degrees fold on every tick regardless of the walk knob")
    // a later bracket makes the CUMULATIVE pending fraction cross:
    // the ranks cursor did not advance on the skip, so the fired
    // bracket covers BOTH commits (1 + 5 of 17 edges = 35% >= 30%) —
    // successive small brackets accumulate instead of drifting
    // unboundedly under the knob (r15 review)
    Warehouse.appendSnapshot(
      Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (6L, 9L)).toDF("a", "b"),
      edges, Warehouse.currentSnapshot(spark, edges), changeFeed = true)
    val big = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(big.ranksAction === "refreshed", big.toString)
    assert(Warehouse.currentSnapshot(spark, ranks) > ranksV)
  }

  test("per-view cursors: a missing ranks view re-seeds without disturbing the degree fold (r15)") {
    val edges = freshRoot("gv4_edges")
    val deg = freshRoot("gv4_deg")
    val ranks = freshRoot("gv4_ranks")
    val policy = GraphView.GraphViewPolicy(seeds = Seq(1L),
      pprIterations = 4, refreshRounds = 2)
    Warehouse.writeSnapshot(edges0, edges)
    // the torn first tick: degrees seeded, the ranks stamp never ran
    // (simulated by ticking WITHOUT a ranks view first)
    val r0 = GraphView.maintainGraphView(spark, edges, deg, None, policy)
    assert(r0.degreesMaintained && r0.ranksAction === "none")
    // next tick WITH the ranks view: degrees are current (no re-fold,
    // no commit), ranks seed from their own absent cursor
    val degV = Warehouse.currentSnapshot(spark, deg)
    val r1 = GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
    assert(!r1.degreesMaintained && r1.ranksAction === "seeded", r1.toString)
    assert(Warehouse.currentSnapshot(spark, deg) === degV,
      "a current degree view must not re-commit")
    assert(l1(rankMap(Warehouse.readSnapshot(spark, ranks)), rankMap(
      Graphs.personalizedPageRank(edges0, Seq(1L).toDF("node"), 4))) < 1e-12)
    // and a further tick with both views current is clean
    assert(GraphView.maintainGraphView(spark, edges, deg, Some(ranks), policy)
      .ranksAction === "clean")
  }
}
