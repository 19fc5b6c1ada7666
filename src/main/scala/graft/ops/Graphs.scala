package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over derived item graphs (X212) — the second
  * member of the graph family next to X52's connected components.
  * The pipeline shape: a co-occurrence EDGE BUILD (items sharing a
  * group — parts in an order, tokens in a window, docs in a cluster)
  * followed by structure queries over the edge list. Everything is
  * edge-grain DataFrames: no adjacency materialization, no driver
  * graph, so the ops scale exactly as far as their joins shuffle.
  */
object Graphs {

  /** Distinct undirected co-occurrence edges `(a < b)` of items
    * sharing a group — the standard market-basket / co-citation edge
    * build. Per group of size k the pair stage emits k·(k−1)/2 rows,
    * so Σk² is the true cost: `maxGroupSize` caps it (groups above
    * the cap are DROPPED, the stopword move every co-occurrence
    * miner makes — a group shared by everything carries no signal
    * and quadratic cost). At 100 TB: the self-join co-partitions on
    * the group key (one shuffle of the deduped membership), the cap
    * bounds the blow-up, and `distinct` collapses multiplicity at
    * edge grain.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        maxGroupSize: Int = 50): DataFrame = {
    require(maxGroupSize >= 2, s"maxGroupSize must be >= 2, got $maxGroupSize")
    val m = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
      .withColumn("__gs", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("__gs") <= maxGroupSize)
      .select("g", "i")
    m.as("x").join(m.as("y"), col("x.g") === col("y.g") && col("x.i") < col("y.i"))
      .select(col("x.i").as("a"), col("y.i").as("b"))
      .distinct()
  }

  /** Exact triangle count of an undirected graph given as canonical
    * `(a < b)` distinct edges — the classic wedge-close join: a
    * wedge `a→b→c` (IDs ascending) closes iff `(a, c)` is an edge.
    * ID orientation bounds each node's forward fan-out to its
    * higher-ID neighbors; on a skewed degree distribution the
    * standard upgrade is DEGREE orientation (forward = toward the
    * higher-degree endpoint), which provably minimizes Σ outdeg² —
    * same count, smaller wedge stage; ID orientation keeps the
    * cross-engine recomposition trivial and is the right default at
    * the co-occurrence cap's bounded degrees. Input edges are
    * assumed canonical and distinct (what [[coOccurrenceEdges]]
    * emits); duplicates would overcount.
    */
  def triangleCount(edges: DataFrame): DataFrame =
    edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))

  /** Common-neighbor counts for node pairs at distance 2 — the wedge
    * aggregate under [[triangleCount]], surfaced: pair `(a < b)` with
    * the number of shared neighbors, whether or not (a, b) is itself
    * an edge. The raw signal of neighborhood-overlap link prediction
    * and graph-side entity resolution. Same Σdeg² wedge cost and the
    * same bound: cap degrees at the edge build.
    */
  def commonNeighbors(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    adj.as("x").join(adj.as("y"),
        col("x.v") === col("y.v") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("a"), col("y.u").as("b"))
      .agg(count(lit(1)).as("common"))
  }

  /** Neighborhood Jaccard of distance-2 pairs: `common / (deg(a) +
    * deg(b) − common)` — the classic link-prediction score, exact and
    * engine-deterministic (integer counts, one IEEE division). Pairs
    * with zero common neighbors never appear (their score is 0 and
    * their enumeration would be all-pairs).
    */
  def neighborhoodJaccard(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    commonNeighbors(edges)
      .join(deg.withColumnsRenamed(Map("node" -> "a", "degree" -> "deg_a")), "a")
      .join(deg.withColumnsRenamed(Map("node" -> "b", "degree" -> "deg_b")), "b")
      .withColumn("jaccard",
        col("common") / (col("deg_a") + col("deg_b") - col("common")))
      .select("a", "b", "common", "deg_a", "deg_b", "jaccard")
  }

  /** Degree of every node of a canonical undirected edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** One-row structural summary: nodes, edges, triangles, max degree
    * — the graph-health probe a derived-graph pipeline logs per run.
    */
  def graphSummary(edges: DataFrame): DataFrame = {
    val d = degrees(edges)
    val nt = triangleCount(edges)
    val nodesEdges = d.agg(count(lit(1)).as("n_nodes"), max(col("degree")).as("max_degree"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    nodesEdges.crossJoin(nt)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("max_degree"))
  }
}
