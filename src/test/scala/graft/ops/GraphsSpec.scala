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
}
