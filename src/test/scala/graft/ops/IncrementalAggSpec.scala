package graft.ops

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val batch1 = Seq(("u1", 1.0), ("u1", 3.0), ("u2", 5.0)).toDF("user_id", "value")
  private val batch2 = Seq(("u1", 2.0), ("u3", 7.0)).toDF("user_id", "value")

  test("merged batch states equal the direct aggregation of the union") {
    val merged = IncrementalAgg.merge(
      IncrementalAgg.state(batch1, Seq("user_id"), "value"),
      IncrementalAgg.state(batch2, Seq("user_id"), "value"), Seq("user_id"))
    val direct = IncrementalAgg.state(batch1.unionByName(batch2), Seq("user_id"), "value")
    assert(merged.orderBy("user_id").collect().toSeq ===
      direct.orderBy("user_id").collect().toSeq)
  }

  test("merge is order-insensitive (commutative) and finalize derives mean at read time") {
    val a = IncrementalAgg.state(batch1, Seq("user_id"), "value")
    val b = IncrementalAgg.state(batch2, Seq("user_id"), "value")
    val ab = IncrementalAgg.merge(a, b, Seq("user_id")).orderBy("user_id").collect().toSeq
    val ba = IncrementalAgg.merge(b, a, Seq("user_id")).orderBy("user_id").collect().toSeq
    assert(ab === ba)
    val fin = IncrementalAgg.finalizeState(IncrementalAgg.merge(a, b, Seq("user_id")))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(fin === Map("u1" -> 2.0, "u2" -> 5.0, "u3" -> 7.0))
  }

  test("state carries NULL-safe counts: count(value) skips nulls like the SQL aggregate") {
    val withNulls = Seq(("u1", Some(4.0)), ("u1", None)).toDF("user_id", "value")
    val st = IncrementalAgg.state(withNulls, Seq("user_id"), "value").collect().head
    assert(st.getLong(1) === 1L && st.getDecimal(2).doubleValue === 4.0)
  }
}
