package graft.ops

import graft.SparkSpec
import graft.ops.Mat.MatOps

/** The size-gated materialization boundary (Mat.matBoundary): below
  * the input-bytes switch point a shared subtree recomputes (the
  * checkpoint round-trip costs more than the work it saves); at or
  * above it the frame is eagerly localCheckpoint'ed so each consumer
  * reads the materialized blocks instead of re-running the subtree.
  */
class MatSpec extends SparkSpec {

  private val df = () =>
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "length(text) as len")

  test("below the switch point the frame passes through untouched") {
    spark.conf.unset(Mat.ConfKey) // default 256 MiB >> sf0.001
    val d = df()
    assert(d.matBoundary eq d, "tiny input must not checkpoint")
  }

  test("at/above the switch point the boundary materializes eagerly") {
    spark.conf.set(Mat.ConfKey, "0")
    try {
      val m = df().matBoundary
      assert(m.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
        "boundary must replace the subtree with a materialized scan:\n" +
          m.queryExecution.optimizedPlan.toString)
    } finally spark.conf.unset(Mat.ConfKey)
  }

  test("inputBytes sums real file sizes for scans") {
    val b = Mat.inputBytes(df())
    assert(b > 0 && b < Mat.DefaultMinInputBytes,
      s"sf0.001 documents scan reported $b bytes")
  }

  test("stats survive an upstream boundary — the size signal stays accurate") {
    // Spark propagates child-plan stats through the checkpoint's
    // LogicalRDD, so a downstream boundary still sees the true input
    // size instead of defaultSizeInBytes: tiny stays pass-through,
    // and real 100 TB inputs clear the gate at every later boundary.
    spark.conf.set(Mat.ConfKey, "0")
    val up = try df().matBoundary finally spark.conf.unset(Mat.ConfKey)
    val b = Mat.inputBytes(up.groupBy("len").count())
    assert(b > 0 && b < Mat.DefaultMinInputBytes,
      s"checkpointed subtree reported $b bytes — stats propagation changed")
  }
}
