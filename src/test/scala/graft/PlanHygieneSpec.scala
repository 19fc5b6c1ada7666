package graft

/** Blanket scale-hygiene sweep over EVERY query in the driver
  * contract: no plan may contain a non-broadcast cartesian product.
  * `CartesianProductExec` materializes |left|×|right| via a full
  * shuffle-replicate — at 100 TB that is always a bug (a missing join
  * key, a lost equi-condition, a cross join that should be a broadcast
  * of a scalar aggregate). Broadcast nested-loop joins of 1-row
  * normalizer frames are fine and common; this asserts only on the
  * genuinely unscalable operator.
  *
  * Per-query shape contracts (exchange counts, broadcast choices,
  * kernel eval counts) live in PlanRegressionSpec; this sweep is the
  * coarse net that catches a regression in ANY query, including ones
  * without a dedicated contract.
  */
class PlanHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Replay-based streaming queries run a real micro-batch loop at
  // build time — their batch plans are covered by their own specs.
  private val skip = Set("q_stream_ohlc", "q_stream_sessions")

  test("no query plans a non-broadcast cartesian product") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val p = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("every query emits only scalar columns (the driver's row canonicalizer contract)") {
    // the r6 round's ONLY red correctness row was an array<double>
    // output crashing the harness's pandas sort/hash — pin the
    // contract: array/map/struct columns must be exploded or projected
    // to scalars before a frame leaves a query key
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip)
      .flatMap { name =>
        val nonScalar = SparkEntry.queries(name)(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
                    f.dataType.isInstanceOf[MapType] ||
                    f.dataType.isInstanceOf[StructType] => f.name
        }
        if (nonScalar.nonEmpty) Some(s"$name(${nonScalar.mkString(",")})") else None
      }
    assert(offenders.isEmpty, s"non-scalar output columns in: ${offenders.mkString("; ")}")
  }
}
