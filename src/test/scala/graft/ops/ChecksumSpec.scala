package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X216 order-independent table checksum — the replica-verification
  * handshake: partitioning/order invariant, content sensitive.
  */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def sums(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal, BigDecimal) = {
    val r = Relational.tableChecksum(df, Seq("a", "b")).head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2)))
  }

  test("invariant under row order and partitioning; sensitive to any content change") {
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("a", "b")
    val shuffled = Seq((3L, "z"), (1L, "x"), (2L, "y")).toDF("a", "b").repartition(7)
    assert(sums(base) === sums(shuffled), "order and partitioning are invisible")
    assert(sums(base) !== sums(Seq((1L, "x"), (2L, "y"), (3L, "w")).toDF("a", "b")),
      "one changed value changes the checksum")
    assert(sums(base) !== sums(Seq((1L, "x"), (2L, "y")).toDF("a", "b")),
      "a missing row changes it (and n_rows)")
  }

  test("column boundaries and NULL positions are distinguished") {
    val ab_c = Seq(("ab", "c")).toDF("a", "b")
    val a_bc = Seq(("a", "bc")).toDF("a", "b")
    assert(sums(ab_c) !== sums(a_bc), "the separator keeps column boundaries")
    val nullA = Seq((Option.empty[String], Some("a"))).toDF("a", "b")
    val nullB = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
    assert(sums(nullA) !== sums(nullB), "NULL position matters")
  }

  test("empty input checksums to (0, 0, 0)") {
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    assert(sums(empty) === ((0L, BigDecimal(0), BigDecimal(0))))
  }
}
