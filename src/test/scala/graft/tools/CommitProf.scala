package graft.tools

import graft.Tables
import graft.store.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 optimization round: step-level timing of the multi-commit
  * choreography family's shared skeleton (writeSnapshot → dv ops →
  * read) — q_update_dv's exact steps, each timed separately across
  * repeats, so the per-commit fixed overhead decomposes into its
  * phases before any optimization is attempted (guide §1).
  */
object CommitProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[commitprof] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (r <- 1 to runs) {
      println(s"--- run $r ---")
      System.gc()
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      val root = java.nio.file.Files.createTempDirectory("graft_cp").toString + "/t"
      val liw = time("plan lineitem (lazy)")(li.repartition(4))
      time("writeSnapshot v1")(Warehouse.writeSnapshot(liw, root))
      time("deleteWhereDv")(
        Warehouse.deleteWhereDv(spark, root, col("l_quantity") >= 45.0))
      time("updateWhereDv")(
        Warehouse.updateWhereDv(spark, root, col("l_quantity") < 5.0,
          Map("l_extendedprice" -> (col("l_extendedprice") * 2))))
      val rd = time("readSnapshot plan")(Warehouse.readSnapshot(spark, root))
      time("noop save")(rd.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
