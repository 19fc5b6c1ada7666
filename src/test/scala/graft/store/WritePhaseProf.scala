package graft.store

import graft.Tables
import org.apache.spark.sql.{SaveMode, SparkSession}

/** r16 optimization round: phase-level decomposition of one
  * writeSnapshot — raw parquet write vs manifest publish (driver-side
  * footer reads) vs listing vs pointer swap — package-private so the
  * real helpers are timed, not a reimplementation.
  */
object WritePhaseProf {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[phase] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
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
    val conf = spark.sparkContext.hadoopConfiguration
    for (r <- 1 to runs) {
      println(s"--- run $r ---")
      System.gc()
      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .repartition(4)
      val root = java.nio.file.Files.createTempDirectory("graft_wp").toString + "/t"
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      time("snapshots() listing (empty)")(Warehouse.snapshots(spark, root))
      time("raw parquet write v=1")(
        li.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v=1"))
      val schemaJson = li.schema.json
      time("writeManifest (footer reads)")(
        Warehouse.writeManifest(fs, conf, root, 1L, schemaJson))
      time("snapshots() listing (1 version)")(Warehouse.snapshots(spark, root))
      // compare: the full writeSnapshot on a second fresh root
      val root2 = java.nio.file.Files.createTempDirectory("graft_wp2").toString + "/t"
      time("full writeSnapshot")(Warehouse.writeSnapshot(li, root2))
      // and a second one on the same root (append-style second version)
      time("full commitSnapshot v2")(Warehouse.commitSnapshot(li, root2, 1L))
    }
    spark.stop()
  }
}
