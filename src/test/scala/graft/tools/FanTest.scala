package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe: times every SparkEntry query as-is vs with all table
  * reads fanned out to defaultParallelism (graft.probe.fanout), to
  * find scan-starved queries. Not part of the driver contract.
  */
object FanTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold","1000000")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.get("FAN_ONLY").map(_.split(",").toSet)
      .map(o => SparkEntry.queries.keys.filter(o.contains).toSeq.sorted)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    def run1(name: String, fan: Boolean): Double = {
      spark.conf.set("graft.probe.fanout", fan.toString)
      System.gc()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime()-t0)/1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking=false))
      spark.sharedState.cacheManager.clearCache()
      dt
    }
    // warm pass
    for (n <- names) { try run1(n, false) catch { case _: Throwable => } }
    // interleave on/off (and start with on) so JIT/GC warm-up bias
    // doesn't systematically favor whichever mode runs later
    val rows = for (n <- names) yield {
      val on1  = try run1(n, true)  catch { case _: Throwable => -1.0 }
      val off1 = try run1(n, false) catch { case _: Throwable => -1.0 }
      val on2  = try run1(n, true)  catch { case _: Throwable => -1.0 }
      val off2 = try run1(n, false) catch { case _: Throwable => -1.0 }
      (n, math.min(off1, off2), math.min(on1, on2))
    }
    println("FANPROBE_BEGIN")
    for ((n, off, on) <- rows.sortBy{case (_,off,on) => on-off})
      println(f"$n%-28s off $off%7.3f on $on%7.3f delta ${on-off}%+7.3f")
    println("FANPROBE_END")
    spark.stop()
  }
}
