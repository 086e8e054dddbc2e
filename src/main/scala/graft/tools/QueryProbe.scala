package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time ONE registered query for N full passes under the
  * Bench session configuration (local[32], AQE on, noop sink, cache
  * cleared around each pass). Isolates a query's own cost from suite
  * context — JIT contention, code-cache growth, host stalls — so a
  * per-query regression seen in a suite run can be attributed before
  * being "fixed". `runMain graft.tools.QueryProbe <name> [passes] [sfDir]`
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 4
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val times = (1 to passes).map { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      graft.core.CacheScope.scoped {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name pass $i: $dt%.2f s")
      dt
    }
    println(f"[probe] $name cold=${times.head}%.2f s best-warm=${times.tail.min}%.2f s ($sfDir)")
    spark.stop()
  }
}
