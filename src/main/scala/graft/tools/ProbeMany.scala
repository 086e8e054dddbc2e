package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time a LIST of registered queries under the Bench session
  * configuration (cold + N-1 warm passes each, noop sink, cache cleared
  * around each pass) in one JVM — the optimization rounds' quick
  * before/after measurement between full bench runs.
  * `runMain graft.tools.ProbeMany <q1,q2,...> [passes] [sfDir]`
  */
object ProbeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 1) args(1).toInt else 3
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
    // same warmup as Bench so the first query is not charged session costs
    try graft.core.Tables.events(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[probe] warmup failed (continuing): ${e.getMessage}")
    }
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val osb = ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to passes).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val (gc0, cpu0) = (gcs.map(_.getCollectionTime).sum,
          osb.map(_.getProcessCpuTime).getOrElse(0L))
        val t0 = System.nanoTime()
        graft.core.CacheScope.scoped {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val gcD = gcs.map(_.getCollectionTime).sum - gc0
        val cpuD = (osb.map(_.getProcessCpuTime).getOrElse(0L) - cpu0) / 1000000L
        (wall, gcD, cpuD)
      }
      println(f"[probe] $name%-34s cold=${times.head._1}%6.2f steady=${times.tail.map(_._1).min}%6.2f (${times.tail.map(t => f"${t._1}%.2f").mkString("/")}) gc=(${times.map(_._2).mkString("/")})ms cpu=(${times.map(_._3).mkString("/")})ms")
      name -> times.tail.map(_._1).min
    }
    println("[probe] steady_sum=" + f"${results.map(_._2).sum}%.2f" +
      " over " + results.length + " queries (" + sfDir + ")")
    spark.stop()
  }
}
