package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: execute one registered query (noop sink) and print the
  * FINAL adaptive plan — the only place runtime exchange/stage reuse is
  * visible. `runMain graft.tools.FinalPlanProbe <name> [sfDir]`
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var finalPlan = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = finalPlan = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    Thread.sleep(1000) // let the async listener deliver
    val s = finalPlan
    println(s)
    Seq("ReusedExchange", "Exchange hashpartitioning", "BroadcastExchange",
      "Window", "Sort ").foreach { tok =>
      println(s"[finalplan] $tok count: ${tok.r.findAllIn(s).length}")
    }
    spark.stop()
  }
}
