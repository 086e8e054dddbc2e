package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: plan-shape diagnostics for a named registry query —
  * `runMain graft.tools.ExplainProbe <queryName> [sfDir]`.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q43_jsonais_canonicalize"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    Seq("from_json", "regexp_extract", "CaseWhen", "named_struct").foreach { tok =>
      println(s"$tok count: " + tok.r.findAllIn(plan).length)
    }
    println("plan size chars: " + plan.length)
    // physical shape: exchanges/sorts/windows are the shuffle budget
    val phys = df.queryExecution.executedPlan.toString
    Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Sort \\[", "Window \\[", "BroadcastExchange").foreach { tok =>
      println(s"${tok.replace("\\", "")} count: " + tok.r.findAllIn(phys).length)
    }
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println("run secs: " + (System.nanoTime() - t0) / 1e9)
    spark.stop()
  }
}
