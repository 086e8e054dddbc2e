package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: scan every registered query's PHYSICAL plan for scale
  * hazards — unpartitioned windows, cartesian products, non-broadcast
  * nested-loop joins — and report join strategies.
  * `runMain graft.tools.PlanAudit [sfDir]`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hazards = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // single-partition window: ORDER BY with no PARTITION BY
          "GlobalWindow" -> "Window \\[[^\\]]*\\], \\[[^\\]]*ASC|Window \\[[^\\]]*\\], \\[\\]".r
            .findFirstIn(plan).exists(_ => plan.contains("windowspecdefinition()")),
          "BroadcastNestedLoopJoin(inner-non-bcast)" ->
            (plan.contains("BroadcastNestedLoopJoin") && !plan.contains("BuildRight") &&
              !plan.contains("BuildLeft"))
        ).filter(_._2).map(_._1)
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin").map(j =>
          j -> j.r.findAllIn(plan).length).filter(_._2 > 0)
        if (hazards.nonEmpty) {
          flagged += 1
          println(s"HAZARD $name: ${hazards.mkString(", ")}")
        }
        if (joins.nonEmpty) println(s"joins  $name: ${joins.map { case (j, n) => s"$j=$n" }.mkString(" ")}")
      } catch {
        case e: Throwable => println(s"ERROR  $name: ${e.getMessage.take(120)}")
      }
    }
    println(s"done, $flagged hazard(s)")
    spark.stop()
  }
}
