package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: scan every registered query's PHYSICAL plan for scale
  * hazards — unpartitioned windows, cartesian products, non-broadcast
  * nested-loop joins — report join strategies, and measure whole-stage-
  * codegen coverage (narrow `WholeStageCodegen` spans mean interpreted
  * islands on the hot path — the thing to widen).
  * `runMain graft.tools.PlanAudit [sfDir]`
  */
object PlanAudit {

  /** Fraction of codegen-ELIGIBLE leaf-to-root operators that actually sit
    * inside a WholeStageCodegen span, plus the names of eligible operators
    * left outside (the interpreted islands). Scans/exchanges/commands are
    * not eligible and don't count against coverage.
    */
  def codegenCoverage(plan: org.apache.spark.sql.execution.SparkPlan):
      (Int, Int, Seq[String]) = {
    import org.apache.spark.sql.execution._
    var inside = 0
    var eligible = 0
    val islands = Seq.newBuilder[String]
    def walk(p: SparkPlan, inCodegen: Boolean): Unit = p match {
      // AQE wrappers are childless — descend into their current plan
      case a: adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan, inCodegen)
      case q: adaptive.QueryStageExec => walk(q.plan, inCodegen)
      case w: WholeStageCodegenExec => w.children.foreach(walk(_, true))
      case _: InputRDDCodegen => // incl. InputAdapter: span boundary
        p.children.foreach(walk(_, false))
      case c: CodegenSupport if c.supportCodegen =>
        eligible += 1
        if (inCodegen) inside += 1 else islands += p.nodeName
        p.children.foreach(walk(_, inCodegen))
      case _ =>
        p.children.foreach(walk(_, false))
    }
    walk(plan, inCodegen = false)
    (inside, eligible, islands.result().distinct)
  }

  /** Statically compile every WholeStageCodegen span in the plan and
    * return the failures ("method grows beyond 64 KB" and friends).
    *
    * At execution time Spark catches these, logs one ERROR line, and
    * SILENTLY falls back to interpreted evaluation — correct results, real
    * at-scale cost, no failing signal anywhere (q78 shipped a round with
    * exactly that). Compiling the generated source at audit time turns the
    * silent de-optimization into a hard audit failure.
    */
  def codegenCompileErrors(plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution._
    val errs = Seq.newBuilder[String]
    def walk(p: SparkPlan): Unit = p match {
      case a: adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: adaptive.QueryStageExec => walk(q.plan)
      case w: WholeStageCodegenExec =>
        try {
          val (_, source) = w.doCodeGen()
          org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compile(source)
        } catch {
          case e: Throwable =>
            errs += s"${w.child.nodeName}: ${String.valueOf(e.getMessage).linesIterator.next().take(160)}"
        }
        w.children.foreach(walk)
      case _ => p.children.foreach(walk)
    }
    walk(plan)
    errs.result()
  }

  /** The justified-island ledger (VERDICT r10 #4): every interpreted
    * island remaining after the graft_barrier conversion, with the reason
    * it CANNOT be widened. The audit prints the justification next to the
    * coverage line and treats any island NOT in this ledger as a HAZARD —
    * a new interpreted operator can't appear silently.
    *
    * The remaining islands are structural, not fixable by widening:
    *  - Spark's own `from_json` (JsonToStructs) is CodegenFallback, so any
    *    projection containing it is interpreted in ANY Spark plan; behind
    *    graft_barrier it runs exactly once per row.
    *  - The typed Dataset pipelines (raster gather, codec samplers, the
    *    jsonais dialect dispatch) pay one deliberate encoder boundary for
    *    imperative per-partition kernels — the sanctioned mapPartitions
    *    shape; DeserializeToObject IS that boundary.
    */
  val justifiedIslands: Map[String, Map[String, String]] = Map(
    "q31_filter_dsl" -> Map(
      "Project" -> "from_json is CodegenFallback in Spark itself; single parse behind graft_barrier"),
    "q32_template_render" -> Map(
      "Project" -> "from_json is CodegenFallback in Spark itself; single parse behind graft_barrier"),
    "q43_jsonais_canonicalize" -> Map(
      "Project" -> "from_json staging around the typed dialect dispatch (CodegenFallback in Spark itself)",
      "DeserializeToObject" -> "typed dispatch boundary: one encoder round trip replaces a ~100 KB interpreted expression tree"),
    "q69_reproject_checksum" -> Map(
      "DeserializeToObject" -> "typed per-pixel gather kernel (R4): imperative raster loop, the sanctioned mapPartitions shape",
      "Filter" -> "typed filter inside the reproject Dataset pipeline (object-domain predicate)"),
    "q71_frame_sample" -> Map(
      "DeserializeToObject" -> "typed codec sampler (L12): batched binary mapPartitions, the brief's stub-codec plumbing shape"))

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static audit: AQE defers codegen collapse to per-stage
      // materialization, so the adaptive initial plan never shows
      // WholeStageCodegen spans — audit the non-adaptive physical plan
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var coveredTotal = 0
    var eligibleTotal = 0
    // justified-exemption ledger for the summary (VERDICT r18 #4): every
    // eligible operator left outside a span is either a named, reasoned
    // exemption here or a HAZARD above — the coverage line accounts for
    // all of them, so "not 100%" always decomposes into pinned reasons
    var exemptTotal = 0
    val exemptions = Seq.newBuilder[(String, Int, Map[String, String])]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val executed = fn(spark, dir).queryExecution.executedPlan
        val plan = executed.toString
        val (inside, eligible, islands) = codegenCoverage(executed)
        coveredTotal += inside; eligibleTotal += eligible
        val compileErrs = codegenCompileErrors(executed)
        if (compileErrs.nonEmpty) {
          flagged += 1
          compileErrs.foreach(e => println(s"HAZARD $name: codegen-compile-error $e"))
        }
        if (eligible > 0 && inside < eligible) {
          println(s"codegen $name: $inside/$eligible in whole-stage spans; " +
            s"interpreted islands: ${islands.mkString(", ")}")
          val ledger = justifiedIslands.getOrElse(name, Map.empty)
          var allJustified = true
          islands.foreach { node =>
            ledger.get(node) match {
              case Some(reason) => println(s"island-ok $name/$node: $reason")
              case None =>
                allJustified = false
                flagged += 1
                println(s"HAZARD $name: unjustified interpreted island '$node' " +
                  "— widen the span (graft_barrier / native expression) or " +
                  "add it to PlanAudit.justifiedIslands with a reason")
            }
          }
          if (allJustified) {
            exemptTotal += eligible - inside
            exemptions += ((name, eligible - inside,
              islands.map(n => n -> ledger(n)).toMap))
          }
        }
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
    println(f"codegen coverage: $coveredTotal/$eligibleTotal eligible operators in whole-stage spans (${100.0 * coveredTotal / math.max(1, eligibleTotal)}%.1f%%)")
    // the exempt list rides the summary (VERDICT r18 #4): coverage is
    // 100% minus documented exemptions, and the documentation is HERE
    val ex = exemptions.result()
    println(s"justified exemptions: $exemptTotal operator instance(s) " +
      s"across ${ex.size} quer${if (ex.size == 1) "y" else "ies"}:")
    ex.foreach { case (name, n, reasons) =>
      reasons.foreach { case (node, reason) =>
        println(s"  $name/$node: $reason")
      }
      if (n > reasons.size) println(s"  $name: ($n instances total)")
    }
    val nonExempt = eligibleTotal - exemptTotal
    println(f"effective coverage excluding justified exemptions: " +
      f"$coveredTotal/$nonExempt (${100.0 * coveredTotal / math.max(1, nonExempt)}%.1f%%)")
    println(s"done, $flagged hazard(s)")
    spark.stop()
    // fail loudly: a hazard (including a codegen compile error, which
    // Spark itself only WARNs about before silently going interpreted)
    // must break the audit, not scroll past it
    if (flagged > 0) sys.exit(1)
  }
}
