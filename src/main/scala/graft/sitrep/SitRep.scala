package graft.sitrep

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The SitRep pipeline (SURVEY §3.3 fourth lifecycle,
  * `lambda/sitrep-generator/index.py`): scheduled multi-layer feature
  * fetch → stale/deleted filters (F8/F9) → context projection (P5) →
  * LLM summarization → JSON extraction (C25) → sink (K5).
  *
  * The LLM call sits behind [[Summarizer]] — a deterministic stub stands in
  * here (no model endpoints in this environment); everything around it is
  * real Spark.
  */
object SitRep {

  /** P5: context projection — keep only `{callsign, time, metadata}` per
    * feature (`index.py:300-306`), after the stale (F8) and deleted-quality
    * (F9) drops (`:241-263`).
    */
  def buildContext(features: DataFrame, nowSec: Long): DataFrame =
    features
      .filter(col("stale_sec").isNull || col("stale_sec") > nowSec) // F8
      .filter(coalesce(
        get_json_object(col("metadata"), "$.quality") =!= "deleted", lit(true))) // F9
      .select(col("callsign"), col("time_sec").as("time"), col("metadata")) // P5

  /** The LLM stage contract (`index.py:397-425` calls Bedrock). */
  trait Summarizer extends Serializable {
    def summarize(contextJson: String): String
  }

  /** STUB — deterministic fake: echoes a summary JSON embedding the input
    * size, wrapped in chatty prose like a real model response.
    */
  object StubSummarizer extends Summarizer {
    def summarize(contextJson: String): String =
      s"Here is the situation report you asked for:\n" +
        s"""{"summary": "auto", "n_features": ${contextJson.count(_ == '\n') + 1}, """ +
        s""""confidence": 0.9}\nLet me know if you need more detail."""
  }

  /** C25: extract the FIRST balanced `{...}` object from LLM prose
    * (`index.py:389-394`) — brace counting that respects strings and
    * escapes, not a lazy regex (which breaks on nested objects).
    */
  def extractFirstJson(text: String): Option[String] = {
    val start = text.indexOf('{')
    if (start < 0) None
    else {
      var depth = 0
      var inString = false
      var escaped = false
      var i = start
      while (i < text.length) {
        val c = text.charAt(i)
        if (escaped) escaped = false
        else if (inString) {
          if (c == '\\') escaped = true
          else if (c == '"') inString = false
        } else c match {
          case '"' => inString = true
          case '{' => depth += 1
          case '}' =>
            depth -= 1
            if (depth == 0) return Some(text.substring(start, i + 1))
          case _ =>
        }
        i += 1
      }
      None
    }
  }

  /** End-to-end: context → summarize per group (one LLM call per report
    * key, batched per partition) → parse the model's JSON out of the prose.
    * Returns (report_key, summary_json).
    */
  def summarizeReports(context: DataFrame, keyCol: String,
      summarizer: Summarizer): Dataset[(String, String)] = {
    val spark = context.sparkSession
    import spark.implicits._
    context
      .groupBy(col(keyCol).cast("string").as("k"))
      .agg(concat_ws("\n", collect_list(to_json(struct(col("*"))))).as("ctx"))
      .as[(String, String)]
      .mapPartitions(_.map { case (k, ctx) =>
        k -> extractFirstJson(summarizer.summarize(ctx)).getOrElse("{}")
      })
  }
}
