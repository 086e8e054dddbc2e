package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `{{field|modifier:arg}}` template renderer compiled to a
  * Catalyst `concat` tree (SURVEY C23 — mini-DSL #2).
  *
  * Semantics from `display-proxy/index.html:1043-1111`:
  *  - `{{path}}` → string value; null / '' / 'null' / 'undefined' → ''
  *  - modifiers: `fixed:n` (toFixed), `round` (half-up to int), `upper`,
  *    `lower`, `date` (NZ-local "d MMM yyyy, HH:mm"), `ago` (relative
  *    buckets vs a supplied "now")
  *  - literal text between placeholders passes through; runs of 3+ newlines
  *    collapse to 2; result trimmed
  *
  * The compiler emits one `Column` per template — pure built-ins, codegen'd.
  */
object TemplateDsl {

  private val Placeholder = """\{\{([^}]+)\}\}""".r

  /** Compile a template to a Column. `resolve` maps a dot-path to a Column;
    * `now` supplies the reference time for `ago` (epoch micros).
    */
  def compile(template: String, resolve: String => Column,
      now: Column = current_timestamp().cast("long") * 1000000L): Column = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- Placeholder.findAllMatchIn(template)) {
      if (m.start > last) pieces += lit(template.substring(last, m.start))
      pieces += renderExpr(m.group(1).trim, resolve, now)
      last = m.end
    }
    if (last < template.length) pieces += lit(template.substring(last))
    val joined = if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
    trim(regexp_replace(joined, "\n{3,}", "\n\n"))
  }

  private def renderExpr(expr: String, resolve: String => Column, now: Column): Column = {
    val parts = expr.split('|')
    val path = parts(0).trim
    val modifier = if (parts.length > 1) Some(parts(1).trim) else None
    val raw = resolve(path)
    val s = raw.cast("string")
    // null / '' / 'null' / 'undefined' → ''
    val blank = s.isNull || s === "" || s === "null" || s === "undefined"
    val rendered = modifier match {
      case None => s
      case Some(mod) =>
        val mp = mod.split(':')
        (mp(0), mp.lift(1)) match {
          case ("fixed", Some(n)) =>
            // JS toFixed: fixed decimal places, half-up, NO thousands
            // separators (format_number would insert commas)
            raw.cast("double")
              .cast(org.apache.spark.sql.types.DecimalType(38, n.toInt))
              .cast("string")
          case ("round", _) =>
            round(raw.cast("double"), 0).cast("long").cast("string")
          case ("upper", _) => upper(s)
          case ("lower", _) => lower(s)
          case ("date", _) =>
            date_format(
              from_utc_timestamp(to_timestamp(s), "Pacific/Auckland"),
              "d MMM yyyy, HH:mm")
          case ("ago", _) =>
            val ts = to_timestamp(s)
            val ageMin = floor((now - ts.cast("long") * 1000000L) / 60000000L)
            when(ts.isNull, s)
              .when(ageMin < 1, lit("just now"))
              .when(ageMin < 60, concat(ageMin.cast("string"), lit("min ago")))
              .when(ageMin < 1440, concat(floor(ageMin / 60).cast("string"), lit("h ago")))
              .otherwise(concat(floor(ageMin / 1440).cast("string"), lit("d ago")))
          case _ => s
        }
    }
    when(blank, lit("")).otherwise(coalesce(rendered, lit("")))
  }
}
