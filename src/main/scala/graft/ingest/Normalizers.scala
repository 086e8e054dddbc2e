package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-source normalization scalars (SURVEY §2.3 P1-P3, §2.8 C2/C3/C6/C12).
  *
  * The reference's scrapers parse their sources with regex + month-name
  * maps (`power-outages/scrapers/tlc.js:8-20`, `mainpower.js:6-13`); these
  * Column forms mirror that construction (regexp_extract + when-ladder →
  * make_timestamp) rather than relying on locale-dependent pattern parsing.
  *
  * Timezone (SURVEY §7.3.2): the reference parses with `new Date(...)` in
  * SERVER-LOCAL time; the engine pins every source to an explicit zone —
  * UTC here — and documents the divergence.
  */
object Normalizers {

  private val MonthLadder: Column => Column = name =>
    Seq("January", "February", "March", "April", "May", "June", "July",
      "August", "September", "October", "November", "December")
      .zipWithIndex
      .foldRight(lit(null).cast("int")) { case ((m, i), tail) =>
        when(name === m, lit(i + 1)).otherwise(tail)
      }

  /** C2: `"Friday, February 20, 2026 at 08:30"` → timestamp (null when the
    * shape doesn't match — the reference returns null on regex miss).
    */
  def parseTlcDate(s: Column): Column = {
    val re = """(\w+), (\w+) (\d+), (\d+) at (\d+):(\d+)"""
    val month = MonthLadder(regexp_extract(s, re, 2))
    when(regexp_extract(s, re, 2) =!= "" && month.isNotNull,
      make_timestamp(
        regexp_extract(s, re, 4).cast("int"), month,
        regexp_extract(s, re, 3).cast("int"),
        regexp_extract(s, re, 5).cast("int"),
        regexp_extract(s, re, 6).cast("int"), lit(0)))
  }

  /** C3: `"20/02/2026 17:24"` with `TBA`/`None` (and regex miss) → null. */
  def parseMainpowerDate(s: Column): Column = {
    val re = """(\d+)/(\d+)/(\d+) (\d+):(\d+)"""
    when(s.isNotNull && !s.isin("TBA", "None") && regexp_extract(s, re, 1) =!= "",
      make_timestamp(
        regexp_extract(s, re, 3).cast("int"),
        regexp_extract(s, re, 2).cast("int"),
        regexp_extract(s, re, 1).cast("int"),
        regexp_extract(s, re, 4).cast("int"),
        regexp_extract(s, re, 5).cast("int"), lit(0)))
  }

  /** C6: ETA `MM/dd HH:mm` with zero-padding and `'00'` defaults for
    * missing components (`ais-proxy/server.js:501-508`).
    */
  def etaFormat(month: Column, day: Column, hour: Column, minute: Column): Column = {
    def pad(c: Column): Column =
      coalesce(lpad(c.cast("string"), 2, "0"), lit("00"))
    concat(pad(month), lit("/"), pad(day), lit(" "), pad(hour), lit(":"), pad(minute))
  }

  /** C12: `"(\d+)\s+customers?"` count extraction, 0 when absent. */
  def extractCustomerCount(text: Column): Column =
    coalesce(regexp_extract(text, """(\d+)\s+customers?""", 1).cast("int"), lit(0))
}
