package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Column-API entry for the engine's HyperLogLog sketch aggregate
  * ([[graft.plans.HyperLogLogAgg]]). Requires the graft function registry
  * ([[graft.plans.GraftExtensions.register]] — the table loader installs
  * it), so it resolves in both the Column API and raw SQL
  * (`SELECT graft_hll(col, 11) FROM ...`).
  */
object ApproxDistinct {

  /** 2^11 registers = 2 KB per group, ~2.3% relative standard error. */
  val DefaultPrecision = 11

  def hllDistinct(c: Column, precision: Int = DefaultPrecision): Column =
    call_function("graft_hll", c, lit(precision))
}
