package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Codegen-resident optimizer fence: the identity function, declared
  * non-deterministic.
  *
  * CollapseProject textually inlines a non-trivial producer expression into
  * every downstream reference (a `from_json` consumed by N `getField`s
  * parses the document N times — measured 251 copies in one round-2 plan;
  * an Exchange does not stop the collapse). Catalyst is NEVER allowed to
  * duplicate or move a non-deterministic expression — doing so would
  * change observable semantics — so wrapping the expensive projection in
  * this identity expression pins it to exactly one evaluation site:
  * CollapseProject refuses to inline it, filter/limit pushdown stops at
  * the projection that produces it, and downstream references see a plain
  * attribute.
  *
  * This is the codegen-friendly replacement for the row-encoder fence
  * (`Synthetic.fence`'s `mapPartitions(identity)`): the encoder fence
  * costs a serialize/deserialize round trip per row AND drops the
  * surrounding operators out of whole-stage codegen (the
  * `DeserializeToObject` interpreted islands PlanAudit counts); this
  * expression generates the child's own code verbatim, so the fenced
  * projection stays inside the codegen span and costs nothing at all.
  * The trade: `Synthetic.fence` remains the right tool when a TRUE
  * execution-graph barrier is needed (streaming row-boundary semantics);
  * for parse-once / branch-freely plans, prefer this.
  *
  * Non-determinism is a declaration to the OPTIMIZER only — evaluation is
  * the child's own codegen, bit-identical results, no state. Spark permits
  * non-deterministic expressions in Project (where all fence sites live);
  * CheckAnalysis rejects them in join conditions and aggregate keys, which
  * is exactly where a fenced column must anyway be materialized first.
  */
case class BarrierExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: never constant-folded, never inlined, never reordered
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // identity: emit the child's code and alias its result slots
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): BarrierExpression =
    copy(child = newChild)
  override def prettyName: String = "graft_barrier"
}
