package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Severity alias → number in one hash lookup.
  *
  * The declarative rendering folds the full default table
  * (`pkg/stanza/operator/helper/severity_builder.go:17-87` — ~90
  * aliases) into a CASE chain; codegen'd, but still up to 90 string
  * comparisons per row (measured ~2-3 s of the p02 query at sf0.1).
  * This expression lowercases once (ASCII fast path, matching Spark's
  * `lower()` for the ASCII alias table) and probes a HashMap.
  *
  * Unknown text → 0 (the reference's Default severity), matching the
  * CASE chain's `otherwise(0)`.
  */
case class SeverityLookup(child: Expression, aliases: Seq[(String, Int)])
    extends UnaryExpression {
  require(aliases.forall(_._1.forall(c => c < 128 && !c.isUpper)),
    "severity aliases must be lowercase ASCII (lowercase parity with Spark's lower())")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"severity_lookup requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "severity_lookup"

  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](aliases.size * 2)
    aliases.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
    m
  }

  /** Public so generated code can call it. */
  def lookup(s: UTF8String): Int = {
    val v = table.get(s.toLowerCase.toString)
    if (v == null) 0 else v.intValue()
  }

  override def nullSafeEval(input: Any): Any =
    lookup(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("sev", this, classOf[SeverityLookup].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.lookup($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SeverityLookup =
    copy(child = newChild)
}
