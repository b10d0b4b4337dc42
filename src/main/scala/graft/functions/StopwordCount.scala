package graft.functions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of whitespace-separated tokens of `lower(text)` that are in a
  * fixed word set — one codegen pass.
  *
  * Equivalent to `size(filter(split(lower(text), "\\s+"),
  * t -> t.isin(words)))`, whose lambda is interpreted per token with a
  * linear isin scan (the dominant cost of quality scoring and language
  * ID at sf0.1). The word banks in use are ASCII (TextAnalysis
  * `stopwordBanks`), for which Java's Locale.ROOT lowercase agrees with
  * Spark's `lower()`; the equivalence is pinned by a differential test.
  */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {
  // Locale.ROOT lowercase only provably agrees with Spark's
  // UTF8String-based lower() for ASCII; a non-ASCII bank would silently
  // break langId/quality parity, so reject it at construction
  require(words.forall(_.forall(_ < 128)),
    "StopwordCount word banks must be ASCII (lowercase parity with Spark's lower())")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"stopword_count requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stopword_count"

  @transient private lazy val wordSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](words.size * 2)
    words.foreach(w => s.add(w))
    s
  }
  @transient private lazy val ws = Pattern.compile("\\s+")

  /** Public so generated code can call it. */
  def count(input: UTF8String): Int = {
    val toks = ws.split(input.toString.toLowerCase(Locale.ROOT), -1)
    var n = 0
    var i = 0
    while (i < toks.length) {
      if (wordSet.contains(toks(i))) n += 1
      i += 1
    }
    n
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("swc", this, classOf[StopwordCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}
