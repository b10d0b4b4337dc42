package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The span processor's `to_attributes` rename — one pass over the span
  * name per rule (`processor/spanprocessor/span.go:160-225` in
  * `/root/reference`): for each rule regex whose named groups match the
  * (current) span name, every group value becomes an attribute and the
  * matched group text is replaced IN the span name by `{groupName}`;
  * rules chain on the rewritten name; `break_after_match` stops at the
  * first matching rule. Unanchored first-match like Go's
  * `FindStringSubmatch`.
  *
  * Returns `struct(name: string, attrs: map<string,string>)` — the
  * rewritten name plus the extracted attributes (later rules win on key
  * collision, like repeated `attrs.PutStr`).
  *
  * A built-in-function rendering exists only when the text between
  * groups is literal; the general case needs per-row group POSITIONS
  * (`FindStringSubmatchIndex`), hence a custom expression (codegen via
  * reference-object call, the [[MultiPatternExtract]] technique).
  */
case class SpanToAttributes(child: Expression, rules: Seq[String],
                            breakAfterMatch: Boolean)
    extends UnaryExpression {
  require(rules.nonEmpty, "at least one to_attributes rule")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"span_to_attributes requires string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("attrs", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "span_to_attributes"

  /** (compiled pattern, attribute name per group index 1..n). */
  @transient private lazy val compiled: Array[(Pattern, Array[String])] =
    rules.map { r =>
      val names = SpanToAttributes.groupNames(r)
      val (javaRegex, _) = MultiPatternExtract.normalizeGroups(r)
      val p = Pattern.compile(javaRegex)
      // compare against the compiled TOTAL capturing-group count — the
      // old `normalizeGroups(r)._2 == names.length` compared two counts
      // of the same named-group regex (vacuously true), so a rule with
      // an unnamed capturing group compiled and then crashed (or bound
      // values to the wrong attribute names) at runtime
      require(p.matcher("").groupCount() == names.length,
        s"rule must use only NAMED capturing groups " +
        s"(found ${p.matcher("").groupCount()} groups, ${names.length} named): $r")
      // nested named groups make the {attr} name-rewrite ill-defined
      // (the rewrite walks groups left-to-right assuming disjoint
      // spans; the Go reference PANICS on them at match time via an
      // oldName[idx:start] slice with idx > start, span.go:205-209) —
      // reject the config at construction, not one task at a time
      SpanToAttributes.assertNoNestedNamedGroups(javaRegex, r)
      (p, names)
    }.toArray

  /** Public so generated code can call it. */
  def rewrite(nameRaw: UTF8String): InternalRow = {
    var name = nameRaw.toString
    val keys = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val vals = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var r = 0
    var done = false
    while (r < compiled.length && !done) {
      val (p, attrNames) = compiled(r)
      // empty names are skipped BY THE REFERENCE ("There is no span
      // name to work on", span.go:161-164) — the guard is faithful,
      // not defensive
      if (name.nonEmpty && attrNames.nonEmpty) {
        val m = p.matcher(name)
        if (m.find()) { // Go FindStringSubmatch: first match, unanchored
          val sb = new java.lang.StringBuilder
          var idx = 0
          var g = 1
          while (g <= m.groupCount()) {
            val v = m.group(g)
            if (v != null) {
              keys += UTF8String.fromString(attrNames(g - 1))
              vals += UTF8String.fromString(v)
              sb.append(name, idx, m.start(g))
                .append('{').append(attrNames(g - 1)).append('}')
              idx = m.end(g)
            }
            g += 1
          }
          if (idx < name.length) sb.append(name, idx, name.length)
          name = sb.toString
          if (breakAfterMatch) done = true
        }
      }
      r += 1
    }
    // later rules win on key collision (repeated PutStr): keep LAST
    val lastIdx = keys.zipWithIndex.groupBy(_._1).map { case (_, xs) => xs.last._2 }.toSet
    val k = keys.indices.filter(lastIdx).map(keys(_)).toArray[Any]
    val v = vals.indices.filter(lastIdx).map(vals(_)).toArray[Any]
    InternalRow(UTF8String.fromString(name), ArrayBasedMapData(k, v))
  }

  override def nullSafeEval(input: Any): Any =
    rewrite(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("sta", this, classOf[SpanToAttributes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $refTerm.rewrite($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SpanToAttributes =
    copy(child = newChild)
}

object SpanToAttributes {
  /** Named-group attribute names in order of appearance — the grammar is
    * [[MultiPatternExtract.NamedGroup]], the same regex normalizeGroups
    * rewrites with, so the two walks can never disagree on what counts
    * as a named group. */
  def groupNames(regex: String): Array[String] =
    MultiPatternExtract.NamedGroup.findAllMatchIn(regex).map(_.group(1)).toArray

  /** Reject a rule whose NAMED group opens inside another named group —
    * syntactic walk over the (already-normalized, Java-syntax) regex:
    * escapes and character classes are skipped; `(?<name>` counts as
    * named (lookbehinds `(?<=`/`(?<!` do not). */
  private[functions] def assertNoNestedNamedGroups(javaRegex: String,
                                                   rule: String): Unit = {
    var i = 0; var esc = false; var inClass = false; var namedDepth = 0
    val stack = scala.collection.mutable.Stack.empty[Boolean]
    while (i < javaRegex.length) {
      val c = javaRegex.charAt(i)
      if (esc) esc = false
      else c match {
        case '\\' => esc = true
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          val named = javaRegex.startsWith("(?<", i) &&
            !javaRegex.startsWith("(?<=", i) && !javaRegex.startsWith("(?<!", i)
          if (named && namedDepth > 0) throw new IllegalArgumentException(
            s"to_attributes rule has NESTED named groups (the {attr} " +
            s"name-rewrite is ill-defined for overlapping spans): $rule")
          stack.push(named)
          if (named) namedDepth += 1
        case ')' if !inClass =>
          if (stack.nonEmpty && stack.pop()) namedDepth -= 1
        case _ =>
      }
      i += 1
    }
  }
}
