package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.PipelineConfig.PatternSpec

/** One-pass, first-match-wins multi-pattern regex extraction.
  *
  * The Spark-native equivalent of the reference's regex parser applied as
  * a bank with router-style first-match semantics:
  *   - single `FindStringSubmatch` pass per pattern —
  *     `pkg/stanza/operator/parser/regex/parser.go:46-74` (reference
  *     `/root/reference`)
  *   - first-match break — `pkg/stanza/operator/transformer/router/
  *     transformer.go:59`
  *
  * Returns `struct(pattern: string, fields: map<string,string>)`, or NULL
  * when no pattern matches (the caller maps that to the stanza `on_error`
  * policy). A chain of k×g `regexp_extract` calls would run each regex
  * g times; this runs each at most once per row and stops at the first
  * hit, like the reference.
  *
  * Codegen: participates in whole-stage codegen by emitting a call to
  * [[matchRow]] through a reference object (same technique as Spark's
  * `RLike`/`StaticInvoke` family) — no interpreted fallback, no boxing of
  * the input string.
  */
case class MultiPatternExtract(child: Expression, patterns: Seq[PatternSpec])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_extract requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("pattern", StringType, nullable = false),
    StructField("fields", MapType(StringType, StringType, valueContainsNull = true), nullable = false)
  ))

  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def prettyName: String = "multi_pattern_extract"

  // Compiled once per task (serialized spec, transient compiled form) —
  // the analog of compile-at-Build() in the reference.
  //
  // Group-name normalisation: config patterns use reference-style names
  // (Go RE2 `(?P<tool_name>…)` or Java `(?<tool_name>…)`); Java rejects
  // both the `P` and any underscore in a group name. We rewrite the i-th
  // named group to a synthetic safe name and bind `fields(i)` by POSITION,
  // so the config stays reference-compatible.
  @transient private lazy val compiled: Array[(UTF8String, Pattern, Array[UTF8String], Array[String], String)] =
    patterns.map { p =>
      val (javaRegex, groupCount) = MultiPatternExtract.normalizeGroups(p.regex)
      require(groupCount == p.fields.length,
        s"pattern '${p.name}': ${p.fields.length} fields declared but $groupCount named groups found")
      (UTF8String.fromString(p.name),
       Pattern.compile(javaRegex),
       p.fields.map(UTF8String.fromString).toArray,
       Array.tabulate(groupCount)(i => s"gg$i"),
       MultiPatternExtract.literalPrefix(p.regex))
    }.toArray

  // One Matcher per (task thread × pattern), reset per row — Matcher
  // allocation is the dominant per-row garbage in a regex hot loop.
  @transient private lazy val localMatchers: ThreadLocal[Array[java.util.regex.Matcher]] =
    ThreadLocal.withInitial(() => compiled.map(_._2.matcher("")))

  /** Public so generated code can call it. Returns null when no match. */
  def matchRow(input: UTF8String): InternalRow = {
    val s = input.toString
    val matchers = localMatchers.get()
    var i = 0
    while (i < compiled.length) {
      val (name, _, keyUtf8, groupNames, prefix) = compiled(i)
      // literal-prefix fast path: skip the regex when the anchored literal
      // head can't match (the dominant case in a first-match bank)
      if (prefix == null || s.startsWith(prefix)) {
      val m = matchers(i).reset(s)
      // find(), not matches(): the reference semantics are first PARTIAL
      // match (FindStringSubmatch — parser/regex/parser.go:53 and
      // func_extract_patterns.go:58); anchored patterns behave identically
      if (m.find()) {
        val n = groupNames.length
        val keys = new Array[Any](n)
        val values = new Array[Any](n)
        var j = 0
        while (j < n) {
          keys(j) = keyUtf8(j)
          val g = m.group(groupNames(j))
          values(j) = if (g == null) null else UTF8String.fromString(g)
          j += 1
        }
        return InternalRow(name, ArrayBasedMapData(keys, values))
      }
      }
      i += 1
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    matchRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refTerm = ctx.addReferenceObj("mpe", this, classOf[MultiPatternExtract].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r = $refTerm.matchRow($c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MultiPatternExtract =
    copy(child = newChild)
}

object MultiPatternExtract {
  /** The named-group grammar `(?P<name>` / `(?<name>` — ONE definition
    * shared with [[SpanToAttributes]] (which binds attribute names to
    * group positions): two copies drifting apart would bind values to
    * the wrong names. */
  private[functions] val NamedGroup = "\\(\\?P?<([A-Za-z_][A-Za-z0-9_]*)>".r

  /** Rewrite `(?P<name>` / `(?<name>` named groups to Java-safe synthetic
    * names `gg0..ggN` (Java group names reject underscores and the RE2 `P`).
    * Returns (rewritten regex, number of named groups). */
  def normalizeGroups(regex: String): (String, Int) = {
    var i = -1
    val out = NamedGroup.replaceAllIn(regex, _ => { i += 1; s"(?<gg$i>" })
    (out, i + 1)
  }

  private val Meta = Set('(', ')', '[', ']', '{', '}', '.', '*', '+', '?',
    '|', '^', '$', '\\')

  /** Literal head of an `^`-anchored regex (chars before the first
    * metacharacter), or null when none — powers the startsWith fast path.
    *
    * Two soundness guards (user-supplied ConfigLoader regexes reach
    * here, not just the built-in bank):
    *  - a head character immediately followed by a quantifier
    *    ('?', '*', or '{') is OPTIONAL or repeated, so it is excluded
    *    from the prefix
    *    ("^https?://…" must fast-path on "http", not "https" — the old
    *    version silently skipped every http:// row);
    *  - a regex containing a top-level `|` gets NO prefix at all: in
    *    "^a|b" the anchor binds only the first branch, so a
    *    startsWith("a") test wrongly rejects rows matching "b".
    */
  def literalPrefix(regex: String): String = {
    // top-level alternation scan (escapes honored; '|' inside classes
    // or groups doesn't anchor-split, but a conservative any-unescaped
    // '|' check is safe: it only ever disables the fast path)
    var j = 1
    while (j < regex.length) {
      regex.charAt(j) match {
        case '\\' => j += 1
        case '|' => return null
        case _ =>
      }
      j += 1
    }
    if (!regex.startsWith("^")) return null
    val sb = new StringBuilder
    var i = 1
    while (i < regex.length && !Meta.contains(regex.charAt(i))) {
      sb += regex.charAt(i); i += 1
    }
    // drop the last literal char when a quantifier makes it optional
    // or repeated ("^abc?" → prefix "ab"; "^abc*" → "ab"; "^abc{0,2}" → "ab")
    if (i < regex.length && (regex.charAt(i) == '?' || regex.charAt(i) == '*'
        || regex.charAt(i) == '{') && sb.nonEmpty) {
      sb.setLength(sb.length - 1)
    }
    if (sb.isEmpty) null else sb.toString
  }
}
