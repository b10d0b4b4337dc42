package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential golden test against the reference's OWN OTTL e2e corpus
  * (`/root/reference/pkg/ottl/e2e/e2e_test.go`): exact statements, exact
  * expected values transcribed from the `want` closures. */
class GoldenOttlSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: Column): T =
    Seq(Tuple1("x")).toDF("dummy").select(c.as("r")).collect().head.getAs[T]("r")

  test("""FNV("pass") == 266877920130663416 (e2e_test.go:326)""") {
    assert(eval1[Long](Ottl.fnv1a64(lit("pass"))) == 266877920130663416L)
  }

  test("""ExtractPatterns("aa123bb", "(?P<numbers>\d+)") → {numbers: 123} — PARTIAL match (e2e_test.go:319)""") {
    val m = Seq(Tuple1("x")).toDF("dummy")
      .select(Ottl.extractPatterns(lit("aa123bb"), "(?P<numbers>\\d+)", Seq("numbers")).as("r"))
      .collect().head.getMap[String, String](0).toMap
    assert(m == Map("numbers" -> "123"))
  }

  test("""Base64Decode("cGFzcw==") == "pass" (e2e_test.go:253)""") {
    assert(eval1[String](Ottl.base64Decode(lit("cGFzcw=="))) == "pass")
  }

  test("""Concat(["A","B"], ":") == "A:B" (e2e_test.go:259)""") {
    assert(eval1[String](Ottl.ottlConcat(":", lit("A"), lit("B"))) == "A:B")
  }

  test("ConvertCase family (e2e_test.go:265-283)") {
    assert(eval1[String](Ottl.convertCase(lit("get"), "upper")) == "GET")
    assert(eval1[String](Ottl.convertCase(lit("PASS"), "lower")) == "pass")
    assert(eval1[String](Ottl.convertCase(lit("fooBar"), "snake")) == "foo_bar")
    assert(eval1[String](Ottl.convertCase(lit("foo_bar"), "camel")) == "FooBar")
  }

  test("""Hour(Time("12", "%H")) == 12 (e2e_test.go:332)""") {
    assert(eval1[Int](Ottl.hourOf(Ottl.timeParse(lit("12"), "HH"))) == 12)
  }

  test("""Hours(Duration("90m")) == 1.5 (e2e_test.go:338)""") {
    assert(eval1[Double](Ottl.durationSeconds(lit("90m")) / 3600.0) == 1.5)
  }

  test("duration-unit family returns Go time.Duration accessor types (func_hours.go …)") {
    assert(eval1[Double](Ottl.durationHours(lit("90m"))) == 1.5)
    assert(eval1[Double](Ottl.durationMinutes(lit("90s"))) == 1.5)
    assert(eval1[Double](Ottl.durationSeconds(lit("1h2m3s"))) == 3723.0)
    assert(eval1[Long](Ottl.durationMillis(lit("1.5s"))) == 1500L)
    assert(eval1[Long](Ottl.durationMicros(lit("1.5s"))) == 1500000L)
    assert(eval1[Long](Ottl.durationNanos(lit("1.5s"))) == 1500000000L)
    // double-representation hazard: 0.3*1e9 = 2.9999999999999994e8 — a
    // bare bigint cast truncated this to 299999999; Go's exact integer
    // Duration reads 300000000 (round-at-nanos fix)
    assert(eval1[Long](Ottl.durationNanos(lit("0.3s"))) == 300000000L)
    assert(eval1[Long](Ottl.durationMicros(lit("0.3s"))) == 300000L)
    // ...while Go TRUNCATES genuine sub-unit remainders:
    // Duration("0.0015s").Milliseconds() == 1, not 2
    assert(eval1[Long](Ottl.durationMillis(lit("0.0015s"))) == 1L)
    assert(eval1[Long](Ottl.durationMicros(lit("0.0000015s"))) == 1L)
    // sub-second units (time.ParseDuration grammar): "100ms" is 0.1 s,
    // NOT 100 minutes — the minutes regex must not grab the 'm' of "ms"
    assert(eval1[Double](Ottl.durationSeconds(lit("100ms"))) == 0.1)
    assert(eval1[Long](Ottl.durationMillis(lit("100ms"))) == 100L)
    assert(eval1[Long](Ottl.durationMicros(lit("1.5ms"))) == 1500L)
    assert(eval1[Long](Ottl.durationMicros(lit("2us"))) == 2L)
    assert(eval1[Long](Ottl.durationNanos(lit("300ns"))) == 300L)
    // fractional non-second units parse whole ("1.5m" is 90 s, not 5 min)
    assert(eval1[Double](Ottl.durationSeconds(lit("1.5m"))) == 90.0)
    assert(eval1[Double](Ottl.durationHours(lit("1.5h"))) == 1.5)
    // one leading sign negates the WHOLE duration (Go grammar):
    // ParseDuration("-1.5h") = -5400 s — the unit regexes see only the
    // digits, so the sign previously vanished
    assert(eval1[Double](Ottl.durationSeconds(lit("-1.5h"))) == -5400.0)
    assert(eval1[Long](Ottl.durationMillis(lit("-1.5s"))) == -1500L)
    assert(eval1[Long](Ottl.durationNanos(lit("-0.3s"))) == -300000000L)
  }

  test("UnixNano/Unix round-trip (func_unix_nano.go, func_unix.go)") {
    val ts = lit("1970-01-01 00:00:01.5").cast("timestamp")
    assert(eval1[Long](Ottl.unixNanos(ts)) == 1500000000L)
    assert(eval1[java.sql.Timestamp](Ottl.unixToTime(lit(1L)))
      .getTime == 1000L)
    // Unix(sec, nanos): nanos folded at µs precision
    assert(eval1[java.sql.Timestamp](Ottl.unixToTime(lit(1L), lit(500000000L)))
      .getTime == 1500L)
  }

  test("Now() is plan-time-fixed: all rows in a batch agree (func_now.go)") {
    val two = Seq(1, 2).toDF("i")
      .select(Ottl.now().as("t")).collect().map(_.getTimestamp(0)).toSeq
    assert(two.head != null && two.head == two(1))
  }

  test("replace_all_matches: whole-value glob over map values (func_replace_all_matches_test.go)") {
    val m = map(lit("k1"), lit("hello world"), lit("k2"), lit("goodbye"))
    val out = Seq(Tuple1("x")).toDF("dummy")
      .select(Ottl.replaceAllMatches(m, "hello*", "hello {universe}").as("r"))
      .collect().head.getMap[String, String](0).toMap
    assert(out == Map("k1" -> "hello {universe}", "k2" -> "goodbye"))
  }

  test("IsBool/IsInt/IsDouble/IsString/IsMap/IsList on variant values (func_is_bool.go …)") {
    def v(json: String) = parse_json(lit(json))
    assert(eval1[Boolean](Ottl.isBool(v("true"))))
    assert(eval1[Boolean](Ottl.isInt(v("1"))))
    assert(eval1[Boolean](Ottl.isDouble(v("1.5"))))
    assert(eval1[Boolean](Ottl.isString(v("\"abc\""))))
    assert(eval1[Boolean](Ottl.isMap(v("""{"a":1}"""))))
    assert(eval1[Boolean](Ottl.isList(v("[1,2]"))))
    // strings stay strings: IsDouble("1.5") is false like the Go type switch
    assert(!eval1[Boolean](Ottl.isDouble(v("\"1.5\""))))
    assert(!eval1[Boolean](Ottl.isInt(v("true"))))
  }

  test("""Int coercion family: Int(1.0)=1, Int("1")=1 (e2e_test.go:344-350)""") {
    assert(eval1[Long](Ottl.toInt(lit(1.0))) == 1L)
    assert(eval1[Long](Ottl.toInt(lit("1"))) == 1L)
  }

  test("""Double coercions: Double(1)=1.0, Double("1")=1.0 (e2e_test.go:289-307)""") {
    assert(eval1[Double](Ottl.toDouble(lit(1))) == 1.0)
    assert(eval1[Double](Ottl.toDouble(lit("1"))) == 1.0)
  }

  test("severity default mapping matches severity_builder.go + entry/severity.go exactly") {
    import graft.parse.ParseStage
    val vectors = Seq(
      "trace" -> 1, "trace4" -> 4, "debug" -> 5, "info" -> 9, "info3" -> 11,
      "warn" -> 13, "warning" -> 13, "warning4" -> 16,
      "error" -> 17, "err" -> 17, "err3" -> 19, "fatal" -> 21, "fatal4" -> 24,
      "9" -> 9, "24" -> 24, "ERROR" -> 17, "unknown-text" -> 0)
    vectors.foreach { case (txt, want) =>
      assert(eval1[Int](ParseStage.parseSeverity(lit(txt))) == want, s"severity($txt)")
    }
  }

  test("merge_maps insert/update/upsert against the e2e map shapes (e2e_test.go:126-143)") {
    // target {flags: A}, source {bear: moose, flags: C}
    val target = map(lit("flags"), lit("A"))
    val source = map(lit("bear"), lit("moose"), lit("flags"), lit("C"))
    def m(c: Column) = Seq(Tuple1("x")).toDF("dummy").select(c.as("r"))
      .collect().head.getMap[String, String](0).toMap
    assert(m(Ottl.mergeMaps(target, source, "insert")) == Map("flags" -> "A", "bear" -> "moose"))
    assert(m(Ottl.mergeMaps(target, source, "update")) == Map("flags" -> "C"))
    assert(m(Ottl.mergeMaps(target, source, "upsert")) == Map("flags" -> "C", "bear" -> "moose"))
  }
}
