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
