package graft.parse

import org.scalatest.funsuite.AnyFunSuite

class TimeFormatsSpec extends AnyFunSuite {

  test("strptime directives translate per the ctimefmt table") {
    assert(TimeFormats.strptimeToJava("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(TimeFormats.strptimeToJava("%Y-%m-%dT%H:%M:%S.%LZ") == "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    assert(TimeFormats.strptimeToJava("%b %e %T") == "MMM d HH:mm:ss")
    assert(TimeFormats.strptimeToJava("%I:%M %p") == "hh:mm a")
    assert(TimeFormats.strptimeToJava("100%% at %H") == "100%' at 'HH")
  }

  test("literal letters are quoted; unsupported directives rejected") {
    // 'T' and 'Z' must not reach Java as pattern letters
    assert(TimeFormats.strptimeToJava("%FT%TZ") == "yyyy-MM-dd'T'HH:mm:ss'Z'")
    intercept[IllegalArgumentException](TimeFormats.strptimeToJava("%s"))
  }

  test("gotime reference-time tokens translate, longest match first") {
    assert(TimeFormats.gotimeToJava("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss")
    assert(TimeFormats.gotimeToJava("Jan _2 15:04:05") == "MMM d HH:mm:ss")
    assert(TimeFormats.gotimeToJava("2006-01-02T15:04:05Z07:00") ==
      "yyyy-MM-dd'T'HH:mm:ssXXX")
    assert(TimeFormats.gotimeToJava("03:04 PM") == "hh:mm a")
  }

  test("round-trip: translated patterns actually parse in Java") {
    val f = java.time.format.DateTimeFormatter.ofPattern(
      TimeFormats.strptimeToJava("%Y-%m-%dT%H:%M:%SZ"))
    assert(java.time.LocalDateTime.parse("2026-01-05T03:04:05Z", f)
      == java.time.LocalDateTime.of(2026, 1, 5, 3, 4, 5))
    val g = java.time.format.DateTimeFormatter.ofPattern(
      TimeFormats.gotimeToJava("2006-01-02 15:04:05"))
    assert(java.time.LocalDateTime.parse("2024-12-31 23:59:58", g)
      == java.time.LocalDateTime.of(2024, 12, 31, 23, 59, 58))
  }
}
