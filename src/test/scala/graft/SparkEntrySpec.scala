package graft

/** Driver-contract smoke: entry() returns rows; every query has either an
  * oracle or a documented rows-only status; oracle keys ⊆ query keys. */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns non-empty windowed sink counts") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("sink", "window_start", "count"))
    assert(df.count() > 0)
  }

  test("oracle keys all correspond to query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("every query runs non-empty at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (fn(spark, dir).limit(1).count() == 0) Some(s"$name: empty") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
