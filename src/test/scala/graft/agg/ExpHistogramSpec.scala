package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExpHistogramSpec extends SparkSpec {
  import spark.implicits._

  test("bucketOf is floor(log2) with underflow at <=0") {
    assert(ExpHistogram.bucketOf(1) == 0)
    assert(ExpHistogram.bucketOf(2) == 1)
    assert(ExpHistogram.bucketOf(3) == 1)
    assert(ExpHistogram.bucketOf(4) == 2)
    assert(ExpHistogram.bucketOf(1023) == 9)
    assert(ExpHistogram.bucketOf(1024) == 10)
    assert(ExpHistogram.bucketOf(0) == -1)
    assert(ExpHistogram.bucketOf(-5) == -1)
  }

  test("grouped exponential histogram: counts, sum, max, underflow") {
    val df = Seq(
      ("a", 1L), ("a", 3L), ("a", 3L), ("a", 1000L), ("a", 0L),
      ("b", 7L)
    ).toDF("k", "v")
    val out = df.groupBy("k").agg(ExpHistogram.of(col("v")).as("h"))
      .select("k", "h.total", "h.sum", "h.max", "h.underflow", "h.bucket_counts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getSeq[Long](5))).toMap
    val (at, as, am, au, ab) = out("a")
    assert(at == 5 && as == 1007 && am == 1000 && au == 1)
    assert(ab(0) == 1)        // v=1 → bucket 0
    assert(ab(1) == 2)        // v=3,3 → bucket 1
    assert(ab(9) == 1)        // v=1000 → bucket 9
    val (bt, bs, bm, bu, bb) = out("b")
    assert(bt == 1 && bs == 7 && bm == 7 && bu == 0 && bb(2) == 1)
  }

  test("merge across partitions equals single-partition result") {
    val vals = (1L to 10000L)
    val one = vals.toDF("v").coalesce(1).agg(ExpHistogram.of(col("v")).as("h"))
      .select("h.bucket_counts").head().getSeq[Long](0)
    val many = vals.toDF("v").repartition(16).agg(ExpHistogram.of(col("v")).as("h"))
      .select("h.bucket_counts").head().getSeq[Long](0)
    assert(one == many)
  }

  test("null inputs are skipped like SQL aggregates, not counted as underflow 0s") {
    // the primitive-Long encoder would coerce null → 0L (a phantom
    // underflow observation); the boxed input type must skip it
    val df = Seq(Some(4L), None, Some(1L), None).toDF("v")
    val r = df.agg(ExpHistogram.of(col("v")).as("h"))
      .select("h.total", "h.underflow", "h.sum", "h.max").head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 0 &&
      r.getLong(2) == 5 && r.getLong(3) == 4)
  }
}
