package graft.run

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Resumability fixture (FIXTURES.md §7): run, fail one sink mid-job,
  * re-run with the same lineage dir → completed sinks skip, final state
  * equals an uninterrupted run, no duplicate rows. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def sinkData = Map(
    "alpha" -> Seq((1, "a"), (2, "b")).toDF("id", "v"),
    "beta" -> Seq((3, "c")).toDF("id", "v"),
    "gamma" -> Seq((4, "d"), (5, "e"), (6, "f")).toDF("id", "v"))

  test("kill-resume: committed sinks skip, failed sink re-executes, no dupes") {
    val out = Files.createTempDirectory("graft_lineage").toString
    val fp = Lineage.fingerprintOf("test-pipeline", "v1")

    // run 1: beta poisoned (fails at write time)
    val poisoned = sinkData + ("beta" -> sinkData("beta")
      .withColumn("boom", expr("raise_error('injected failure')")))
    val r1 = Lineage.runResumable(spark, poisoned, out, fp)
    assert(r1.executed.toSet == Set("alpha", "gamma"))
    assert(r1.failed.keySet == Set("beta"))

    // run 2 (the "resume"): same dir, healthy sinks
    val r2 = Lineage.runResumable(spark, sinkData, out, fp)
    assert(r2.skipped.toSet == Set("alpha", "gamma"), s"got $r2")
    assert(r2.executed == Seq("beta"))
    assert(r2.failed.isEmpty)

    // final state identical to an uninterrupted run; no duplicates
    for ((sink, df) <- sinkData) {
      val got = spark.read.parquet(s"$out/$sink").orderBy("id").collect().toSeq
      val want = df.orderBy("id").collect().toSeq
      assert(got == want, s"sink $sink state mismatch")
    }
  }

  test("a changed-fingerprint overwrite invalidates the old manifest BEFORE writing (no stale commit over destroyed data)") {
    val out = Files.createTempDirectory("graft_lineage_stale").toString
    val fp1 = Lineage.fingerprintOf("pipeline", "v1")
    val fp2 = Lineage.fingerprintOf("pipeline", "v2")
    val data = Map("alpha" -> Seq((1, "a")).toDF("id", "v"))
    assert(Lineage.runResumable(spark, data, out, fp1).executed == Seq("alpha"))
    assert(Lineage.isCommitted(out, "alpha", fp1))
    // the v2 run's write fails mid-overwrite (the kill window): the v1
    // manifest must already be gone, or a rollback to v1 would skip the
    // sink and ship the destroyed/partial data as committed under v1
    val poisoned = Map("alpha" -> data("alpha")
      .withColumn("boom", expr("raise_error('killed mid-overwrite')")))
    val r2 = Lineage.runResumable(spark, poisoned, out, fp2)
    assert(r2.failed.keySet == Set("alpha"))
    assert(!Lineage.isCommitted(out, "alpha", fp1),
      "stale v1 manifest survived a failed v2 overwrite")
    // the v1 rerun re-executes (not skips) and restores a committed state
    val r3 = Lineage.runResumable(spark, data, out, fp1)
    assert(r3.executed == Seq("alpha") && r3.skipped.isEmpty)
    assert(spark.read.parquet(s"$out/alpha").count() == 1)
  }

  test("manifest carries per-file row lineage matching the committed data") {
    val out = Files.createTempDirectory("graft_lineage2").toString
    val fp = Lineage.fingerprintOf("p2")
    val df = spark.range(100).repartition(4).toDF("id")
    val r = Lineage.runResumable(spark, Map("s" -> df), out, fp)
    val m = r.manifests("s")
    assert(m.totalRows == 100)
    assert(m.files.nonEmpty && m.files.map(_.rows).sum == 100)
  }

  test("lineage sees nested partitioned sinks (route=*/...) recursively") {
    val out = Files.createTempDirectory("graft_lineage4").toString
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "route")
    df.write.partitionBy("route").mode("overwrite").parquet(s"$out/s")
    val lineage = Lineage.fileLineage(spark, s"$out/s")
    assert(lineage.map(_.rows).sum == 3, s"got $lineage")
    assert(lineage.forall(_.file.startsWith("route=")),
      s"expected sink-relative nested paths, got ${lineage.map(_.file)}")
  }

  test("changed fingerprint invalidates old checkpoints") {
    val out = Files.createTempDirectory("graft_lineage3").toString
    val df = Seq((1, "a")).toDF("id", "v")
    assert(Lineage.runResumable(spark, Map("s" -> df), out,
      Lineage.fingerprintOf("v1")).executed == Seq("s"))
    assert(Lineage.runResumable(spark, Map("s" -> df), out,
      Lineage.fingerprintOf("v1")).skipped == Seq("s"))
    assert(Lineage.runResumable(spark, Map("s" -> df), out,
      Lineage.fingerprintOf("v2")).executed == Seq("s"))
  }
}
