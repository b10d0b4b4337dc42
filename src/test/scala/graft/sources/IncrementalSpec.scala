package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("incremental ingest: only new files; crash before commit re-reads them") {
    val table = Files.createTempDirectory("inc_table").toString
    val ckpt = Files.createTempDirectory("inc_ckpt").toString

    (1 to 100).toDF("v").repartition(2).write.mode("append").parquet(table)
    val (df1, p1) = Incremental.readNew(spark, table, ckpt)
    assert(df1.count() == 100 && p1.newFiles.size == 2)

    // crash before commit: the same files are planned again (at-least-once)
    val (df1b, _) = Incremental.readNew(spark, table, ckpt)
    assert(df1b.count() == 100)

    p1.commit()
    val (df2, p2) = Incremental.readNew(spark, table, ckpt)
    assert(p2.isEmpty && df2.count() == 0)

    // append a second batch: only its files are planned
    (101 to 130).toDF("v").repartition(1).write.mode("append").parquet(table)
    val (df3, p3) = Incremental.readNew(spark, table, ckpt)
    assert(p3.newFiles.size == 1)
    assert(df3.as[Int].collect().toSet == (101 to 130).toSet)
    p3.commit()

    val (_, p4) = Incremental.readNew(spark, table, ckpt)
    assert(p4.isEmpty)
  }

  test("consumer before producer: missing/empty table yields an empty plan and frame, then catches up") {
    val parent = Files.createTempDirectory("inc_pre").toString
    val table = s"$parent/not_yet_created"
    val ckpt = Files.createTempDirectory("inc_pre_ckpt").toString
    // missing dir: empty plan, empty input_hint-shaped frame, no crash
    val (df0, p0) = Incremental.readNew(spark, table, ckpt)
    assert(p0.isEmpty && df0.count() == 0)
    assert(df0.columns.contains("conv_id")) // the input_hint fallback shape
    p0.commit() // committing the empty plan must also be harmless
    // dir exists but holds no data files yet: same contract
    Files.createDirectories(java.nio.file.Paths.get(table))
    val (df1, p1) = Incremental.readNew(spark, table, ckpt)
    assert(p1.isEmpty && df1.count() == 0)
    // the producer's first write is then picked up normally
    (1 to 10).toDF("v").repartition(1).write.mode("append").parquet(table)
    val (df2, p2) = Incremental.readNew(spark, table, ckpt)
    assert(p2.newFiles.size == 1 && df2.count() == 10)
  }

  test("manifest prunes fingerprints of deleted files (bounded by current table, not history)") {
    val table = Files.createTempDirectory("inc_prune").toString
    val ckpt = Files.createTempDirectory("inc_prune_ckpt").toString
    (1 to 10).toDF("v").repartition(1).write.mode("append").parquet(table)
    val (_, p1) = Incremental.readNew(spark, table, ckpt)
    p1.commit()
    // retention/compaction: the committed file is deleted, a new one lands
    val dir = java.nio.file.Paths.get(table)
    java.nio.file.Files.list(dir).forEach { f =>
      if (f.toString.endsWith(".parquet")) java.nio.file.Files.delete(f) }
    (11 to 20).toDF("v").repartition(1).write.mode("append").parquet(table)
    val (df2, p2) = Incremental.readNew(spark, table, ckpt)
    assert(p2.newFiles.size == 1 && df2.count() == 10)
    p2.commit()
    // the manifest now holds ONLY the live file's fingerprint — the
    // dead entry was pruned on commit, keeping the file O(current table)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt, "ingest_manifest.list")), "UTF-8")
    val entries = manifest.split("\n").filter(_.nonEmpty)
    assert(entries.length == 1, s"manifest not pruned: ${entries.toSeq}")
  }

  test("partitioned table layouts are listed recursively with full URIs") {
    val table = Files.createTempDirectory("inc_part").toString
    val ckpt = Files.createTempDirectory("inc_part_ckpt").toString
    Seq((1, "a"), (2, "b")).toDF("v", "route")
      .write.partitionBy("route").mode("append").parquet(table)
    val (df1, p1) = Incremental.readNew(spark, table, ckpt)
    assert(p1.newFiles.size == 2, s"nested files invisible: ${p1.newFiles}")
    // fingerprints carry the full URI (scheme intact), not a bare path
    assert(p1.newFiles.forall(_.startsWith("file:")), s"got ${p1.newFiles}")
    assert(df1.count() == 2)
    p1.commit()
    assert(Incremental.readNew(spark, table, ckpt)._2.isEmpty)
    // commit() again over an existing manifest exercises overwrite-rename
    p1.commit()
    assert(Incremental.readNew(spark, table, ckpt)._2.isEmpty)
  }

  test("readNew keeps partition columns of a partitioned table (basePath)") {
    val table = Files.createTempDirectory("inc_base").toString
    val ckpt = Files.createTempDirectory("inc_base_ckpt").toString
    Seq((1, "a"), (2, "b")).toDF("v", "route")
      .write.partitionBy("route").mode("append").parquet(table)
    val (df1, p1) = Incremental.readNew(spark, table, ckpt)
    // explicit leaf-file reads drop partition values without basePath —
    // and the empty-plan branch (whole-table read) would then disagree
    // on schema with the new-files branch
    assert(df1.columns.toSet == Set("v", "route"), df1.columns.mkString(","))
    assert(df1.select("v", "route").as[(Int, String)].collect().toSet
      == Set((1, "a"), (2, "b")))
    p1.commit()
    val (dfEmpty, p2) = Incremental.readNew(spark, table, ckpt)
    assert(p2.isEmpty && dfEmpty.columns.sorted.sameElements(df1.columns.sorted))
  }
}
