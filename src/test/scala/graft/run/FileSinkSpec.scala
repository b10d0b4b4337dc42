package graft.run

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class FileSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(name).toString
    Paths.get(d).toFile.deleteOnExit(); d
  }

  test("json-lines + gzip with group_by: one directory per group, round-trips") {
    val df = Seq(("a", "r1", 1), ("b", "r1", 2), ("c", "r2", 3))
      .toDF("id", "route", "v")
    val out = tmp("filesink_json")
    FileSink.write(df, out, format = "json", compression = "gzip",
      groupBy = Seq("route"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("route=r1", "route=r2"))
    assert(new java.io.File(s"$out/route=r1").listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    val back = spark.read.json(out)
    assert(back.count() == 3)
    assert(back.select("id", "route").as[(String, String)].collect().toSet ==
      Set(("a", "r1"), ("b", "r1"), ("c", "r2")))
  }

  test("parquet + zstd (the exporter's binary-format analog)") {
    val df = Seq((1, "x"), (2, "y")).toDF("k", "s")
    val out = tmp("filesink_zstd")
    FileSink.write(df, out, format = "parquet", compression = "zstd")
    assert(new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".zstd.parquet")))
    assert(spark.read.parquet(out).count() == 2)
  }
}
