package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extra (non-contract) benchmarks for the optimization rounds —
  * numbers cited in OPTIMIZATION_r06.md. The driver's own Bench.scala
  * is frozen; this main reproduces its scale-point corpus and times
  * the LSH near-dup + dedup-groups path in isolation so a change to
  * [[graft.ops.Dedup.nearDupMinhashLsh]] can be measured at the 10×
  * corpus size without spending a full 450 s bench budget.
  *
  * Usage: `runMain graft.tools.BenchExtra scalepoint [copies]`
  * (`SPARK_GRAFT_SF_DIR` default sf0.1, `SPARK_GRAFT_CPUS` default 32;
  * corpus cached under /tmp/graft_bench_extra, same bijective per-copy
  * token renaming as the bench's docs10x_v2.)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("scalepoint")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(mode == "scalepoint", s"unknown mode $mode")
    val out = "/tmp/graft_bench_extra/docs10x_v2"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS"))) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      base.crossJoin(spark.range(10).select(col("id").as("copy")))
        .select((col("doc_id") * 10 + col("copy")).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit("_"), col("copy"))), " ").as("text"))
        .repartition(cpus)
        .write.mode("overwrite").parquet(out)
    }
    val docs = spark.read.parquet(out).filter(col("doc_id") % 10 < copies)
    spark.sparkContext.setJobDescription(s"scalepoint: lsh ${copies}x")
    var pairCount = 0L
    val t0 = System.nanoTime()
    val pairs = graft.ops.Dedup.nearDupMinhashLsh(docs, "doc_id", "text",
      numHashes = 64, bands = 16, shingleSize = 1, threshold = 0.85).cache()
    pairCount = pairs.count()
    val lshSec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.setJobDescription("scalepoint: d11 groups")
    val t1 = System.nanoTime()
    val groups = graft.ops.Dedup.dedupGroups(pairs)
      .agg(countDistinct(col("group"))).head().getLong(0)
    val d11Sec = (System.nanoTime() - t1) / 1e9
    println(f"[bx] scalepoint copies=$copies pairs=$pairCount lsh=$lshSec%.2f s " +
      f"groups=$groups d11=$d11Sec%.2f s")
    spark.stop()
  }
}
