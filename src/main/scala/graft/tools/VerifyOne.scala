package graft.tools

import org.apache.spark.sql.SparkSession

/** Subset Verify: `runMain graft.tools.VerifyOne <sfDir> <outDir> <name>...`
  * dumps only the named [[graft.SparkEntry.queries]] entries (plus a
  * filtered oracle_sql.json via [[graft.Verify.writeOracleJson]]) so
  * tools/check_oracle.py can gate one new query without paying the full
  * Verify pass. Same session config and write shape as [[graft.Verify]]. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: VerifyOne <sfDir> <outDir> <name>...")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    graft.Verify.writeOracleJson(outDir, Some(names.toSet))
    spark.stop()
  }
}
