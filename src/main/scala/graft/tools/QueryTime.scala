package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QueryTime <name>...`
  * runs the named [[graft.SparkEntry.queries]] entries against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) with the same session config as
  * the bench, 3 reps each, printing per-rep wall and the min. For
  * iterating on one slow query without paying the full bench suite. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <queryName>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val q = graft.SparkEntry.queries(name)
      // exhaust via noop write like the bench suite — count() would let
      // Catalyst prune every projection not needed for the row count and
      // under-measure projection-heavy queries (redaction, hashing)
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = q(spark, sfDir).count()
      println(f"[qt] $name rows=$rows reps=${reps.map(r => f"$r%.2f").mkString(",")} min=${reps.min}%.3f s")
    }
    spark.stop()
  }
}
