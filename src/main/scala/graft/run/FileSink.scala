package graft.run

import org.apache.spark.sql.DataFrame

/** File-exporter analog (`exporter/fileexporter/file_exporter.go:38-65`,
  * config `config.go:22-60` in `/root/reference`): format (json lines /
  * parquet ≙ the exporter's proto), compression, and `group_by` attr →
  * one output stream per value (`config.go:82`) = `partitionBy`.
  *
  * Rotation (`rotation:` config) is subsumed by Spark's per-task file
  * splitting + `maxRecordsPerFile`.
  */
object FileSink {

  def write(df: DataFrame, path: String,
            format: String = "json",
            compression: String = "gzip",
            groupBy: Seq[String] = Nil,
            maxRecordsPerFile: Long = 0L): Unit = {
    var w = df.write.format(format).mode("overwrite")
      .option("compression", compression)
    if (maxRecordsPerFile > 0) w = w.option("maxRecordsPerFile", maxRecordsPerFile)
    (if (groupBy.nonEmpty) w.partitionBy(groupBy: _*) else w).save(path)
  }
}
