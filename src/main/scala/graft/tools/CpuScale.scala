package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CpuScale {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to 2) {
      val t0 = System.nanoTime()
      s.range(0, 2000000000L, 1, cores * 4)
        .select(sum(pmod(xxhash64(col("id")), lit(1000000)))).collect()
      println(s"CPUSCALE cores=$cores rep=$r sec=${(System.nanoTime()-t0)/1e9}")
    }
    s.stop()
  }
}
