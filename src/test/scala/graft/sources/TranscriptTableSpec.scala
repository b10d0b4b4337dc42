package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.run.Pipeline
import graft.synth.TranscriptSynth

/** The format seam demonstrated with a SECOND format: every transcript
  * read/write goes through [[Transcripts.TranscriptTable]], whose
  * `format` string is the only thing that changes between parquet
  * (local), ORC (this spec), and Iceberg (cluster — runtime jar absent
  * offline, SURVEY §7.4). Proving the flagship produces identical
  * results through an ORC-backed table is the evidence that the Iceberg
  * claim rests on a demonstrated abstraction, not an untested string.
  */
class TranscriptTableSpec extends SparkSpec {

  private def norm(df: DataFrame): Set[Seq[Any]] =
    df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .collect().map(_.toSeq).toSet

  test("ORC-backed TranscriptTable round-trips the transcript shape") {
    val turns = TranscriptSynth.generate(spark,
      TranscriptSynth.Config(nTurns = 2000, nConvs = 20)).cache()
    val dir = Files.createTempDirectory("graft_orc").toString
    val orc = Transcripts.TranscriptTable("orc")
    orc.write(turns, s"$dir/t")
    val back = orc.read(spark, s"$dir/t")
    assert(norm(back) == norm(turns))
    // partitioned write keeps the shape too (role becomes a partition col)
    orc.write(turns, s"$dir/tp", partitionCols = Seq("role"))
    assert(norm(orc.read(spark, s"$dir/tp")) == norm(turns))
  }

  test("flagship over ORC == flagship over parquet (format-independence)") {
    val turns = TranscriptSynth.generate(spark,
      TranscriptSynth.Config(nTurns = 2000, nConvs = 20)).cache()
    val dir = Files.createTempDirectory("graft_fmt").toString
    Transcripts.TranscriptTable("parquet").write(turns, s"$dir/pq")
    Transcripts.TranscriptTable("orc").write(turns, s"$dir/orc")

    def runThrough(fmt: String, path: String): Map[String, Set[(String, Int)]] = {
      val in = Transcripts.TranscriptTable(fmt).read(spark, path)
      val enriched = Pipeline.parseEnrich(spark, in)
      graft.route.RouteStage.fanOut(enriched, Pipeline.routeTable).map {
        case (name, df) => name -> df.select("conv_id", "turn_idx")
          .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      }
    }
    val viaParquet = runThrough("parquet", s"$dir/pq")
    val viaOrc = runThrough("orc", s"$dir/orc")
    assert(viaOrc == viaParquet)
  }

  test("JSON-lines TranscriptTable (the reference filelog's native line format)") {
    // text formats carry no types, so the seam applies the input_hint
    // schema on read — turn_idx must come back int (not long) and ts a
    // timestamp (not string), or every downstream window/order breaks
    val turns = TranscriptSynth.generate(spark,
      TranscriptSynth.Config(nTurns = 2000, nConvs = 20)).cache()
    val dir = Files.createTempDirectory("graft_json").toString
    val jl = Transcripts.TranscriptTable("json")
    jl.write(turns, s"$dir/t")
    val back = jl.read(spark, s"$dir/t")
    assert(back.schema == Transcripts.transcriptSchema)
    assert(norm(back) == norm(turns))

    // flagship over JSON lines == flagship over parquet
    Transcripts.TranscriptTable("parquet").write(turns, s"$dir/pq")
    def keys(df: DataFrame): Map[String, Set[(String, Int)]] = {
      val enriched = Pipeline.parseEnrich(spark, df)
      graft.route.RouteStage.fanOut(enriched, Pipeline.routeTable).map {
        case (name, d) => name -> d.select("conv_id", "turn_idx")
          .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      }
    }
    assert(keys(jl.read(spark, s"$dir/t")) ==
      keys(Transcripts.TranscriptTable("parquet").read(spark, s"$dir/pq")))
  }
}
