package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript table access + the deterministic events→transcripts
  * derivation used by the correctness gate.
  *
  * The production input is an Iceberg table with the `input_hint` shape
  * (conv_id, turn_idx, role, text, tool, ts). Offline there is no Iceberg
  * runtime jar (verified — SURVEY.md §7.4), so [[TranscriptTable]] is the
  * format seam: parquet locally, `format("iceberg")` on a real cluster.
  *
  * [[fromEvents]] derives a transcripts table of exactly that shape from
  * the driver-generated `events` parquet, using only integer-deterministic
  * SQL so DuckDB reproduces it byte-for-byte (see [[Transcripts.OracleCte]]
  * — the same derivation as a SQL WITH-clause for the driver's oracle).
  * This is the `generate`-input analog
  * (`pkg/stanza/operator/input/generate/input.go:28-60` in
  * `/root/reference`): a deterministic synthesiser of parse-bank text.
  */
object Transcripts {

  /** The `input_hint` shape as a schema — applied on read for text
    * formats (json lines / csv) that carry no types of their own and
    * would otherwise infer `turn_idx` as long and `ts` as string. Self-
    * describing formats (parquet/orc/iceberg) keep their own footers. */
  val transcriptSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType),
      StructField("tool", StringType), StructField("ts", TimestampType)))
  }

  /** Format seam: swap "parquet" for "iceberg" when the runtime jar is
    * present on the cluster. All reads/writes of transcript-shaped data
    * go through here. */
  final case class TranscriptTable(format: String = "parquet") {
    def read(spark: SparkSession, path: String): DataFrame = {
      val r = spark.read.format(format)
      (if (format == "json" || format == "csv") r.schema(transcriptSchema)
       else r).load(path)
    }
    def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
      val w = df.write.format(format).mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).save(path)
    }
  }

  /** Deterministic transcripts derivation from the `events` table.
    * One conversation per user; turn order = (ts, event_id); text follows
    * the FIXTURES.md pattern grammar:
    *   P1 tool_call  (purchase/error rows)
    *   P2 status     (view/signup rows)
    *   P3 kv         (click rows, except every 11th → unparseable noise,
    *                  exercising the on_error path)
    * Integer-only arithmetic (round→bigint cents) so Spark and DuckDB
    * render identical strings.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    derive(events)
  }

  def derive(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cents = round(col("value") * 100).cast("bigint").cast("string")
    val toolCol = when(col("event_type") === "purchase", "search")
      .when(col("event_type") === "error", "bash")
      .otherwise("")
    val level = when(col("event_id") % 7 === 0, "ERROR")
      .when(col("event_id") % 3 === 0, "WARN")
      .otherwise("INFO")
    val text = when(col("event_type").isin("purchase", "error"),
        concat(lit("CALL tool="), toolCol, lit(" args="), col("props"),
               lit(" dur_ms="), cents))
      .when(col("event_type").isin("view", "signup"),
        concat(level, lit(" [comp-"), (col("event_id") % 5).cast("string"),
               lit("] "), col("event_type"), lit(" user="),
               col("user_id").cast("string")))
      .when(col("event_id") % 11 === 0,
        concat(lit("~~ noise "), col("event_id").cast("string"), lit(" ~~")))
      .otherwise(
        concat(lit("user="), col("user_id").cast("string"),
               lit(" action=click cents="), cents))
    events.select(
      concat(lit("conv-"), lpad(col("user_id").cast("string"), 8, "0")).as("conv_id"),
      (row_number().over(w) - 1).cast("int").as("turn_idx"),
      when(col("event_type") === "signup", "system")
        .when(col("event_type") === "purchase", "assistant")
        .when(col("event_type") === "error", "tool")
        .otherwise("user").as("role"),
      text.as("text"),
      toolCol.as("tool"),
      col("ts")
    )
  }

  /** The SAME derivation as a DuckDB CTE, prepended to every oracle SQL
    * that consumes transcripts. Keep in lock-step with [[derive]]. */
  val OracleCte: String =
    """WITH transcripts AS (
      |  SELECT
      |    'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |    CASE event_type WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
      |                    WHEN 'error' THEN 'tool' ELSE 'user' END AS role,
      |    CASE
      |      WHEN event_type IN ('purchase','error') THEN
      |        'CALL tool=' || (CASE event_type WHEN 'purchase' THEN 'search' ELSE 'bash' END)
      |        || ' args=' || props || ' dur_ms=' || CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR)
      |      WHEN event_type IN ('view','signup') THEN
      |        (CASE WHEN event_id % 7 = 0 THEN 'ERROR' WHEN event_id % 3 = 0 THEN 'WARN' ELSE 'INFO' END)
      |        || ' [comp-' || CAST(event_id % 5 AS VARCHAR) || '] ' || event_type
      |        || ' user=' || CAST(user_id AS VARCHAR)
      |      WHEN event_id % 11 = 0 THEN '~~ noise ' || CAST(event_id AS VARCHAR) || ' ~~'
      |      ELSE 'user=' || CAST(user_id AS VARCHAR) || ' action=click cents='
      |           || CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR)
      |    END AS text,
      |    CASE event_type WHEN 'purchase' THEN 'search' WHEN 'error' THEN 'bash' ELSE '' END AS tool,
      |    ts
      |  FROM events
      |)""".stripMargin
}
