package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** The canonical transcript row — exactly the `input_hint` shape from
  * BASELINE.json. One row per turn of a multi-turn conversation.
  *
  * Reference data model analog: `pkg/stanza/entry/entry.go:14-26` (the
  * stanza `entry.Entry`): `text` plays Body, `role`/`tool` are the
  * denormalised Resource/Attributes envelope, `ts` is Timestamp.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

object Turn {
  /** Fixed input schema (data carries schema in Spark, unlike the
    * reference's schema-less entries — SURVEY.md §1.3). */
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)
  ))
}
