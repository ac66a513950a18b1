package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Schema-on-read over semi-structured (JSON string) columns — the event/
  * telemetry side of a training-data pipeline, where payloads arrive as
  * JSON blobs inside an otherwise columnar table.
  *
  * Scale notes (100 TB):
  *  - The extraction schema is EXPLICIT, never inferred: `schema_of_json`-
  *    style inference is a full extra pass over the corpus before the real
  *    job can start. With a literal schema the query is a single scan.
  *  - `from_json` is map-only — the parse happens inside the scan's
  *    projection, so the shuffle that follows carries only the extracted
  *    typed columns, never the raw JSON text. (Catalyst's JsonToStructs is
  *    a CodegenFallback expression, so the extraction projection sits
  *    outside whole-stage codegen; it is kept in its own narrow project so
  *    the aggregation stage above it still fuses.)
  *  - Malformed payloads yield NULL (PERMISSIVE mode), counted separately
  *    rather than killing the job — same error-channel philosophy as the
  *    parser core (R28). */
object SemiStructured {

  private val PropsSchema = StructType(Seq(StructField("k", LongType)))

  /** Per-event-type stats over the JSON `props.k` field: row count,
    * non-null extraction count (malformed/missing → NULL, so
    * n_events - n_with_k IS the malformed count), and integer sum/min/max.
    * All-integer output, hash-gateable. */
  def eventPropStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), PropsSchema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
}
