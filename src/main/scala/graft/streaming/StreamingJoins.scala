package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted session: closed once no event arrived for the gap. */
final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                            session_end: java.sql.Timestamp, n_events: Long)

/** One gap-delimited run of events (epoch MICROS — the events table has
  * microsecond timestamps; millisecond state would truncate and split
  * sessions differently than the exact batch formulation). */
final case class SessionRun(start: Long, end: Long, n: Long)

/** Per-key state: every run the watermark has not yet sealed. Runs stay
  * here — still mergeable by late events — until `end + gap` falls behind
  * the watermark, at which point no admissible event can extend them. */
final case class SessionState(runs: Seq[SessionRun])

/** Event-time streaming operators over the `events` shape
  * (user_id BIGINT, ts TIMESTAMP, event_id BIGINT, ...).
  *
  * Both operators are bounded-state by construction — the non-negotiable
  * property for an unbounded stream: the interval join's condition gives the
  * engine a provable per-row state horizon (click/purchase buffers are
  * dropped once the watermark passes the interval), and sessionization's
  * event-time timeout reaps idle per-key state. Without those bounds a
  * stream-stream join or keyed state grows without limit.
  */
object StreamingJoins {

  /** Watermarked stream-stream interval join: each purchase is attributed to
    * the clicks by the same user in the `horizonMinutes` before it. The
    * time-interval predicate is what lets the engine expire join state; an
    * unconstrained stream-stream equi-join would buffer both streams
    * forever. State shards by user_id like any keyed shuffle. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       watermark: String = "30 minutes",
                       horizonMinutes: Int = 30): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", watermark)
    c.join(p, expr(
        s"""c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL $horizonMinutes MINUTES"""))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Event-time session windows with `flatMapGroupsWithState`: a user's
    * session closes when `gapMinutes` pass with no event. Append-mode,
    * exactly-once: a run is emitted only when the watermark passes
    * `end + gap` — before that a late event (the watermark delay is
    * exactly the admissible lateness) could still extend or merge it, so
    * runs are held in state, mergeable in BOTH directions (a late event
    * just before a run's start pulls `session_start` back; one between two
    * runs fuses them). Keys with no data are reaped by an event-time
    * timeout at the earliest unsealed `end + gap`.
    *
    * The batch q_sessions (lag/window over the full table) is the
    * reprocessing form of this operator; this is the incremental form with
    * per-key state the engine checkpoints and shards. The default
    * watermark matches the gap — a zero-lateness default would silently
    * drop any key whose events trail the fastest key by one batch. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 10,
                 watermark: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    // State runs in epoch MICROS: `unix_micros` preserves the events
    // table's microsecond timestamps exactly, where Timestamp.getTime would
    // truncate to millis and flip gap comparisons near the 600 s boundary.
    // the watermarked `ts` column must SURVIVE the projection — dropping
    // it fails analysis ("event-time timeout not supported without
    // watermark"); the BIGINT micros column rides alongside for the state
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (user, it, state) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val carried = state.getOption.map(_.runs).getOrElse(Seq.empty)
        val points = it.map(t => SessionRun(t._3, t._3, 1L)).toSeq

        // Interval merge: carried runs and new points, ordered by start,
        // fuse whenever the gap between them is <= gapUs. Late points
        // extend runs backward or bridge two runs — order of arrival
        // across batches cannot change the result.
        val merged = (carried ++ points).sortBy(r => (r.start, r.end))
          .foldLeft(List.empty[SessionRun]) {
            case (cur :: done, r) if r.start - cur.end <= gapUs =>
              SessionRun(cur.start, math.max(cur.end, r.end), cur.n + r.n) :: done
            case (acc, r) => r :: acc
          }.reverse

        // A run is sealed once end + gap < watermark — STRICTLY: the engine
        // still admits an event AT the watermark, and one at exactly
        // end + gap would merge, so `<=` could emit a run a boundary event
        // should have extended.
        val (ripe, open) = merged.partition(_.end + gapUs < wmUs)
        if (open.isEmpty) state.remove()
        else {
          state.update(SessionState(open))
          // +1: the timeout API is millis and must be strictly beyond the
          // current watermark; firing <=1 ms late just re-checks the seal.
          state.setTimeoutTimestamp((open.map(_.end).min + gapUs) / 1000L + 1L)
        }
        ripe.iterator.map { r =>
          SessionOut(user, tsFromMicros(r.start), tsFromMicros(r.end), r.n)
        }
      }
  }

  /** Exact micros → java.sql.Timestamp (the nanos field carries the full
    * sub-second component; the millis constructor alone would truncate). */
  private def tsFromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  /** Streaming exact dedup — the incremental form of `dedup_exact`
    * (ops/Dedup.scala): drop any row whose key columns (e.g. a content
    * fingerprint) were already seen within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark` keeps one state entry per distinct key
    * and — unlike a plain streaming `dropDuplicates`, whose keyed state
    * grows without bound for the lifetime of the query — evicts each entry
    * once the watermark passes its event time plus the delay. That trades
    * a precise contract for bounded state: duplicates are guaranteed
    * dropped only when they arrive within the watermark delay of the first
    * occurrence; a re-occurrence after eviction is re-emitted (exactly the
    * horizon semantics a 100 TB/day ingest dedup wants — global history
    * belongs to the batch operator over the materialized table). State
    * shards by key hash like any keyed shuffle. */
  def dedupWithinWatermark(docs: DataFrame, keyCols: Seq[String],
                           eventTimeCol: String = "ts",
                           watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
