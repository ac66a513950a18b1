package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted session: closed once no event arrived for the gap. */
final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                            session_end: java.sql.Timestamp, n_events: Long)

/** Open-session state carried between micro-batches (epoch millis). */
final case class SessionState(start: Long, end: Long, n: Long)

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
    * session closes when `gapMinutes` pass with no event — either observed
    * directly (a later event in some batch overshoots the gap, closing the
    * previous run) or enforced by an event-time timeout when the watermark
    * passes `last event + gap` and the key goes quiet. Append-mode: each
    * session is emitted exactly once, when it closes.
    *
    * The batch q_sessions (lag/window over the full table) is the
    * reprocessing form of this operator; this is the incremental form with
    * per-key state the engine checkpoints and shards. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 10,
                 watermark: String = "0 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (user, it, state) =>
        def out(s: SessionState) = SessionOut(user,
          new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)

        if (state.hasTimedOut) {
          val closed = out(state.get)
          state.remove()
          Iterator.single(closed)
        } else {
          // Fold this batch's events (plus any carried open session) into
          // gap-delimited runs; all but the last run close now, the last
          // stays open with a timeout at end + gap.
          val times = it.map(_._2.getTime).toArray.sorted
          var open = state.getOption
          val closed = Array.newBuilder[SessionOut]
          times.foreach { t =>
            open match {
              case Some(s) if t - s.end <= gapMs =>
                open = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
              case Some(s) =>
                closed += out(s)
                open = Some(SessionState(t, t, 1))
              case None =>
                open = Some(SessionState(t, t, 1))
            }
          }
          open.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.end + gapMs)
          }
          closed.result().iterator
        }
      }
  }
}
