package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization in both execution modes:
  *
  *  - streaming: custom state via `flatMapGroupsWithState` with
  *    event-time timeout — the open session per user lives in the state
  *    store, closes when a gap exceeds `gapUs` (emitted immediately) or
  *    when the watermark passes lastEvent+gap (emitted by timeout). State
  *    per key is one fixed-size struct, so state size is O(active users),
  *    not O(events) — the property that keeps this viable on an unbounded
  *    stream.
  *  - batch: the classic lag → gap-flag → running-sum session id →
  *    groupBy plan (SQL-expressible; DuckDB-oracled as q17).
  *
  * Stream/batch parity on the same input is asserted in SessionizeSpec.
  */
object Sessionize {

  // carries the raw event-time column: the watermark tracker needs it to
  // survive into the flatMapGroupsWithState child plan
  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double) {
    // floorDiv: getTime truncates toward zero while getNanos is always
    // non-negative, so plain division is a second off for pre-1970 ts
    def us: Long = Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
  }
  case class Open(startUs: Long, endUs: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  // same floor-based rounding as the batch/oracle side (half-up on
  // doubles), so stream/batch/DuckDB agree bit-for-bit
  private def close(user: Long, s: Open): SessionOut =
    SessionOut(user, s.startUs, s.endUs, s.n, math.floor(s.total * 100 + 0.5) / 100)

  /** State transition for one user and one micro-batch of its events. */
  def stateFn(gapUs: Long)(user: Long, events: Iterator[Event],
      state: GroupState[Open]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(user, _)).iterator
      state.remove()
      out
    } else {
      val sorted = events.toArray.sortBy(e => (e.us, e.value))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var open = state.getOption
      sorted.foreach { e =>
        open match {
          case Some(s) if e.us - s.endUs <= gapUs && s.startUs - e.us <= gapUs =>
            // in-gap — including cross-batch out-of-order events still
            // inside the watermark tolerance, which can land BEFORE the
            // open session's end: extend both ends, never regress endUs
            // (a naive endUs := e.us would emit a wrong session_end and
            // make later gap checks compare against the regressed end,
            // splitting sessions the batch plan merges)
            open = Some(Open(math.min(s.startUs, e.us), math.max(s.endUs, e.us),
              s.n + 1, s.total + e.value))
          case Some(s) if e.us > s.endUs =>
            out += close(user, s)
            open = Some(Open(e.us, e.us, 1, e.value))
          case Some(_) =>
            // late event more than a gap BEFORE the open session: it can
            // never join it, so it forms its own already-gap-complete
            // session. Remaining limitation (inherent to append-mode
            // streaming): an event late enough to belong to an
            // already-EMITTED session cannot reopen it — bound lateness
            // with the watermark delay.
            out += close(user, Open(e.us, e.us, 1, e.value))
          case None =>
            open = Some(Open(e.us, e.us, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // timeout when the watermark passes end-of-session + gap; must be
        // strictly ahead of the current watermark or Spark rejects it
        val tsMs = math.max(s.endUs / 1000 + gapUs / 1000,
          state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(tsMs)
      }
      out.iterator
    }
  }

  /** Streaming form over rows with (user_id, ts timestamp, value).
    *
    * `watermarkDelay` is the allowed cross-batch lateness: events older
    * than (max event time seen - delay) are DROPPED by the state store,
    * diverging from the batch form which sees everything. The default
    * tolerates 10 minutes of disorder; set it from the feed's actual
    * lateness bound.
    */
  def sessionizeStream(events: DataFrame, gapUs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // a NULL session key is meaningless (and .as[Event] with a
      // non-nullable Long would throw); both forms + the oracle drop it
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        stateFn(gapUs))
  }

  /** Batch form: identical output (every session closed at end-of-input). */
  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("value"))
    events
      .filter(col("user_id").isNotNull) // same key contract as the stream form
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sid", sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min("us").as("session_start_us"), max("us").as("session_end_us"),
        count(lit(1)).as("n_events"),
        (floor(sum("value") * 100 + 0.5) / 100).as("total_value"))
      .drop("sid")
  }
}
