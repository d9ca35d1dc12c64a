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
  /** State value: ALL not-yet-sealed sessions of a user. Bounded: a
    * session seals once the watermark passes end+gap, so the list holds
    * at most ~(watermarkDelay / gap) + 1 sessions regardless of event
    * count — still O(active users) state overall.
    */
  case class Pending(sessions: List[Open])
  case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  // same floor-based rounding as the batch/oracle side (half-up on
  // doubles), so stream/batch/DuckDB agree bit-for-bit
  private def close(user: Long, s: Open): SessionOut =
    SessionOut(user, s.startUs, s.endUs, s.n, math.floor(s.total * 100 + 0.5) / 100)

  /** State transition for one user and one micro-batch of its events.
    *
    * The batch's events and every pending session are merged as
    * time-sorted intervals and re-sessionized in one fold — the same
    * computation the batch plan performs. A session is EMITTED only once
    * the watermark passes its end + gap (no admissible future event —
    * one with ts >= watermark — can still merge into it), so any
    * out-of-order arrival the watermark admits keeps exact stream/batch
    * parity: late events extend or bridge pending sessions, merge with
    * each other, and can arrive many sessions back. Events later than
    * the watermark bound are dropped by the state store — that is the
    * standard divergence from batch.
    *
    * Residual FP caveat: a session's total accumulates in merge-interval
    * order here, while the batch plan's sum() accumulates in whatever
    * order the aggregate consumes rows — for doubles that are not
    * binary-exact (e.g. 0.005) the two sums can differ in the last ulp,
    * which can flip the floor(x*100+0.5) rounding at an exact x.xx5
    * boundary. Parity is bit-exact whenever values are binary-exact
    * (integers, multiples of 2^-k — what SessionizePropSpec generates);
    * currency-style inputs should be scaled to integral cents upstream.
    */
  def stateFn(gapUs: Long)(user: Long, events: Iterator[Event],
      state: GroupState[Pending]): Iterator[SessionOut] = {
    val pending = state.getOption.map(_.sessions).getOrElse(Nil)
    val incoming = events.toArray.sortBy(e => (e.us, e.value))
      .map(e => Open(e.us, e.us, 1, e.value)).toList
    val items = (pending ++ incoming).sortBy(s => (s.startUs, s.endUs))
    val merged = items.foldLeft(List.empty[Open]) {
      case (cur :: done, s) if s.startUs - cur.endUs <= gapUs =>
        Open(cur.startUs, math.max(cur.endUs, s.endUs),
          cur.n + s.n, cur.total + s.total) :: done
      case (acc, s) => s :: acc
    }.reverse
    val wmUs = state.getCurrentWatermarkMs() * 1000
    // closed: watermark strictly past end+gap -> immutable forever
    val (closed, open) = merged.partition(s => s.endUs + gapUs < wmUs)
    if (open.isEmpty) {
      if (state.exists) state.remove()
    } else {
      state.update(Pending(open))
      // wake when the earliest pending session seals; must be strictly
      // ahead of the current watermark or Spark rejects it
      val tsMs = math.max(open.map(_.endUs).min / 1000 + gapUs / 1000,
        state.getCurrentWatermarkMs() + 1)
      state.setTimeoutTimestamp(tsMs)
    }
    closed.map(close(user, _)).iterator
  }

  /** Streaming form over rows with (user_id, ts timestamp, value).
    *
    * `watermarkDelay` is the allowed cross-batch lateness: events older
    * than (max event time seen - delay) are DROPPED by the state store,
    * diverging from the batch form which sees everything. Every
    * admissible event keeps exact parity (sessions are held in state
    * until the watermark seals them — see stateFn). The default
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
