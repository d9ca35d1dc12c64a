package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: clicks ⋈ purchases by the same user
  * within a look-back window — the attribution join of an event
  * pipeline, run with BOTH sides unbounded.
  *
  * Watermarks on both inputs bound the join state: a buffered row can be
  * dropped once the other side's event time passes (its ts + interval +
  * lateness), so state is O(events inside the window), not O(stream).
  * The same plan shape works in batch (asserted in StreamJoinSpec).
  */
object StreamJoin {

  val LookbackSeconds = 3600L

  /** Inner interval join; inputs need (user_id, ts, …) columns. Works on
    * both streaming and batch frames — the predicate is identical.
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      watermark: Option[String] = Some("10 minutes")): DataFrame = {
    def wm(df: DataFrame) = watermark.fold(df)(df.withWatermark("ts", _))
    val c = wm(clicks)
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = wm(purchases)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") - expr(s"INTERVAL $LookbackSeconds SECONDS") &&
        col("p_ts") <= col("c_ts"))
      .select(col("click_id"), col("c_user").as("user_id"),
        unix_micros(col("c_ts").cast("timestamp")).as("click_us"),
        unix_micros(col("p_ts").cast("timestamp")).as("purchase_us"),
        col("p_value").as("purchase_value"))
  }
}
