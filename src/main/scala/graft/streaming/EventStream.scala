package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface: the engine's incremental-ingest path.
  *
  * The reference is strictly batch (SURVEY.md §2.10) — this module is the
  * forward-looking stream form of the same dataflow: a stream of event
  * rows (or newly-crawled pages) flows through watermarked windowed
  * aggregation into an in-memory/parquet sink. Local testing drives a
  * parquet directory as a micro-batch source with processAllAvailable.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked 5-minute windowed counts per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Start a memory-sink query over a parquet directory source.
    *
    * Append mode, not complete: in complete mode the watermark never
    * evicts window state (every window ever seen must be re-emitted each
    * trigger), so state grows O(total windows) on an unbounded feed — the
    * opposite of what the watermark is for. Append emits each window once
    * when the watermark finalizes it and the state store stays bounded;
    * a parquet sink (the production shape) accepts only append anyway.
    */
  def startMemoryQuery(spark: SparkSession, srcDir: String, name: String): StreamingQuery = {
    val src = spark.readStream.schema(eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    windowedCounts(src).writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
  }
}
