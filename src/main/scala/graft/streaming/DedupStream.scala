package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact content dedup in both execution modes — the streaming twin of
  * the t01 batch operator (hash-groupBy dedup):
  *
  *  - streaming: `dropDuplicatesWithinWatermark` on the content hash.
  *    State holds one 16-byte key per distinct hash seen within the
  *    watermark window and is evicted as the watermark advances —
  *    bounded state, the property that makes dedup viable on an
  *    unbounded feed. (Plain `dropDuplicates` on a stream would retain
  *    every key forever.)
  *  - batch: `dropDuplicates` over the same hash.
  *
  * Duplicates separated by MORE than the watermark delay are a documented
  * divergence from batch: the stream form forgets the first occurrence
  * and re-emits (the standard cross-engine contract for windowed dedup —
  * dedup horizon = lateness bound). Parity inside the window is asserted
  * in DedupStreamSpec.
  *
  * Only the 16-byte hash enters state — never the content — the same
  * shuffle-the-hash-not-the-text design as the batch dedup (t01), so the
  * operator's network/state cost at 100 TB is keys, not pages.
  */
object DedupStream {

  /** Streaming form over rows with (ts timestamp, `contentCol` string).
    * unhex(md5) -> BinaryType: the state key is the actual 16 md5 bytes,
    * not the 32-char hex string (2x+ state/shuffle per key at scale).
    */
  def dedupStream(docs: DataFrame, contentCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", unhex(md5(col(contentCol))))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Batch form: global dedup, arbitrary-but-deterministic keeper not
    * guaranteed — callers needing a canonical keeper use the t01
    * min-keeper aggregation instead.
    */
  def dedupBatch(docs: DataFrame, contentCol: String): DataFrame =
    docs
      .withColumn("content_hash", unhex(md5(col(contentCol))))
      .dropDuplicates("content_hash")
}
