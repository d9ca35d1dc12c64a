package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming exact dedup (dropDuplicatesWithinWatermark) vs the batch
  * dedup on the same input, including cross-micro-batch duplicates.
  */
class DedupStreamSpec extends SparkSpec {

  test("stream dedup emits exactly the batch-distinct hash set") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0.getTime + offsetMin * 60000)
    def write(rows: Seq[(java.sql.Timestamp, String)]): Unit = {
      rows.toDF("ts", "text").coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // file source orders micro-batches by mtime
    }
    // batch 1: three docs, one in-batch duplicate
    write(Seq(ts(0) -> "alpha doc", ts(1) -> "beta doc", ts(2) -> "alpha doc"))
    // batch 2: a CROSS-batch duplicate within the watermark + one new doc
    write(Seq(ts(3) -> "beta doc", ts(4) -> "gamma doc"))

    val schema = "ts timestamp, text string"
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = DedupStream.dedupStream(src, "text").writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    try {
      q.processAllAvailable()
      // hex() for comparison: content_hash is the raw 16-byte key
      val streamed = spark.sql("SELECT hex(content_hash), text FROM deduped").collect()
      val batch = DedupStream.dedupBatch(spark.read.parquet(dir), "text")
        .selectExpr("hex(content_hash)").collect()
      // one surviving row per distinct content, same hash set as batch
      assert(streamed.length == 3)
      assert(streamed.map(_.getString(0)).toSet == batch.map(_.getString(0)).toSet)
      assert(streamed.map(_.getString(1)).toSet == Set("alpha doc", "beta doc", "gamma doc"))
    } finally q.stop()
  }

  test("only the 16-byte hash enters the dedup state, never the content") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), "x")).toDF("ts", "text")
    // structural property: the dedup key column set is exactly content_hash
    val plan = DedupStream.dedupBatch(df, "text")
      .queryExecution.analyzed.toString
    assert(plan.contains("content_hash"))
  }
}
