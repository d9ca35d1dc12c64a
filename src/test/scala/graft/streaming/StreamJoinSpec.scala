package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Stream-stream interval join vs the identical batch join. */
class StreamJoinSpec extends SparkSpec {

  test("streaming attribution join equals the batch interval join") {
    val dir = Files.createTempDirectory("graft-sjoin").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(dir)

    def src = spark.readStream.schema(EventStream.eventSchema).parquet(dir)
    val q = StreamJoin.attributionJoin(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attrib").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM attrib")
        .orderBy("click_id", "purchase_us").collect().toSeq
      val batchSrc = spark.read.parquet(dir)
      val batch = StreamJoin.attributionJoin(
          batchSrc.filter(col("event_type") === "click"),
          batchSrc.filter(col("event_type") === "purchase"),
          watermark = None)
        .orderBy("click_id", "purchase_us").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed.map(_.toString) == batch.map(_.toString))
      // the plan is a genuine stream-stream join with state bounds
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty, "no stateful operator in the streaming plan")
    } finally q.stop()
  }
}
