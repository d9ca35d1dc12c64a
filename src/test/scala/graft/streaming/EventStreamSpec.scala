package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming semantics checked against the equivalent batch plan on the
  * same input (stream-batch parity).
  */
class EventStreamSpec extends SparkSpec {

  test("windowed streaming counts equal the batch aggregation") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // stage the sf0.001 events as the stream source, normalizing the
    // TIMESTAMP_NTZ column to TIMESTAMP (UTC session)
    val real = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    real.coalesce(1).write.mode("append").parquet(dir)
    // file source orders micro-batches by mtime
    Thread.sleep(1100)
    // append mode emits a window only when the watermark finalizes it —
    // a far-future sentinel batch advances the watermark past every
    // real window
    val maxTs = real.agg(max("ts")).head.getTimestamp(0)
    real.limit(1)
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)))
      .withColumn("event_type", lit("__sentinel"))
      .coalesce(1).write.mode("append").parquet(dir)

    val q = EventStream.startMemoryQuery(spark, dir, "evt_counts")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM evt_counts WHERE event_type != '__sentinel'")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventStream.windowedCounts(real)
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streamed page extraction equals the batch triple set") {
    val dir = Files.createTempDirectory("graft-pages").toString
    val files = graft.fixtures.FixtureCorpus.corpus(spark, 20, 4)
    files.write.mode("overwrite").parquet(dir)

    val q = PageStream.startMemoryQuery(spark, dir, "page_triples")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM page_triples")
        .orderBy("docId", "subj", "pred", "obj").collect().toSeq
      val batch = graft.stages.MentionDetect.triplesDirect(
        spark.read.parquet(dir).as[graft.model.SourceFile](
          org.apache.spark.sql.Encoders.product[graft.model.SourceFile])).toDF()
        .orderBy("docId", "subj", "pred", "obj").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }
}
