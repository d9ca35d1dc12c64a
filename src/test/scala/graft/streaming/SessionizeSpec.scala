package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Custom-state streaming (flatMapGroupsWithState, event-time timeout)
  * against the batch lag/cumsum plan on the same input.
  */
class SessionizeSpec extends SparkSpec {

  private val GapUs = 6L * 3600 * 1000000 // 6 hours

  test("streaming sessionization equals the batch plan after flush") {
    val dir = Files.createTempDirectory("graft-sessions").toString
    val real = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    real.coalesce(1).write.mode("append").parquet(dir)
    // the file source orders micro-batches by modification time — make
    // sure the sentinel file's mtime strictly follows the data file's
    Thread.sleep(1100)
    // sentinel batch far in the future: advances the watermark past every
    // open session's (end + gap) so event-time timeouts flush them all
    val maxTs = real.agg(max("ts")).head.getTimestamp(0)
    real.limit(1)
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 30L * 24 * 3600 * 1000)))
      .withColumn("user_id", lit(-1L))
      .coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Sessionize.sessionizeStream(src, GapUs).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM sessions WHERE user_id >= 0")
        .orderBy("user_id", "session_start_us").collect().toSeq
      val batch = Sessionize.sessionizeBatch(real, GapUs)
        .orderBy("user_id", "session_start_us").collect().toSeq
      assert(streamed.nonEmpty)
      assert(streamed.map(_.toString) == batch.map(_.toString))
      // multiple sessions per user actually exercised (gap < span)
      val users = streamed.map(_.getLong(0)).distinct
      assert(streamed.size > users.size, "gap too large: one session per user")
    } finally q.stop()
  }

  test("cross-batch out-of-order event within the watermark keeps parity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sessions-ooo").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0.getTime + offsetMin * 60000)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit = {
      rows.toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100) // file source orders micro-batches by mtime
    }
    // batch 1: t+0 and t+2min -> open session ends at t+2min
    write(Seq((1L, ts(0), 1.0), (1L, ts(2), 2.0)))
    // batch 2: t+1min — OUT OF ORDER but within the 10-minute watermark;
    // a naive endUs := e.us would regress the session end to t+1min
    write(Seq((1L, ts(1), 4.0)))
    // sentinel: advance the watermark far enough to flush by timeout
    write(Seq((-1L, ts(60L * 24 * 40), 0.0)))

    val src = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Sessionize.sessionizeStream(src, GapUs).writeStream
      .format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM sessions_ooo WHERE user_id >= 0")
        .orderBy("user_id", "session_start_us").collect().toSeq
      val batch = Sessionize.sessionizeBatch(
          spark.read.parquet(dir).filter(col("user_id") >= 0), GapUs)
        .orderBy("user_id", "session_start_us").collect().toSeq
      assert(streamed.map(_.toString) == batch.map(_.toString),
        s"streamed=$streamed batch=$batch")
      // one merged session covering all three events, end NOT regressed
      assert(streamed.size == 1)
      assert(streamed.head.getLong(2) == ts(2).getTime * 1000, streamed.head.toString)
      assert(streamed.head.getLong(3) == 3L)
    } finally q.stop()
  }

  test("late events merge with each other and can bridge into the open session") {
    // gap (60 s) << watermark (10 min): late events can land more than a
    // gap before the open session — the greedy fold used to emit each as
    // its own singleton session, diverging from batch
    import spark.implicits._
    val shortGapUs = 60L * 1000000
    val dir = Files.createTempDirectory("graft-sessions-late").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(offsetSec: Long) = new java.sql.Timestamp(t0.getTime + offsetSec * 1000)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit = {
      rows.toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    // user 1: open session at 12:00; late pair 11:55:00/11:55:30 must
    // merge into ONE earlier session (not two singletons).
    // user 2: open session at 12:00; late 11:58:45 bridged by 11:59:30
    // must merge INTO the open session (one session overall).
    write(Seq((1L, ts(0), 1.0), (2L, ts(0), 1.0)))
    write(Seq((1L, ts(-300), 2.0), (1L, ts(-270), 3.0),
      (2L, ts(-75), 2.0), (2L, ts(-30), 3.0)))
    write(Seq((-1L, ts(3600L * 24 * 40), 0.0))) // watermark flush sentinel

    val src = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Sessionize.sessionizeStream(src, shortGapUs).writeStream
      .format("memory").queryName("sessions_late").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM sessions_late WHERE user_id >= 0")
        .orderBy("user_id", "session_start_us").collect().toSeq
      val batch = Sessionize.sessionizeBatch(
          spark.read.parquet(dir).filter(col("user_id") >= 0), shortGapUs)
        .orderBy("user_id", "session_start_us").collect().toSeq
      assert(streamed.map(_.toString) == batch.map(_.toString),
        s"streamed=$streamed batch=$batch")
      val byUser = streamed.groupBy(_.getLong(0))
      assert(byUser(1L).size == 2, byUser(1L).toString) // merged pair + open
      assert(byUser(2L).size == 1, byUser(2L).toString) // bridged into one
    } finally q.stop()
  }

  test("an in-watermark event can merge into a session from an earlier batch") {
    // gap 5 min, watermark 10 min. Batch 1: 10:00 and 10:12 -> two
    // pending sessions, watermark 10:02. Batch 2: 10:04 — ADMITTED
    // (>= watermark) and must merge with the 10:00 session even though a
    // newer session exists; premature emission of [10:00] would split it.
    import spark.implicits._
    val shortGapUs = 5L * 60 * 1000000
    val dir = Files.createTempDirectory("graft-sessions-adm").toString
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    def ts(offsetMin: Long) = new java.sql.Timestamp(t0.getTime + offsetMin * 60000)
    def write(rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit = {
      rows.toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(1100)
    }
    write(Seq((1L, ts(0), 1.0), (1L, ts(12), 2.0)))
    write(Seq((1L, ts(4), 4.0)))
    write(Seq((-1L, ts(60L * 24 * 40), 0.0))) // watermark flush sentinel

    val src = spark.readStream.schema(EventStream.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = Sessionize.sessionizeStream(src, shortGapUs).writeStream
      .format("memory").queryName("sessions_adm").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM sessions_adm WHERE user_id >= 0")
        .orderBy("user_id", "session_start_us").collect().toSeq
      val batch = Sessionize.sessionizeBatch(
          spark.read.parquet(dir).filter(col("user_id") >= 0), shortGapUs)
        .orderBy("user_id", "session_start_us").collect().toSeq
      assert(streamed.map(_.toString) == batch.map(_.toString),
        s"streamed=$streamed batch=$batch")
      assert(streamed.size == 2)
      // first session spans 10:00-10:04 with all three... no: 10:12 is its own
      assert(streamed.head.getLong(2) == ts(4).getTime * 1000, streamed.head.toString)
      assert(streamed.head.getLong(3) == 2L)
    } finally q.stop()
  }

  test("state is bounded: one Open struct per active user") {
    // structural property of the operator: the state value is a fixed-size
    // struct, independent of how many events the session absorbed
    val fields = classOf[Sessionize.Open].getDeclaredFields.map(_.getType.getSimpleName).toSet
    assert(fields.subsetOf(Set("long", "double")), fields)
  }
}
