package graft.streaming

import graft.model.SourceFile
import graft.stages.MentionDetect
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental KG construction: newly-landed source pages stream through
  * the same fused extraction the batch path uses (MentionDetect
  * .triplesDirect works unchanged on a streaming Dataset — the stage is
  * stateless per row, so micro-batches need no watermark/state).
  */
object PageStream {

  val sourceSchema: StructType = StructType(Seq(
    StructField("repo", StringType),
    StructField("path", StringType),
    StructField("commit", StringType),
    StructField("lang", StringType),
    StructField("content", StringType)))

  def triplesStream(spark: SparkSession, srcDir: String): DataFrame = {
    import spark.implicits._
    val pages = spark.readStream.schema(sourceSchema).parquet(srcDir).as[SourceFile]
    MentionDetect.triplesDirect(pages).toDF()
  }

  def startMemoryQuery(spark: SparkSession, srcDir: String, name: String): StreamingQuery =
    triplesStream(spark, srcDir).writeStream
      .format("memory").queryName(name).outputMode("append").start()
}
