package graft.exec

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Stage checkpointing + per-partition lineage (north-rule resumability).
  *
  * Distributed generalization of the reference's md5-keyed page cache
  * (aps_extractor.py:52-66): each stage writes
  *   <root>/<stage>/data      partitioned parquet
  *   <root>/<stage>/lineage   (runId, stage, snapshotId, partitionId,
  *                             rowCount, wallMs) one row per partition
  *   <root>/<stage>/_SUCCESS_SNAPSHOT  the snapshot id the data is for
  * A stage recomputes only when its recorded snapshot id differs from the
  * current input snapshot id; otherwise the data table is read back and
  * the upstream plan is skipped entirely.
  *
  * Emulates Iceberg-style snapshot/commit semantics over plain parquet
  * (no Iceberg runtime ships offline — SURVEY.md §7.4 risk 3); the
  * facade keeps a real catalog swappable.
  */
final case class Checkpoint(root: String, runId: String) {

  private def stageDir(stage: String) = s"$root/$stage"
  private def marker(stage: String) = Paths.get(s"${stageDir(stage)}/_SUCCESS_SNAPSHOT")

  def completedSnapshot(stage: String): Option[String] =
    if (Files.exists(marker(stage))) Some(Files.readString(marker(stage)).trim) else None

  def isComplete(stage: String, snapshotId: String): Boolean =
    completedSnapshot(stage).contains(snapshotId)

  /** Run `compute` unless this (stage, snapshotId) already committed;
    * either way return the stage's data as a DataFrame read from the
    * checkpoint table (so downstream plans cut lineage here).
    */
  def stage(spark: SparkSession, stageName: String, snapshotId: String,
      partitionByCols: Seq[String] = Nil)(compute: => DataFrame): DataFrame = {
    if (!isComplete(stageName, snapshotId)) {
      val t0 = System.nanoTime()
      val df = compute
      // Per-partition lineage rows collected on executors during the write
      // pass (one extra column, dropped from the data table).
      val withPart = df.withColumn("__pid", spark_partition_id())
      withPart.persist()
      val writer = withPart.drop("__pid").write.mode("overwrite")
      (if (partitionByCols.nonEmpty) writer.partitionBy(partitionByCols: _*) else writer)
        .parquet(s"${stageDir(stageName)}/data")
      val wallMs = (System.nanoTime() - t0) / 1000000
      // North-rule lineage shape: when the stage data carries provenance
      // columns, record the per-partition input files and content hashes
      // alongside the row count.
      val provenanceAggs =
        (if (df.columns.contains("path"))
          Seq(collect_list(col("path")).as("inputFiles")) else Nil) ++
        (if (df.columns.contains("sha256"))
          Seq(collect_list(col("sha256")).as("sha256s")) else Nil)
      val lineage = withPart.groupBy(col("__pid").as("partitionId"))
        .agg(count(lit(1)).as("rowCount"), provenanceAggs: _*)
        .withColumn("runId", lit(runId))
        .withColumn("stage", lit(stageName))
        .withColumn("snapshotId", lit(snapshotId))
        .withColumn("wallMs", lit(wallMs))
      lineage.write.mode("overwrite").parquet(s"${stageDir(stageName)}/lineage")
      withPart.unpersist()
      Files.createDirectories(marker(stageName).getParent)
      Files.writeString(marker(stageName), snapshotId)
    }
    spark.read.parquet(s"${stageDir(stageName)}/data")
  }

  def lineage(spark: SparkSession, stageName: String): DataFrame =
    spark.read.parquet(s"${stageDir(stageName)}/lineage")
}

object Checkpoint {
  /** Snapshot id of an input: sha256 of the sorted (path, sha) list would
    * be exact but requires a full pass; for the deterministic fixture
    * corpus the (generator, size) pair identifies the snapshot.
    */
  def snapshotId(tag: String, n: Long): String = s"$tag-$n"
}
