package graft.stages

import graft.model.SourceFile
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Ingest: the source table scan + per-row content invariant.
  *
  * Adds `sha256 = sha2(content, 256)` and (optionally) asserts equality
  * against a reference-computed manifest — the distributed analog of the
  * reference's md5(url) content addressing (aps_extractor.py:52-57).
  * The assertion is a counting anti-join, not a driver-side loop.
  */
object Ingest {

  def withSha(files: Dataset[SourceFile]): DataFrame =
    files.withColumn("sha256", sha2(col("content"), 256))

  /** @return number of violations against the manifest (path ->
    * expected sha). 0 = invariant holds. Two-way: a file with a wrong or
    * unknown sha AND a manifest entry whose file is absent from the
    * input both count — a lost file must not pass silently.
    */
  def manifestViolations(files: Dataset[SourceFile], manifest: DataFrame): Long = {
    // manifest: (path, expected_sha); broadcast — it is metadata-sized.
    val f = withSha(files).select("path", "sha256")
    val mismatched = f
      .join(broadcast(manifest), Seq("path"), "left")
      .filter(col("expected_sha").isNull || col("expected_sha") =!= col("sha256"))
      .count()
    val present = f.join(broadcast(manifest.select("path")), Seq("path"))
      .select("path").distinct().count()
    val missing = manifest.select("path").distinct().count() - present
    mismatched + missing
  }
}
