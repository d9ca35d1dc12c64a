package graft.functions

import graft.rules.{AffiliationNormalizer, MarkdownSlicer, Text}
import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the engine's scalar rule functions
  * (SURVEY §2.2 P26 / §2.7): a `spark.sql` user gets the same
  * normalizer/slicer the typed pipeline uses.
  *
  * These are Scala UDFs (opaque to codegen) — acceptable because they are
  * the *interactive* surface; the hot extraction path calls the same
  * functions directly inside mapPartitions and never pays the UDF
  * SerDe. The two native Catalyst expressions (simhash64,
  * regexp_count_fast) stay registered through [[graft.plans.GraftExtensions]].
  */
object GraftUdfs {

  /** Struct result of normalize_affiliation (nature_extractor.py:59-113
    * returns the (institution, country) pair).
    */
  final case class NormalizedAff(institution: String, country: String)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize_affiliation", (aff: String) =>
      if (aff == null) null
      else {
        val (inst, country) = AffiliationNormalizer.normalize(aff)
        NormalizedAff(inst, country)
      })
    spark.udf.register("affiliation_country", (aff: String) =>
      if (aff == null) null else AffiliationNormalizer.country(aff))
    spark.udf.register("slice_markdown", (md: String) =>
      if (md == null) null else MarkdownSlicer.slice(md).orNull)
    spark.udf.register("clean_ws", (s: String) =>
      if (s == null) null else Text.cleanWs(s))
  }
}
