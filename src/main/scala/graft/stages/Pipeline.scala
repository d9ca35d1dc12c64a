package graft.stages

import graft.exec.Checkpoint
import graft.model._
import graft.rules.TripleEmit
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The full KG-construction flow (SURVEY.md §3.4):
  *
  *   source files --(ingest: sha256 invariant)-->
  *   records --(mention detect, mapPartitions)-->
  *   triples + entity mentions --(entity link: broadcast dict +
  *   MinHash-LSH fuzzy self-join)--> same-entity edges --(canonicalize:
  *   iterative-join CC)--> entity table + canonicalized triples.
  *
  * Shuffle inventory: extraction is shuffle-free (narrow mapPartitions);
  * linking shuffles the *distinct names* (tiny vs corpus); CC shuffles
  * edges per iteration; the final rewrite joins triples against the
  * broadcast canonical map. At 100 TB the content-bearing stage stays
  * embarrassingly parallel and nothing re-shuffles page bodies.
  */
object Pipeline {

  /** Seed canonical dictionary (FIXTURES.md §4): institution/venue alias
    * clusters the fixtures exercise. In production this is a real alias
    * table; it is broadcast-sized by construction.
    */
  def canonicalDict(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("inst", "Westlake Institute for Advanced Study", "Westlake University"),
      ("inst", "Massachusetts General Hospital", "Massachusetts General Hospital"),
      ("venue", "Phys. Rev. Research", "Physical Review Research"),
      ("venue", "PRX Quantum", "PRX Quantum"),
      ("venue", "Nature Physics", "Nature Physics")
    ).toDF("kind", "alias", "canonical")
  }

  def mentionsOfRecord(r: PaperRecord): Seq[Mention] = {
    val inst = r.authors.flatMap(_.affiliations).distinct
      .map(a => Mention(r.docId, "inst", graft.rules.AffiliationNormalizer.institution(graft.rules.Text.cleanWs(a))))
    val auth = r.authors.map(a => Mention(r.docId, "author", graft.rules.Text.cleanWs(a.name)))
    val venue = r.journalName.map(j => Mention(r.docId, "venue", graft.rules.Text.cleanWs(j))).toSeq
    inst ++ auth ++ venue
  }

  def mentionsOf(records: Dataset[PaperRecord]): Dataset[Mention] = {
    import records.sparkSession.implicits._
    records.flatMap(mentionsOfRecord _)
  }

  /** Entity resolution over mention names: exact dictionary edges +
    * fuzzy LSH edges -> connected components -> canonical map
    * (name -> canonicalId = lexicographic min of its component).
    */
  def canonicalMap(spark: SparkSession, mentions: Dataset[Mention], tau: Double = 0.55): DataFrame =
    canonicalMapFromNames(spark, EntityLink.namesOf(mentions), tau)

  /** Same, over an already-distinct (kind, name) frame — callers that
    * also need the name frame persist it once and pass it in, so the
    * mention stream (and the page parse feeding it) evaluates once.
    */
  def canonicalMapFromNames(spark: SparkSession, names: DataFrame, tau: Double = 0.55): DataFrame = {
    val exact = EntityLink.dictEdges(names, canonicalDict(spark))
    val fuzzy = EntityLink.fuzzyEdges(names, tau).select("kind", "src", "dst")
    val edges = exact.union(fuzzy)
      .select(concat_ws("|", col("kind"), col("src")).as("src"),
        concat_ws("|", col("kind"), col("dst")).as("dst"))
    Canonicalize.connectedComponents(edges)
      .select(split(col("id"), "\\|", 2).getItem(0).as("kind"),
        split(col("id"), "\\|", 2).getItem(1).as("name"),
        split(col("canonicalId"), "\\|", 2).getItem(1).as("canonicalName"))
  }

  /** Entity table: every distinct mention name, mapped to its canonical
    * id (singleton components keep their own name). The distinct-name
    * frame is persisted: it feeds the dictionary join, the LSH banding,
    * and the final left join — without the persist each of those pulls
    * would re-parse every page body upstream.
    */
  def entities(spark: SparkSession, mentions: Dataset[Mention]): DataFrame = {
    // eager localCheckpoint, not persist: materializes the (small,
    // distinct) name set once, truncates lineage so no consumer re-parses
    // pages, and the blocks are context-cleaned when the frame becomes
    // unreachable — a plain persist here would pin one copy per call for
    // the session lifetime (entities is called per query / per bench rep)
    val names = EntityLink.namesOf(mentions).localCheckpoint(true)
    val cmap = canonicalMapFromNames(spark, names)
    names
      .join(cmap, Seq("kind", "name"), "left")
      .select(col("kind"), col("name"),
        coalesce(col("canonicalName"), col("name")).as("entityId"))
  }

  /** End-to-end: files -> canonicalized triples (+ entity table).
    * Records are persisted: both the triple emission and the mention
    * stream consume them, and re-parsing page bodies is the expensive
    * part of the whole pipeline.
    */
  def run(spark: SparkSession, files: Dataset[SourceFile]): (Dataset[Triple], DataFrame) = {
    // fused passes: parsing twice is ~20x cheaper than round-tripping the
    // nested PaperRecord through its encoder (see MentionDetect.triplesDirect)
    val triples = MentionDetect.triplesDirect(files)
    val ents = entities(spark, MentionDetect.mentionsDirect(files))
    (triples, ents)
  }

  /** Checkpointed variant: each stage commits to <root>/<stage>/data with
    * per-partition lineage; a re-run with the same snapshot skips
    * completed stages (resume-from-kill).
    */
  def runCheckpointed(spark: SparkSession, files: Dataset[SourceFile],
      ckpt: Checkpoint, snapshotId: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    // Ingest metadata stage: content sha256 invariant surface + the
    // north-rule lineage shape (per-partition inputFiles + sha256s).
    // Metadata-only — content never reaches this table.
    ckpt.stage(spark, "ingest", snapshotId) {
      Ingest.withSha(files).select("repo", "path", "commit", "lang", "sha256")
    }
    val recordsDf = ckpt.stage(spark, "records", snapshotId) {
      MentionDetect.records(files).toDF()
    }
    val triplesDf = ckpt.stage(spark, "triples", snapshotId, partitionByCols = Seq("pred")) {
      implicit val enc = org.apache.spark.sql.Encoders.product[Triple]
      recordsDf.as[PaperRecord].flatMap(TripleEmit.emit).toDF()
    }
    val entitiesDf = ckpt.stage(spark, "entities", snapshotId, partitionByCols = Seq("kind")) {
      entities(spark, mentionsOf(recordsDf.as[PaperRecord]))
    }
    (triplesDf, entitiesDf)
  }
}
