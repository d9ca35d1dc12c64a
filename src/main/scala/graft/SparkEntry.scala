package graft

import graft.fixtures.FixtureCorpus
import graft.queries.{KgQueries, RelationalQueries, SimilarityQueries, TextQueries}
import graft.stages.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship KG pipeline over the bundled fixture corpus;
  * `queries` covers the operator inventory (SURVEY.md §2) plus the
  * training-data-pipeline operators (dedup / similarity / text analysis)
  * over the driver's testdata tables; `oracleSql` carries the DuckDB
  * equivalent for every SQL-expressible query (same column names, both
  * sides ordered).
  */
object SparkEntry {

  /** Flagship: full KG-construction pipeline (slice -> extract -> triple
    * emit -> entity link -> canonicalize) on a small replicated fixture
    * corpus, with the entity table CONSUMED: author objects carry their
    * canonical entity id, so the smoke check covers linking +
    * canonicalization output, not just extraction (previously the ents
    * half was computed and discarded). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val files = FixtureCorpus.corpus(spark, 50, 8)
    val (triples, ents) = Pipeline.run(spark, files)
    val authorCanon = ents.filter(col("kind") === "author")
      .select(concat(lit("author:"), col("name")).as("obj"),
        col("entityId").as("canonical_author"))
    triples.toDF().join(broadcast(authorCanon), Seq("obj"), "left")
      .select("docId", "subj", "pred", "obj", "canonical_author")
  }

  /** NOTE on the `sfDir` argument: the relational (q*), text (t*) and
    * similarity (s*) queries read the driver's parquet tables under
    * `sfDir`; the kg* queries intentionally IGNORE it — their input is
    * the deterministic in-memory fixture corpus (the reference's journal
    * pages, which have no sfDir analogue), so their outputs are
    * byte-stable across scale factors and can be VALUES-pinned in
    * `oracleSql`.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++ KgQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ SimilarityQueries.oracle ++
      KgQueries.oracle ++ graft.queries.PinnedOracles.all

  /** sfDir-aware oracle set (what Verify ships): identical to
    * [[oracleSql]] at the pin-capture sf (sf0.01 — the driver's Verify
    * sf), but data-dependent VALUES pins are DROPPED for any other
    * sfDir so a mismatched run degrades to rows-only checks instead of
    * spuriously hard-failing the compare.
    */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ SimilarityQueries.oracle ++
      KgQueries.oracle ++ graft.queries.PinnedOracles.forSfDir(sfDir)
}
