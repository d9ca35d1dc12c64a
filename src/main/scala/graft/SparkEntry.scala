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
    * corpus. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = FixtureCorpus.corpus(spark, 50, 8)
    val (triples, _) = Pipeline.run(spark, files)
    triples.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++ KgQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ TextQueries.oracle ++ SimilarityQueries.oracle ++
      KgQueries.oracle
}
