package graft.stages

import graft.model.Mention
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Entity linking (J6): mention surfaces -> candidate same-entity edges.
  *
  * Two match paths, both shuffle-lean:
  *  - exact-alias match against a broadcast canonical dictionary
  *    (tiny build side -> broadcast hash join);
  *  - fuzzy matching of name variants (O'Dea/ODea, Centre/Center, ...)
  *    via hand-rolled banded MinHash-LSH over character 3-gram shingles:
  *    explode to (band, bandKey) -> equi self-join per bucket -> verified
  *    Jaccard filter. Keeps the dependency surface at spark-sql (no
  *    spark-ml vectors) and the join an equi join Catalyst can plan.
  *
  * Determinism: fixed hash seeds; band keys derived from MurmurHash3.
  * Scale: the self-join is per (kind, band, bandKey) bucket — cardinality
  * per bucket is bounded by near-duplicate density, never all-pairs.
  */
object EntityLink {

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands
  private val Prime = 2038074743L // large prime < 2^31 * ~0.95

  // Fixed affine coefficients (seeded, deterministic across JVMs).
  private val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Shingling key: lowercase alphanumerics only — folds case,
    * punctuation and spacing variants (O'Dea == ODea) before hashing.
    */
  def shingleKey(s: String): String = s.toLowerCase.filter(_.isLetterOrDigit)

  def shingles(s: String, k: Int = 3): Set[String] = {
    val key = shingleKey(s)
    if (key.length <= k) Set(key) else key.sliding(k).toSet
  }

  def jaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size.toDouble
      inter / (a.size + b.size - inter)
    }
  }

  def signature(sh: Set[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    sh.foreach { g =>
      val h = MurmurHash3.stringHash(g, 0x9747b28c).toLong & 0xffffffffL
      var i = 0
      while (i < NumHashes) {
        val (a, b) = coeffs(i)
        val v = (a * h + b) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Band keys of a name: Bands entries hashing RowsPerBand signature
    * slots each. Same band key in the same band => LSH candidate pair.
    */
  def bandKeys(name: String): Seq[(Int, Long)] = {
    val sig = signature(shingles(name))
    (0 until Bands).map { b =>
      val slice = sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand)
      (b, MurmurHash3.arrayHash(slice, 0x85ebca6b).toLong)
    }
  }

  /** Distinct (kind, name) -> verified fuzzy same-entity edges
    * (kind, src, dst, jaccard) with src < dst.
    */
  def fuzzyEdges(names: DataFrame, tau: Double): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._

    // callers pass the already-distinct (kind, name) frame (namesOf ends
    // in distinct()); duplicate rows would only produce duplicate
    // candidate pairs, absorbed by the distinct() after the self-join —
    // so no re-shuffle for dedup here
    val banded = names.select("kind", "name").as[(String, String)]
      .flatMap { case (kind, name) =>
        bandKeys(name).map { case (b, k) => (kind, name, b, k) }
      }.toDF("kind", "name", "band", "bkey")
      // consumed twice (both sides of the self-join) — don't re-minhash;
      // eager localCheckpoint instead of persist so the blocks are
      // context-cleaned once unreachable (persist would pin a copy per
      // call for the session lifetime)
      .localCheckpoint(true)

    val l = banded.as("l")
    val r = banded.as("r")
    val candidates = l.join(r,
        $"l.kind" === $"r.kind" && $"l.band" === $"r.band" &&
          $"l.bkey" === $"r.bkey" && $"l.name" < $"r.name")
      .select($"l.kind".as("kind"), $"l.name".as("src"), $"r.name".as("dst"))
      .distinct()

    candidates.as[(String, String, String)]
      .map { case (kind, a, b) => (kind, a, b, jaccard(shingles(a), shingles(b))) }
      .toDF("kind", "src", "dst", "jaccard")
      .filter($"jaccard" >= tau)
  }

  /** Exact-alias edges from a canonical dictionary (kind, alias,
    * canonical): broadcast hash join, no shuffle of the mention side.
    */
  def dictEdges(names: DataFrame, dict: DataFrame): DataFrame = {
    // (kind, alias) is the hash-join key — joining on kind alone and
    // filtering afterwards would probe every dictionary entry of that
    // kind per mention (quadratic once the dictionary grows). Input is
    // the already-distinct name frame; duplicates would only duplicate
    // edges, which connected components absorbs.
    names.select("kind", "name").as("n")
      .join(broadcast(dict.as("d")),
        col("n.kind") === col("d.kind") && col("n.name") === col("d.alias"))
      .filter(col("n.name") =!= col("d.canonical"))
      .select(col("n.kind").as("kind"), col("n.name").as("src"), col("d.canonical").as("dst"))
  }

  /** Mentions -> distinct (kind, name) frame. */
  def namesOf(mentions: Dataset[Mention]): DataFrame =
    mentions.toDF().select(col("kind"), col("surface").as("name")).distinct()
}
