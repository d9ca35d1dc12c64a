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

  /** Distinct (kind, name) -> verified same-entity edges
    * (kind, src, dst, jaccard).
    *
    * Two scale guards from the blocking literature keep the self-join
    * linear on hostile inputs:
    *  - **identical-key folding**: names with the same normalized shingle
    *    key (case/punctuation/spacing variants — jaccard exactly 1) link
    *    as a star to the group minimum: g-1 edges instead of g(g-1)/2
    *    LSH candidates, and only one representative per key enters LSH;
    *  - **block purging**: an LSH bucket larger than `maxBucket` is
    *    non-discriminative boilerplate (shared-prefix corpora collapse
    *    whole corpora into one bucket) and is dropped — true near-dups
    *    also collide in rarer buckets of the other bands. Purged-bucket
    *    counts are logged, never silent.
    */
  def fuzzyEdges(names: DataFrame, tau: Double, maxBucket: Int = 1000): DataFrame = {
    val spark = names.sparkSession
    import spark.implicits._

    // self-sufficient contract: dedup the input here — a non-distinct
    // (kind, name) frame must not emit duplicate star/jaccard edges.
    // Cheap relative to the window + LSH that follow (Catalyst collapses
    // it into the same shuffle when the caller already deduped); eager
    // localCheckpoints (not persist) below so the blocks are
    // context-cleaned once unreachable
    // NOT localCheckpointed (round 6): keyed's two consumers are the
    // star-edge projection (in the final plan) and the banded build
    // (materialized below) — recomputing the cheap distinct + shingle
    // key + min-window from the caller's checkpointed name set costs
    // one small exchange, where the eager checkpoint cost a full
    // job-barrier on every call. The EXPENSIVE per-name work (the
    // 64-hash minhash signature in bandKeys) stays computed exactly
    // once, inside banded's checkpoint.
    val keyed = names.select("kind", "name").distinct().as[(String, String)]
      .map { case (k, n) => (k, n, shingleKey(n)) }
      .toDF("kind", "name", "skey")
      .withColumn("rep", min(col("name")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("kind"), col("skey"))))

    val starEdges = keyed.filter(col("name") =!= col("rep"))
      .select(col("kind"), col("rep").as("src"), col("name").as("dst"),
        lit(1.0).as("jaccard"))

    val banded = keyed.filter(col("name") === col("rep"))
      .select("kind", "name").as[(String, String)]
      .flatMap { case (kind, name) =>
        bandKeys(name).map { case (b, k) => (kind, name, b, k) }
      }.toDF("kind", "name", "band", "bkey")
      .localCheckpoint(true)

    // round 6: bucket sizes as a count-over-window on the SAME keys the
    // self-join below partitions by — the groupBy + join-back
    // formulation paid an aggregation exchange plus a join exchange in
    // the candidate path for the same pruning; the window's single
    // (kind, band, bkey) shuffle now also satisfies the join's
    // distribution, so the join adds no exchange at all. The purge
    // count stays an eager, logged-never-silent job (round-5 policy),
    // reading the checkpointed banded frame.
    val sized = banded.withColumn("__bsz", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("kind"), col("band"), col("bkey"))))
    val nPurged = sized.filter(col("__bsz") > maxBucket)
      .select("kind", "band", "bkey").distinct().count()
    if (nPurged > 0) org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"fuzzyEdges: purged $nPurged LSH buckets larger than $maxBucket names")
    val pruned = sized.filter(col("__bsz") <= maxBucket).drop("__bsz")

    val l = pruned.as("l")
    // hint("merge") (round 6, the s02 lesson): without it the planner
    // broadcasts one side at small name counts and the broadcast build
    // replays the pruned lineage instead of reusing the size window's
    // exchange; the window already partitions and sorts both sides by
    // the join keys, so SMJ costs nothing extra and matches the only
    // plan possible at production name counts.
    val r = pruned.as("r").hint("merge")
    val candidates = l.join(r,
        $"l.kind" === $"r.kind" && $"l.band" === $"r.band" &&
          $"l.bkey" === $"r.bkey" && $"l.name" < $"r.name")
      .select($"l.kind".as("kind"), $"l.name".as("src"), $"r.name".as("dst"))
      .distinct()

    val fuzzy = candidates.as[(String, String, String)]
      .map { case (kind, a, b) => (kind, a, b, jaccard(shingles(a), shingles(b))) }
      .toDF("kind", "src", "dst", "jaccard")
      .filter($"jaccard" >= tau)

    starEdges.unionByName(fuzzy)
  }

  /** Exact-alias edges from a canonical dictionary (kind, alias,
    * canonical): broadcast hash join, no shuffle of the mention side.
    */
  def dictEdges(names: DataFrame, dict: DataFrame): DataFrame = {
    // (kind, alias) is the hash-join key — joining on kind alone and
    // filtering afterwards would probe every dictionary entry of that
    // kind per mention (quadratic once the dictionary grows). Dedup here
    // keeps the edge set duplicate-free for any caller.
    names.select("kind", "name").distinct().as("n")
      .join(broadcast(dict.as("d")),
        col("n.kind") === col("d.kind") && col("n.name") === col("d.alias"))
      .filter(col("n.name") =!= col("d.canonical"))
      .select(col("n.kind").as("kind"), col("n.name").as("src"), col("d.canonical").as("dst"))
  }

  /** Mentions -> distinct (kind, name) frame. */
  def namesOf(mentions: Dataset[Mention]): DataFrame =
    mentions.toDF().select(col("kind"), col("surface").as("name")).distinct()
}
