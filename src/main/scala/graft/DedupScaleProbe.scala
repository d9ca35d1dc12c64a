package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Document-dedup scale-headroom instrument (not part of the driver
  * contract): runs the PRODUCTION s01 (MinHash-LSH near-dup pairs) and
  * s10 (pairs -> connected components -> keeper) query paths unchanged
  * against a synthesized corpus of SPARK_GRAFT_DEDUP_N documents
  * (default 1M), so the "first production job of a training-data
  * pipeline" claim rests on the same code the driver oracles at sf0.01.
  *
  * Corpus (deterministic, id-seeded, generated in parallel):
  *  - planted near-dup clusters of 5 (ids [0, N/50)): member j of a
  *    cluster replaces j of the cluster's 240 base words with unique
  *    tokens, spanning exact dups (J=1.0) down to pairs straddling the
  *    0.8 verification threshold. Ground truth = exact shingle Jaccard
  *    per in-cluster pair, recomputed independently (same generator,
  *    EntityLink.jaccard directly — no LSH).
  *  - one giant boilerplate cluster (ids [N/50, N/50 + N/20)): IDENTICAL
  *    template pages — every band hashes them into one bucket, the
  *    banded-join skew case the spanning-chain guard in
  *    [[graft.queries.SimilarityQueries.neardupPairsOf]] exists for.
  *  - the rest: unique 120-word docs, 30% carrying a shared 30-word
  *    boilerplate prefix (partial-signature skew, no true dups).
  *
  * Reported: recall of detected pairs vs planted truth, keeper
  * correctness vs an independent driver-side union-find over the
  * detected pairs (all N assignments checked distributively), the giant
  * cluster collapsing to one keeper, and per-stage walls — s01 cold
  * (shingle+band+join+verify+persist), s01 warm (persisted read-back),
  * s10 (warm pairs -> CC -> keeper attach over all N docs). The probe
  * also runs and HARD-GATES (require) the round-5 text ops over the
  * same corpus: t17 duplicated-span inventory (every boilerplate page
  * must be 100% duplicated spans, zero phantom dups on pure-unique
  * docs), t15 contamination (every non-eval boilerplate page
  * flagged, zero pure-unique false positives, adversarially large
  * eval broadcast), and t19 span removal (exactly one canonical
  * boilerplate page survives — its clean text pinned to the template's
  * byte length, which also forces the rebuild projection into the
  * timed plan — the other 49,999 fully empty, zero unique docs lose a
  * word).
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DEDUP_N=1000000 \
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.DedupScaleProbe"
  * Run at CPUS=8 then 32 for a dedup scaling cycle.
  */
object DedupScaleProbe {

  /** Member j of a cluster replaces j base words at deterministic
    * scattered positions with member-unique tokens.
    */
  private def clusterText(cid: Long, member: Int): String =
    ProbeCorpus.mutated(cid, salt = member, k = member, tag = "u")

  private def textOf(id: Long, clusterEnd: Long, navEnd: Long): String =
    if (id < clusterEnd) clusterText(id / 5, (id % 5).toInt)
    else if (id < navEnd) ProbeCorpus.NavTemplate
    else ProbeCorpus.uniqueText(id)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_DEDUP_N", "1000000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DIR", "/tmp/graft_dedup_scale")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import MainUtil.timed

    val clusterEnd = n / 50 / 5 * 5 // whole clusters of 5
    val navEnd = clusterEnd + n / 20
    val nClusters = clusterEnd / 5

    spark.range(0, n, 1, cpus.toInt * 4)
      .map(id => (id, textOf(id, clusterEnd, navEnd)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"PROBE dedup corpus written: $n docs " +
      s"($nClusters planted clusters of 5, ${navEnd - clusterEnd} boilerplate pages)")

    // planted ground truth: exact shingle Jaccard per in-cluster pair,
    // via the SAME jaccard/shingle code the engine verifies with but NO
    // LSH in the path (what LSH recall is measured against)
    val truth = spark.range(0, nClusters).flatMap { cid =>
      val texts = (0 until 5).map(m => graft.queries.SimilarityQueries
        .wordShingles(clusterText(cid, m)))
      for {
        i <- 0 until 5; j <- (i + 1) until 5
        jac = graft.stages.EntityLink.jaccard(texts(i), texts(j))
        if jac >= 0.8
      } yield (cid * 5 + i, cid * 5 + j)
    }.collect().toSet
    println(s"PROBE planted truth: ${truth.size} in-cluster pairs with exact J >= 0.8")

    // s01: cold build (shingle + band + chain/join + verify + persist),
    // then warm read-back of the persisted pair table
    def s01() = timed(SparkEntry.queries("s01_minhash_neardup")(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))))
    val (pairs, wCold) = s01()
    val (_, wWarm) = s01()
    println(f"PROBE s01 cpus=$cpus n=$n cold=$wCold%.2f warm=$wWarm%.2f " +
      f"pairs=${pairs.length} docs_per_sec_cold=${n / wCold}%.0f")

    val detected = pairs.toSet
    val hit = truth.count(detected.contains)
    println(f"PROBE s01 recall vs planted truth: ${hit.toDouble / truth.size}%.4f " +
      s"($hit/${truth.size})")
    val navChain = pairs.count { case (a, b) => a >= clusterEnd && a < navEnd && b < navEnd }
    val navN = navEnd - clusterEnd
    println(s"PROBE giant cluster: $navChain chain edges for $navN identical pages " +
      s"(all-pairs would be ${navN * (navN - 1) / 2})")
    require(navChain < 3 * navN, "spanning-chain guard failed: giant bucket exploded")

    // s10 over the warm pair table: CC + keeper attach across all N docs
    val (s10df, wS10) = timed {
      val df = SparkEntry.queries("s10_dedup_keeper")(spark, dir)
      df.count()
      df
    }
    println(f"PROBE s10 cpus=$cpus n=$n wall=$wS10%.2f (warm pairs -> CC -> keeper attach)")

    // independent keeper recompute: driver-side union-find over the
    // DETECTED pairs, checked distributively against every engine row
    val find = MainUtil.unionFindRoots(pairs)
    val pairedDocs = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val compMin = scala.collection.mutable.Map.empty[Long, Long]
    pairedDocs.foreach { d =>
      val r = find(d)
      compMin(r) = math.min(compMin.getOrElse(r, Long.MaxValue), d)
    }
    val expectedDf = pairedDocs.map(d => (d, compMin(find(d)))).toSeq
      .toDF("doc_id", "exp_keeper")
    val mismatches = s10df.join(expectedDf, Seq("doc_id"))
      .filter(col("keeper_doc_id") =!= col("exp_keeper")).count()
    val totalDropped = s10df.filter(col("is_dropped")).count()
    val expectedDropped = pairedDocs.length - compMin.size
    println(s"PROBE s10 keeper check: $mismatches mismatches vs union-find; " +
      s"dropped=$totalDropped expected=$expectedDropped " +
      s"(components=${compMin.size}, paired docs=${pairedDocs.length})")
    require(mismatches == 0 && totalDropped == expectedDropped,
      "s10 keeper assignments diverge from independent union-find")

    // t17 duplicated-span inventory over the same corpus: the heaviest
    // NEW shuffle shape of round 5 (every doc emits ~n_words rolling
    // hashes; the 50k identical boilerplate pages put 7M span instances
    // on 141 distinct keys — a skew stress for the partial aggregation).
    // Planted expectations: every boilerplate page is 100% duplicated
    // spans; pure-unique docs (no shared prefix) have zero.
    // ONE uncached execution: the planted checks fold into a single
    // aggregation over the query result, so the pipeline runs exactly
    // once (separate per-check counts would re-execute it; a cache()
    // would materialize every output column and triple the wall vs the
    // pipeline itself)
    val (t17checks, wT17) = timed {
      val row = SparkEntry.queries("t17_dup_spans")(spark, dir).agg(
        sum(when(col("doc_id") >= clusterEnd && col("doc_id") < navEnd &&
          col("dup_fraction") =!= 1.0, 1L).otherwise(0L)).as("navBad"),
        sum(when(col("doc_id") >= navEnd && pmod(col("doc_id"), lit(10)) >= 3 &&
          col("n_dup_spans") =!= 0L, 1L).otherwise(0L)).as("uniqueBad")).head()
      (row.getLong(0), row.getLong(1))
    }
    val (navBad, uniqueBad) = t17checks
    println(f"PROBE t17 cpus=$cpus n=$n wall=$wT17%.2f (span inventory)")
    println(s"PROBE t17 planted check: $navBad boilerplate pages not fully duplicated, " +
      s"$uniqueBad unique docs with phantom dup spans")
    require(navBad == 0 && uniqueBad == 0, "t17 planted-duplicate expectations violated")

    // t15 contamination: at this corpus the %7 eval convention makes an
    // ADVERSARIALLY large eval set (~143k docs -> ~20M distinct eval
    // grams broadcast) — production eval sets are orders smaller; green
    // here means the broadcast path survives the unrealistic extreme.
    // Planted: every non-eval boilerplate page shares ALL its grams
    // with the eval boilerplate pages.
    val (t15checks, wT15) = timed {
      val row = SparkEntry.queries("t15_contamination")(spark, dir).agg(
        sum(when(col("doc_id") >= clusterEnd && col("doc_id") < navEnd, 1L)
          .otherwise(0L)).as("navFlagged"),
        // FALSE-POSITIVE side: a pure-unique doc (no shared prefix, not
        // itself eval) shares no 13-gram with anything — flagging one
        // means the join key degenerated; recall alone would miss that
        sum(when(col("doc_id") >= navEnd && pmod(col("doc_id"), lit(10)) >= 3, 1L)
          .otherwise(0L)).as("uniqueFlagged")).head()
      (row.getLong(0), row.getLong(1))
    }
    val (navFlagged, uniqueFlagged) = t15checks
    println(f"PROBE t15 cpus=$cpus n=$n wall=$wT15%.2f (contamination, adversarial eval size)")
    val navNonEval = (clusterEnd until navEnd).count(_ % 7 != 0)
    println(s"PROBE t15 planted check: $navFlagged/$navNonEval boilerplate pages flagged, " +
      s"$uniqueFlagged pure-unique docs falsely flagged")
    require(navFlagged == navNonEval, "t15 missed contaminated boilerplate pages")
    require(uniqueFlagged == 0, "t15 flagged pure-unique docs (degenerate join key?)")

    // t19 span removal: the heaviest removal shape — every boilerplate
    // page's spans are corpus-duplicated, so the removable-occurrence
    // explode runs at full tilt (~50k pages x ~160 spans x 20 positions).
    // Planted: exactly ONE boilerplate page (the canonical min (doc_id,
    // pos) holder) keeps words; the other 49,999 empty out; no-prefix
    // unique docs never lose a word.
    val (t19checks, wT19) = timed {
      val row = SparkEntry.queries("t19_span_removal")(spark, dir).agg(
        sum(when(col("doc_id") >= clusterEnd && col("doc_id") < navEnd &&
          col("n_removed_words") === col("n_words"), 1L).otherwise(0L)).as("navEmptied"),
        sum(when(col("doc_id") >= navEnd && pmod(col("doc_id"), lit(10)) >= 3 &&
          col("n_removed_words") =!= 0L, 1L).otherwise(0L)).as("uniqueTouched"),
        // summing clean_text LENGTHS forces the rebuild projection into
        // the timed plan (count-only checks let Catalyst column-prune
        // the array_except/transform rebuild entirely) AND pins its
        // value: the canonical page alone keeps the template verbatim
        sum(when(col("doc_id") >= clusterEnd && col("doc_id") < navEnd,
          length(col("clean_text"))).otherwise(0L)).as("navCleanLen")).head()
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    val (navEmptied, uniqueTouched, navCleanLen) = t19checks
    println(f"PROBE t19 cpus=$cpus n=$n wall=$wT19%.2f (span removal, rebuild executed)")
    println(s"PROBE t19 planted check: $navEmptied/${navN - 1} boilerplate pages fully " +
      s"emptied, $uniqueTouched unique docs losing words, " +
      s"surviving boilerplate bytes=$navCleanLen (template=${ProbeCorpus.NavTemplate.length})")
    require(navEmptied == navN - 1, "t19 kept words in a non-canonical boilerplate page")
    require(uniqueTouched == 0, "t19 removed words from pure-unique docs")
    require(navCleanLen == ProbeCorpus.NavTemplate.length,
      "surviving boilerplate text is not exactly the canonical page's template")
    spark.stop()
  }
}
