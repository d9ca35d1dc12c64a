package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** s12 incremental near-dup: the delta batch (id tail) deduped against
  * the persisted old-corpus band index without re-shingling the old
  * corpus. Ground truths are all independent of the incremental code
  * path: the full s01 engine, exact all-pairs Jaccard, and driver-side
  * union-find connectivity.
  */
class IncrementalNeardupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def s12Pairs(dir: String): Set[(Long, Long, Double)] =
    SparkEntry.queries("s12_incremental_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def s01Pairs(dir: String): Set[(Long, Long, Double)] =
    SparkEntry.queries("s01_minhash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("s12 equals s01 restricted to delta-touching pairs on the sf corpus") {
    val cutoff = SimilarityQueries.incrementalCutoff(spark, sf)
    val expected = s01Pairs(sf).filter(_._2 >= cutoff)
    val got = s12Pairs(sf)
    assert(got == expected,
      s"cutoff=$cutoff onlyS12=${got -- expected} onlyS01=${expected -- got}")
  }

  test("s12 on a planted corpus: cross pairs found, old-old pairs excluded, exact vs brute force") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_plant").toString
    val rnd = new scala.util.Random(42)
    def words(n: Int, seed: Int): IndexedSeq[String] = {
      val r = new scala.util.Random(seed)
      IndexedSeq.fill(n)("w" + r.nextInt(50000))
    }
    def mutate(ws: IndexedSeq[String], k: Int, tag: String): String =
      ws.zipWithIndex.map { case (w, i) => if (i < k) s"$tag$i" else w }.mkString(" ")
    // ids 0..39 -> cutoff = 39/10*9 = 27; delta = 28..39
    val base = (0 until 8).map(i => words(60, 1000 + i))
    val docs = Seq.newBuilder[(Long, String)]
    // old docs 0..27: bases 0..7 at ids 0..7, a near-dup OLD twin of base0
    // at id 8 (old-old pair (0,8) must NOT appear in s12), unique filler
    (0 until 8).foreach(i => docs += ((i.toLong, base(i).mkString(" "))))
    docs += ((8L, mutate(base(0), 2, "oo")))
    (9 until 28).foreach(i => docs += ((i.toLong, words(60, 5000 + i).mkString(" "))))
    // delta docs 28..39: near-dup copies of old bases 1..4 (cross pairs),
    // two mutual near-dups of base 5 (new-new via delta self-run), filler
    docs += ((28L, mutate(base(1), 1, "d")))
    docs += ((29L, mutate(base(2), 2, "d")))
    docs += ((30L, mutate(base(3), 3, "d")))
    docs += ((31L, mutate(base(4), 1, "d")))
    docs += ((32L, mutate(base(5), 1, "x")))
    docs += ((33L, mutate(base(5), 2, "y")))
    (34 until 40).foreach(i => docs += ((i.toLong, words(60, 9000 + i).mkString(" "))))
    val all = docs.result()
    all.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cutoff = SimilarityQueries.incrementalCutoff(spark, dir)
    assert(cutoff == 27, s"cutoff=$cutoff")

    // exact brute-force truth over ALL pairs, restricted to b >= cutoff
    val truth = (for {
      i <- all.indices; j <- (i + 1) until all.length
      a = all(i); b = all(j)
      jac = graft.stages.EntityLink.jaccard(
        SimilarityQueries.wordShingles(a._2), SimilarityQueries.wordShingles(b._2))
      if jac >= 0.8
    } yield (a._1, b._1, jac)).toSet
    val truthDelta = truth.filter(_._2 >= cutoff)
    assert(truth.exists(p => p._1 == 0L && p._2 == 8L),
      "planted old-old pair missing from brute-force truth (generator broken)")
    assert(truthDelta.size >= 6, s"planted delta truth too small: $truthDelta")

    val got = s12Pairs(dir)
    assert(got == truthDelta,
      s"only-s12=${got -- truthDelta} missed=${truthDelta -- got}")
    // and the full engine agrees on the same restriction
    assert(s01Pairs(dir).filter(_._2 >= cutoff) == got)
  }

  test("s12 giant OLD bucket: delta members link through sig-ordered representatives, no full-bucket join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_giant").toString
    val template = (1 to 40).map(i => s"nav$i home search login").mkString(" ")
    def filler(seed: Int): String = {
      val r = new scala.util.Random(seed)
      IndexedSeq.fill(60)("f" + r.nextInt(50000)).mkString(" ")
    }
    // ids 0..665 -> cutoff = 598.5 -> 665/10*9 = 594
    // old: ids 0..549 IDENTICAL template (giant bucket, > 256 cap),
    //      ids 550..593 unique filler
    // delta: ids 594..599 the SAME template (must link into the old
    //        cluster through representatives), ids 600..665 unique filler
    val rows =
      (0 until 550).map(i => (i.toLong, template)) ++
      (550 until 594).map(i => (i.toLong, filler(i))) ++
      (594 until 600).map(i => (i.toLong, template)) ++
      (600 until 666).map(i => (i.toLong, filler(10000 + i)))
    rows.toDF("doc_id", "text").coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cutoff = SimilarityQueries.incrementalCutoff(spark, dir)
    assert(cutoff == 594, s"cutoff=$cutoff")

    val got = s12Pairs(dir)
    // every delta template page verifies against >= 1 OLD doc
    for (d <- 594L until 600L) {
      assert(got.exists(p => p._2 == d && p._1 < cutoff),
        s"delta template page $d has no verified link into the old cluster")
    }
    // representative bound: cross pairs must come from <= Nd12Reps reps
    // per band, NOT the full 550-member bucket (6 x 550 = 3300 pairs if
    // the guard failed; 6 x 8 reps x 16 bands = 768 is the loose cap)
    val cross = got.filter(p => p._1 < cutoff && p._2 >= cutoff)
    assert(cross.size <= 768, s"cross pair count ${cross.size} suggests full-bucket join")
    // connectivity: old cluster + 6 delta pages form ONE component over
    // (persisted old pairs) U (s12 pairs) — the s10 composition input
    val oldPairs = s01Pairs(dir) // full engine as the old-pairs stand-in
    val find = MainUtil.unionFindRoots(
      (oldPairs.filter(_._2 < cutoff) ++ got).map(p => (p._1, p._2)))
    val roots = ((0L until 550L) ++ (594L until 600L)).map(find).toSet
    assert(roots.size == 1, s"template cluster fragmented: ${roots.size} components")
  }

  test("s12 giant DELTA bucket: id-spaced delta reps probe; self-run chains connect the rest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_dgiant").toString
    val template = (1 to 40).map(i => s"promo$i click buy now").mkString(" ")
    def filler(seed: Int): String = {
      val r = new scala.util.Random(seed)
      IndexedSeq.fill(60)("g" + r.nextInt(50000)).mkString(" ")
    }
    // ids 0..3999 -> cutoff = 3999/10*9 = 3591
    // old: id 0 = the template's OLD twin, 1..3590 unique filler
    // delta: ids 3591..3890 IDENTICAL template (300 > cap), rest filler
    val rows =
      Seq((0L, template)) ++
      (1 until 3591).map(i => (i.toLong, filler(i))) ++
      (3591 until 3891).map(i => (i.toLong, template)) ++
      (3891 until 4000).map(i => (i.toLong, filler(20000 + i)))
    rows.toDF("doc_id", "text").coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cutoff = SimilarityQueries.incrementalCutoff(spark, dir)
    assert(cutoff == 3591, s"cutoff=$cutoff")

    val got = s12Pairs(dir)
    // >= 1 delta rep verified against the old twin
    assert(got.exists(p => p._1 == 0L && p._2 >= cutoff),
      "no delta representative linked to the old twin")
    // the whole delta cluster + old twin is ONE component over s12 pairs
    // alone (cross rep links + delta self-run chain edges)
    val find = MainUtil.unionFindRoots(got.map(p => (p._1, p._2)))
    val roots = (Seq(0L) ++ (3591L until 3891L)).map(find).toSet
    assert(roots.size == 1, s"delta template cluster fragmented: ${roots.size} components")
  }

  test("s12 stays correct when a delta doc is rewritten (delta is always fresh)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_inval").toString
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    def writeDocs(tailText: String): Unit =
      // ids 0..19 -> cutoff = 9 (19/10*9); id 19 is delta, id 5 is old
      (Seq((5L, filler)) ++ (0L until 20L).filter(_ != 5).map(i =>
        (i, if (i == 19L) tailText
            else (1 to 40).map(j => s"u${i}_$j").mkString(" "))))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs(filler) // delta doc 19 duplicates old doc 5
    assert(s12Pairs(dir).map(p => (p._1, p._2)) == Set((5L, 19L)))
    // rewrite doc 19 with unrelated text: the delta side is re-shingled
    // on every run (only the OLD slice is indexed), so the result moves
    // immediately — no index rebuild needed for a delta-only change
    writeDocs((1 to 40).map(i => s"z$i").mkString(" "))
    assert(s12Pairs(dir).isEmpty, "stale delta result served after rewrite")
    assert(s12Pairs(dir).isEmpty)
  }

  test("s12 old-bands index survives a tail append; old-slice rewrite invalidates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_append").toString
    def uniq(i: Long, tag: String): String =
      (1 to 40).map(j => s"$tag${i}_$j").mkString(" ")
    val dup = (1 to 40).map(i => s"d$i").mkString(" ")
    // production interface: the ingest pins its own batch boundary, so
    // the cutoff does NOT move when a batch lands
    val cutoff = 30L
    (Seq((5L, dup)) ++ (0L until 35L).filter(_ != 5).map(i => (i, uniq(i, "a"))))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def pairsAt(): Set[(Long, Long)] =
      SimilarityQueries.incrementalNeardupAt(spark, dir, cutoff)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsAt().isEmpty) // builds the old-bands index
    assert(SimilarityQueries.nd12IndexIsWarm(spark, dir, cutoff))
    // APPEND an ingest batch (ids 35..39; 37 duplicates old doc 5): the
    // round-5 review scenario — the index keyed on the whole-table
    // snapshot made this exact sequence rebuild O(N) every batch
    (Seq((37L, dup)) ++ Seq(35L, 36L, 38L, 39L).map(i => (i, uniq(i, "b"))))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(s"$dir/documents.parquet")
    assert(SimilarityQueries.nd12IndexIsWarm(spark, dir, cutoff),
      "tail append invalidated the old-bands index — warm O(delta) path unreachable")
    assert(pairsAt() == Set((5L, 37L)),
      "appended batch not deduped against the warm old-bands index")
    // rewriting a doc INSIDE the old slice must move the slice snapshot
    (Seq((5L, uniq(5, "z"))) ++ (0L until 40L).filter(_ != 5).map(i =>
      (i, if (i == 37L) dup else if (i >= 35L) uniq(i, "b") else uniq(i, "a"))))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(!SimilarityQueries.nd12IndexIsWarm(spark, dir, cutoff),
      "old-slice rewrite left a stale index marked warm")
    assert(pairsAt().isEmpty) // doc 5's twin text is gone
  }

  test("s12 index invalidates on an id/count-preserving rewrite of an old doc past any sample window") {
    import spark.implicits._
    // the round-5 review scenario: an in-place content correction of an
    // old doc (here id 280, beyond a first-256 content sample) that
    // preserves count and the id set. The file-level slice guard must
    // invalidate; a stale index would silently MISS the new pair (the
    // candidate never forms, and verification can only drop false
    // positives, never restore missed candidates).
    val dir = java.nio.file.Files.createTempDirectory("graft_s12_oldrw").toString
    def uniq(i: Long, tag: String): String =
      (1 to 40).map(j => s"$tag${i}_$j").mkString(" ")
    val cutoff = 300L
    def writeAll(doc280: String): Unit =
      (0L until 310L).map(i => (i, if (i == 280L) doc280 else uniq(i, "a")))
        .toDF("doc_id", "text").coalesce(2)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def pairsAt(): Set[(Long, Long)] =
      SimilarityQueries.incrementalNeardupAt(spark, dir, cutoff)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    writeAll(uniq(280L, "v1"))
    assert(pairsAt().isEmpty) // builds the index; nothing matches yet
    assert(SimilarityQueries.nd12IndexIsWarm(spark, dir, cutoff))
    // rewrite doc 280 to duplicate delta doc 305's text — count and id
    // set unchanged, content changed outside any sampled prefix
    writeAll(uniq(305L, "a"))
    assert(!SimilarityQueries.nd12IndexIsWarm(spark, dir, cutoff),
      "old-doc rewrite past the sample window left a stale index marked warm")
    assert(pairsAt() == Set((280L, 305L)),
      "rewritten old doc's new near-dup went undetected (stale band rows)")
  }

  test("s12 plan shape: delta probe broadcasts; persisted old bands never re-shuffled or re-shingled") {
    // AQE wraps the tree in AdaptiveSparkPlanExec (opaque to collect),
    // so build this one plan with AQE off to walk the physical tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("s12_incremental_neardup")(spark, sf)
      val plan = df.queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("BroadcastHashJoin"), planStr)
      assert(!planStr.contains("CartesianProduct"), planStr)
      assert(planStr.contains("nd12_bands"),
        s"old bands not read from the persisted index:\n$planStr")
      // the old band rows must STREAM through the broadcast join in
      // place: any shuffle Exchange that reaches the nd12_bands scan
      // without passing through a BroadcastHashJoin means the O(N) old
      // band rows were re-partitioned before the join (the exact cost
      // the broadcast exists to avoid). Shuffles ABOVE the join
      // (distinct/orderBy over verified candidates) are legitimate —
      // their subtree contains the scan but through the BHJ.
      val shuffles = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      val bad = shuffles.filter { e =>
        e.toString.contains("nd12_bands") &&
          e.collect {
            case j if j.nodeName.contains("BroadcastHashJoin") &&
              j.toString.contains("nd12_bands") => j
          }.isEmpty
      }
      assert(bad.isEmpty, s"old bands re-shuffled before the join:\n${bad.headOption}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
