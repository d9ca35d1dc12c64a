package graft

import org.apache.spark.sql.functions._

/** t19 duplicated-span removal: ground truth is an independent plain-
  * Scala recompute of the semantics (canonical-first-occurrence keep,
  * union coverage, rebuild), plus a cross-op consistency gate against
  * t17's inventory on the sf corpus.
  */
class SpanRemovalSpec extends SparkSpec {

  /** Independent recompute: same contract, no Spark, no rolling hash —
    * spans are grouped by their literal text.
    */
  private def expected(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    // RE2 \s class (no vertical tab) — the tokenization WordWindowHashes
    // and the engine's rebuild share; Java's \\s would disagree on VT
    val d = "[ \\t\\n\\f\\r]"
    val ws = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll(s"^$d+|$d+$$", "").split(s"$d+").toIndexedSeq
    }.toMap
    val occs = for {
      (id, w) <- ws.toSeq; if w.length >= 20
      p <- 0 to (w.length - 20)
    } yield (w.slice(p, p + 20).mkString(" "), id, p)
    val removed = occs.groupBy(_._1).valuesIterator
      .filter(_.size >= 2)
      .flatMap(_.sortBy(o => (o._2, o._3)).drop(1)) // keep the canonical first
      .toSeq
    val rmByDoc = removed.groupBy(_._2).map { case (id, os) =>
      id -> os.flatMap(o => o._3 until (o._3 + 20)).toSet
    }
    ws.map { case (id, w) =>
      val rm = rmByDoc.getOrElse(id, Set.empty)
      val kept = w.indices.filterNot(rm).map(w)
      id -> (w.length.toLong, rm.size.toLong, kept.mkString(" "))
    }
  }

  test("t19 matches an independent recompute on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_t19").toString
    val block = (1 to 25).map(i => s"b$i").mkString(" ")  // 25 shared words -> 6 overlapping spans
    val rep20 = (1 to 20).map(i => s"r$i").mkString(" ")  // exact 20-word block
    def uniq(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => "u" + r.nextInt(50000)).mkString(" ")
    }
    val docs = Seq(
      // cross-doc: doc 1 is canonical (earlier), doc 2 loses the block
      (1L, block + " " + uniq(1, 5)),
      (2L, uniq(2, 4) + " " + block),
      // within-doc repeat: the second copy of rep20 is removed
      (3L, rep20 + " " + uniq(3, 5) + " " + rep20),
      // untouched: under 20 words / unique content / empty-ish
      (4L, uniq(4, 19)),
      (5L, uniq(5, 40)),
      (6L, "  Mixed   WHITESPACE\ttext under twenty  "),
      // fully emptied: an exact copy of doc 1 — every word covered, so
      // clean_text must be the EMPTY STRING on both engine and oracle
      // (the DuckDB array_to_string([])-is-NULL dialect trap)
      (7L, block + " " + uniq(1, 5)),
      // vertical tab: RE2 \s (the hash expression's splitter) treats
      // "x<VT>y" as ONE word where Java's \s sees two — a rebuild
      // split on Java \s would misalign every removal index after it
      (8L, "x\u000By " + rep20))
    docs.toDF("doc_id", "text").withColumn("lang", lit("en")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("t19_span_removal")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val exp = expected(docs)
    assert(got == exp, s"diff=${got.toSet -- exp.toSet} missing=${exp.toSet -- got.toSet}")
    // the planted intentions actually happened
    assert(got(2L)._2 == 25L, "doc 2's shared block not removed")
    assert(got(1L)._2 == 0L, "canonical doc 1 lost words")
    assert(got(3L)._2 == 20L, "within-doc repeat not removed")
    assert(got(3L)._3.startsWith("r1 ") && got(3L)._3.endsWith(" r20") == false,
      "doc 3 should keep the FIRST copy and the filler only")
    assert(got(7L) == ((30L, 30L, "")), s"exact-copy doc not fully emptied: ${got(7L)}")
    assert(got(8L) == ((21L, 20L, "x\u000By")),
      s"VT word misaligned the removal indices: ${got(8L)}")
  }

  test("t19 is consistent with t17's inventory on the sf corpus") {
    val sf = "/root/testdata/sf0.001"
    val t19 = SparkEntry.queries("t19_span_removal")(spark, sf)
      .select("doc_id", "n_removed_words")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t17 = SparkEntry.queries("t17_dup_spans")(spark, sf)
      .select("doc_id", "n_dup_spans")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a doc removes words only if it HAS duplicated spans; a doc whose
    // every span is unique keeps every word (the converse is not an
    // invariant: a doc holding only CANONICAL occurrences has dup spans
    // but removes nothing)
    for ((id, rm) <- t19; if rm > 0)
      assert(t17.getOrElse(id, 0L) > 0L, s"doc $id removed words without dup spans")
    for ((id, ds) <- t17; if ds == 0L)
      assert(t19(id) == 0L, s"doc $id has no dup spans but removed words")
  }
}
