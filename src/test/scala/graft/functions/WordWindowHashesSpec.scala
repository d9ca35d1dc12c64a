package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll

class WordWindowHashesSpec extends SparkSpec with graft.PropChecks {

  import WordWindowHashes.hashes

  test("window count, rolling == direct, and split(\\s+) tokenization parity") {
    // count: max(0, words - n + 1)
    assert(hashes("a b c d e", 2).length == 4)
    assert(hashes("a b c d e", 5).length == 1)
    assert(hashes("a b c d e", 6).isEmpty)
    assert(hashes("", 1).isEmpty)
    assert(hashes("   \t \n ", 1).isEmpty)
    // rolling hash at position j must equal the DIRECT (non-rolling)
    // hash of that window computed standalone — the rolling update is
    // the only nontrivial arithmetic here
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val text = words.mkString(" ")
    for (n <- 1 to 4) {
      val rolled = hashes(text, n)
      val direct = words.sliding(n).map(w => hashes(w.mkString(" "), n)(0)).toArray
      assert(rolled.sameElements(direct), s"rolling != direct at n=$n")
    }
    // equal word sequences hash equal regardless of the whitespace
    // BETWEEN them (split(\s+) semantics)
    assert(hashes("a  b\t\tc", 3).sameElements(hashes("a b c", 3)))
    // BOUNDARY whitespace of every ASCII \s kind is ignored — no empty
    // tokens (split("\\s+", -1) would keep one; the oracles full-trim
    // to match — see the expression scaladoc)
    assert(hashes("\ta b c\n", 3).sameElements(hashes("a b c", 3)))
    assert(hashes("\r\na b c \f", 3).sameElements(hashes("a b c", 3)))
    assert(hashes("a b c\n", 3).length == 1)
    // multi-byte UTF-8 content: byte-level splitting must not split
    // inside a multi-byte sequence
    assert(hashes("\u00e9t\u00e9 caf\u00e9", 2).length == 1)
    assert(hashes("\u00e9t\u00e9 caf\u00e9", 2)
      .sameElements(hashes(" \u00e9t\u00e9\tcaf\u00e9 ", 2)))
    // property: window hash set equals hashes of each joined window —
    // words joined by RANDOM whitespace runs, with random boundary
    // whitespace (the divergence surface vs split-based formulations)
    val wsGen = Gen.listOf(Gen.oneOf(" ", "\t", "\n", "\r", " \t")).map(_.mkString)
    checkProp(forAll(Gen.listOf(Gen.identifier), Gen.choose(1, 4), wsGen, wsGen) { (ws, n, lead, trail) =>
      val t = lead + ws.mkString(" ") + trail
      val rolled = hashes(t, n).toSeq
      val direct =
        if (ws.length < n) Seq.empty
        else ws.sliding(n).map(w => hashes(w.mkString(" "), n)(0)).toSeq
      rolled == direct
    })
  }

  test("t15/t17 per-doc results are identical to the string-join formulation") {
    // the production queries key on rolling hashes; this pins their
    // outputs to the transform+array_join+xxhash64 formulation they
    // replaced (same tokenization, same per-doc counts — the only
    // permitted divergence is a 2^-64 hash collision)
    import graft.SparkEntry
    implicit val sp = spark
    val dir = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def grams(n: Int) = transform(sequence(lit(1), size(col("ws")) - (n - 1)),
      i => array_join(slice(col("ws"), i, lit(n)), " "))

    // t15 reference: string grams over the FULL-trimmed text (plain trim
    // strips only 0x20; a boundary tab/newline would add an empty token
    // the expression never produces)
    val fullTrim = regexp_replace(lower(col("text")), "^\\s+|\\s+$", "")
    val base = docs.withColumn("ws", split(fullTrim, "\\s+"))
      .filter(size(col("ws")) >= 13)
      .select(col("doc_id"), explode(array_distinct(grams(13))).as("gram"))
    val evalG = base.filter(col("doc_id") % 7 === 0).select("gram").distinct()
    val ref15 = base.filter(col("doc_id") % 7 =!= 0)
      .join(broadcast(evalG), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got15 = SparkEntry.queries("t15_contamination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got15 == ref15)

    // t17 reference: string spans (same full-trim contract)
    val spans = docs.withColumn("ws", split(fullTrim, "\\s+"))
      .filter(size(col("ws")) >= 20)
      .select(col("doc_id"), explode(grams(20)).as("span"))
    val dup = spans.groupBy("span").agg(count(lit(1)).as("n_occ")).filter(col("n_occ") >= 2)
    val ref17 = spans.join(dup, Seq("span"), "left")
      .groupBy("doc_id").agg(count(lit(1)).as("n_spans"),
        sum(when(col("n_occ").isNotNull, 1L).otherwise(0L)).as("n_dup_spans"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got17 = SparkEntry.queries("t17_dup_spans")(spark, dir)
      .select("doc_id", "n_spans", "n_dup_spans")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got17 == ref17)
  }

  test("expression is codegen'd (no fallback) and plan stays whole-stage") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(WordWindowHashes.wordWindowHashes(lower(trim(col("text"))), 20).as("hs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [word_window_hashes("), plan)
    df.count()
  }

  test("invalid input type is rejected at analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(WordWindowHashes.wordWindowHashes(col("id"), 2)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("word_window_hashes") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
