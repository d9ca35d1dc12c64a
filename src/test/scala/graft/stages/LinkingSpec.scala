package graft.stages

import graft.SparkSpec
import graft.model.Mention
import org.apache.spark.sql.functions._

/** Entity linking (J6) + canonicalization (J7) over the fixture alias
  * clusters from FIXTURES.md §4.
  */
class LinkingSpec extends SparkSpec {

  test("minhash LSH finds the fixture name variants (O'Dea/ODea, Centre/Center)") {
    import spark.implicits._
    val names = Seq(
      ("author", "Nicholas O'Dea"), ("author", "Nicholas ODea"),
      ("inst", "Center for Quantum Science and Engineering"),
      ("inst", "Centre for Quantum Science and Engineering"),
      ("inst", "Stanford University"), ("inst", "Seoul National University"),
      ("author", "Zheng Yan")).toDF("kind", "name")
    val edges = EntityLink.fuzzyEdges(names, 0.55)
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(edges.contains(("Nicholas O'Dea", "Nicholas ODea")))
    assert(edges.contains(("Center for Quantum Science and Engineering",
      "Centre for Quantum Science and Engineering")))
    // distinct institutions must NOT be linked
    assert(!edges.exists { case (a, b) =>
      Set(a, b) == Set("Stanford University", "Seoul National University")
    })
  }

  test("O'Dea/ODea collapse to identical shingle keys (punctuation folding)") {
    assert(EntityLink.shingleKey("Nicholas O’Dea") == EntityLink.shingleKey("Nicholas ODea"))
    assert(EntityLink.jaccard(
      EntityLink.shingles("Nicholas O’Dea"), EntityLink.shingles("Nicholas ODea")) == 1.0)
  }

  test("connected components: min-id labels, independent of partitioning") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "a"))
      .toDF("src", "dst")
    val cc = Canonicalize.connectedComponents(edges)
      .as[(String, String)].collect().toMap
    // {a,b,c,p,q,r} one component (r-a bridge), {x,y} another
    assert(Seq("a", "b", "c", "p", "q", "r").forall(cc(_) == "a"))
    assert(cc("x") == "x" && cc("y") == "x")

    val cc1 = Canonicalize.connectedComponents(edges.repartition(7))
      .as[(String, String)].collect().toMap
    assert(cc1 == cc) // partitioning-invariant (SURVEY.md §5.2.4)

    // the distributed label-propagation path must agree with the
    // driver union-find fast path (smallCutoff = 0 forces it)
    val ccDist = Canonicalize.connectedComponents(edges, smallCutoff = 0)
      .as[(String, String)].collect().toMap
    assert(ccDist == cc)
  }

  test("identical-key groups fold linearly; oversized buckets are purged") {
    import spark.implicits._
    // 1500 punctuation variants of one name: identical shingle keys.
    // Pairwise LSH would be ~1.1M candidates; the star fold emits 1499
    // edges and only ONE representative enters LSH.
    val variants = (0 until 1500).map(i => ("author", "John Smith" + ("." * (i + 1))))
    // plus 1200 same-prefix boilerplate names that all share the same
    // dominant minhash slots -> one mega bucket, purged by maxBucket
    val boiler = (0 until 1200).map(i => ("author", s"the common prefix entry $i"))
    val names = (variants ++ boiler).toDF("kind", "name")
    val edges = EntityLink.fuzzyEdges(names, tau = 0.55, maxBucket = 500)
      .collect()
    // every variant links to the group minimum ("John Smith." — shortest
    // sorts first), so CC resolves the whole group through 1499 edges
    val star = edges.filter(r =>
      r.getString(1) == "John Smith." && r.getString(2).startsWith("John Smith."))
    assert(star.length == 1499, s"star edges: ${star.length}")
    // the boilerplate names are genuinely mutually similar (long shared
    // prefix), so above-tau pairs among them are CORRECT output — the
    // guards bound candidate generation (purge warning observed in the
    // log), not the verified-edge count; fewer than all-pairs shows the
    // purge cut candidates while the star fold covered its group exactly
    val allPairsBound = 1499 + 1200 * 1199 / 2
    assert(edges.length < allPairsBound, s"edges: ${edges.length}")
  }

  test("distributed CC converges on a high-diameter chain within maxIter") {
    import spark.implicits._
    // a 200-hop rename chain: plain min-label propagation moves the min
    // one hop per round and would NOT converge in 20 iterations — the
    // pointer-jump step (label <- label(label)) must carry it
    val chain = (0 until 200)
      .map(i => (f"v$i%04d", f"v${i + 1}%04d")).toDF("src", "dst")
    val cc = Canonicalize.connectedComponents(chain, maxIter = 20, smallCutoff = 0)
      .as[(String, String)].collect().toMap
    assert(cc.size == 201)
    assert(cc.values.toSet == Set("v0000"), s"labels: ${cc.values.toSet}")
  }

  test("dictionary linking folds Westlake variants via canonical alias") {
    import spark.implicits._
    val mentions = Seq(
      Mention("d1", "inst", "Westlake University"),
      Mention("d2", "inst", "Westlake Institute for Advanced Study"),
      Mention("d3", "venue", "Phys. Rev. Research")).toDS()
    val ents = Pipeline.entities(spark, mentions)
      .select("name", "entityId").as[(String, String)].collect().toMap
    assert(ents("Westlake University") == ents("Westlake Institute for Advanced Study"))
    assert(ents("Phys. Rev. Research") == "Phys. Rev. Research" ||
      ents("Phys. Rev. Research") == "Physical Review Research")
  }

  test("pipeline canonical map links the full fixture corpus deterministically") {
    import spark.implicits._
    val files = spark.createDataset(graft.fixtures.FixtureCorpus.baseRows)(
      org.apache.spark.sql.Encoders.product[graft.model.SourceFile])
    val records = MentionDetect.records(files)
    val cmap1 = Pipeline.canonicalMap(spark, Pipeline.mentionsOf(records))
      .orderBy("kind", "name").collect().toSeq
    val cmap2 = Pipeline.canonicalMap(spark, Pipeline.mentionsOf(records))
      .orderBy("kind", "name").collect().toSeq
    assert(cmap1 == cmap2 && cmap1.nonEmpty)
    // Westlake University + Westlake Institute for Advanced Study appear
    // in the pyzr-jmvw fixture and must share a canonical id.
    val m = cmap1.map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(m.contains(("inst", "Westlake University")))
    assert(m.contains(("inst", "Westlake Institute for Advanced Study")))
    assert(m(("inst", "Westlake University")) ==
      m(("inst", "Westlake Institute for Advanced Study")))
  }
}
