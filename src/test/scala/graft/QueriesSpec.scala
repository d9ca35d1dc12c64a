package graft

import org.apache.spark.sql.functions._

/** Smoke + spot checks for the SparkEntry surface on sf0.001, plus
  * plan-shape assertions (pushdown/broadcast — the 100 TB story).
  */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship pipeline) returns triples with canonical author ids") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("docId", "subj", "pred", "obj", "canonical_author",
      "keeper_doc_id", "n_pages", "n_dropped_pages"))
    // the entity table is consumed: every hasAuthor triple resolves
    val authors = df.filter(col("pred") === "hasAuthor")
    assert(authors.count() > 0)
    assert(authors.filter(col("canonical_author").isNull).count() == 0)
    // the dedup last mile is consumed: the 50-page corpus replicates 7
    // base pages, so every paper's page cluster keeps exactly one page
    // and drops the rest
    val dd = df.select("docId", "keeper_doc_id", "n_pages", "n_dropped_pages")
      .distinct().collect()
    assert(dd.nonEmpty)
    dd.foreach { r =>
      assert(!r.isNullAt(1), s"paper ${r.getString(0)} has no keeper page")
      assert(r.getLong(2) > 1, s"paper ${r.getString(0)} not replicated")
      assert(r.getLong(3) == r.getLong(2) - 1,
        s"paper ${r.getString(0)}: expected all replicas but one dropped")
    }
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows: $empty")
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q06 pushes filters and prunes columns at the parquet scan") {
    val plan = SparkEntry.queries("q06_filter_pushdown_agg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate"), plan)
    // column pruning: ReadSchema must not include unused wide columns
    assert(!plan.contains("l_comment") && !plan.contains("l_returnflag"), plan)
  }

  test("q02 star join broadcasts the dimensions (no fact shuffle)") {
    val plan = SparkEntry.queries("q02_revenue_by_nation")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("t15 contamination broadcasts the eval gram set; t17 joins on hashes") {
    val p15 = SparkEntry.queries("t15_contamination")(spark, sf)
      .queryExecution.executedPlan.toString
    // the eval side must broadcast (it is tiny next to the corpus); the
    // corpus side must never shuffle gram strings for this join
    assert(p15.contains("BroadcastHashJoin"), p15)
    assert(!p15.contains("CartesianProduct"), p15)
    val p17 = SparkEntry.queries("t17_dup_spans")(spark, sf)
      .queryExecution.executedPlan.toString
    // span occurrence counting groups/joins on native rolling-hash
    // keys, so the shuffles carry 8-byte longs, not 20-word strings
    assert(p17.contains("word_window_hashes"), p17)
    assert(!p17.contains("CartesianProduct"), p17)
  }

  test("s01 minhash LSH self-join is an equi join on band keys, not a cartesian") {
    // assert on the BUILD-side plan: the registered query reads the
    // persisted pair table back, which would hide the join shape
    val plan = graft.queries.SimilarityQueries.computeNeardupPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("s01 giant-bucket guard: boilerplate cluster yields O(n) edges, keeper intact") {
    import spark.implicits._
    // 600 IDENTICAL template pages (one giant LSH bucket in every band,
    // far over the 256 cap) + one normal near-dup pair + unique filler.
    // Without the spanning-chain guard the self-join would plan
    // C(600,2) = 179,700 candidates per band for the template cluster.
    val template = (1 to 40).map(i => s"nav$i").mkString(" ")
    val near = (1 to 40).map(i => s"body$i").mkString(" ")
    val docsDf = (
      (1000L until 1600L).map(id => (id, template)) ++
        Seq((1L, near), (2L, near)) ++
        (10L until 30L).map(id => (id, (1 to 40).map(i => s"u${id}_$i").mkString(" ")))
      ).toDF("doc_id", "text")
    val pairs = graft.queries.SimilarityQueries.neardupPairsOf(docsDf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the normal-bucket path still enumerates its pair
    assert(pairs.contains((1L, 2L)))
    // giant cluster: double chain = at most 2 edges per member, not n^2
    val giant = pairs.filter { case (a, b) => a >= 1000 && b >= 1000 }
    assert(giant.length >= 599, s"chain too sparse to span: ${giant.length}")
    assert(giant.length <= 1200, s"giant bucket not chained: ${giant.length} edges")
    // and the keeper stage still collapses the cluster to one keeper
    val keep = graft.queries.SimilarityQueries.keeperAssignments(
      graft.queries.SimilarityQueries.neardupPairsOf(docsDf), docsDf.select("doc_id"))
      .filter(col("doc_id") >= 1000)
      .select("keeper_doc_id", "is_dropped").collect()
    assert(keep.length == 600)
    assert(keep.forall(_.getLong(0) == 1000L), "cluster keeper must be the min id")
    assert(keep.count(!_.getBoolean(1)) == 1, "exactly one page kept")
  }

  test("t18 packing engine: rollover, overflow, and reset-after-overflow (small budget)") {
    import spark.implicits._
    // the sf corpora never fill a 2048-token bin (max group ~1.1k
    // tokens), so the pin alone cannot gate the interesting branches —
    // drive them with budget 10 and HAND-COMPUTED expectations.
    // en/shard0 group in doc_id order: 4 tok (bin0 fill4), 5 tok (bin0
    // fill9), 2 tok (rollover -> bin1), 12 tok (rollover -> bin2,
    // overflow alone, next bin), 2 tok (bin3). fr/shard1: own bin0.
    val d = Seq(
      (0L, "en", "a b c d"),
      (16L, "en", "e f g h i"),
      (32L, "en", "j k"),
      (48L, "en", (1 to 12).map("w" + _).mkString(" ")),
      (64L, "en", "x y"),
      (17L, "fr", "a b")
    ).toDF("doc_id", "lang", "text")
    val got = graft.queries.TextQueries.seqPackOf(d, budget = 10)
      .select("doc_id", "bin_seq", "is_overflow").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(got == Set(
      (0L, 0, false), (16L, 0, false), (32L, 1, false),
      (48L, 2, true), (64L, 3, false), (17L, 0, false)), got)
  }

  test("t18 sequence packing matches an independent fold and respects the budget") {
    // independent ground truth: own tokenizer call path + own packing
    // fold over the raw parquet, grouped/sharded the same way
    val budget = 2048
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        // Spark's trim strips ONLY 0x20 spaces (Java String.trim also
        // strips control chars) and Spark split keeps empty tokens
        val stripped = r.getString(2).dropWhile(_ == ' ')
          .reverse.dropWhile(_ == ' ').reverse
        (r.getLong(0), r.getString(1), stripped.split("\\s+", -1).length)
      }
    val expected = rows.groupBy { case (id, lang, _) => (lang, (((id % 16) + 16) % 16).toInt) }
      .toSeq.flatMap { case ((lang, shard), members) =>
        var bin = 0; var fill = 0
        members.sortBy(_._1).toSeq.map { case (id, _, tok) =>
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = 0 }
          val row = (id, lang, shard, bin, tok, tok > budget)
          fill += tok
          if (tok > budget) { bin += 1; fill = 0 }
          row
        }
      }.toSet
    val got = SparkEntry.queries("t18_seq_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getBoolean(5))).toSet
    assert(got == expected)
    // every non-overflow bin fits the budget
    val binTotals = got.toSeq.filterNot(_._6)
      .groupBy(r => (r._2, r._3, r._4)).map(_._2.map(_._5).sum)
    assert(binTotals.forall(_ <= budget), s"bin over budget: ${binTotals.max}")
  }

  test("s11 cluster stats match an independent brute-force recompute") {
    // independent ground truth: own L2 argmin (not nearestCids), own
    // dot-product cosine (not the CosineSimilarity expression), own
    // fixed-point aggregation — only the persisted centroids are shared
    // (they ARE the quantizer under test, already spec'd via s07)
    val (_, centroids) = graft.queries.SimilarityQueries.ivfIndex(spark, sf)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def l2(v: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      acc
    }
    // same op ORDER as CosineSimilarity.compute (sqrt(na)*sqrt(nb), not
    // sqrt(na*nb)) — the result sits under a floor(x*1e6) so a last-ulp
    // difference from reassociated math could flip a boundary; zero-norm
    // handled explicitly (the query coalesces NULL cosine to 0)
    def cos(v: Array[Float], c: Array[Double]): Double = {
      var dot = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
      while (i < c.length) { dot += v(i) * c(i); nv += v(i) * v(i); nc += c(i) * c(i); i += 1 }
      val denom = math.sqrt(nv) * math.sqrt(nc)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val byCid = vecs.groupBy { case (_, v) =>
      centroids.indices.minBy(i => l2(v, centroids(i)))
    }
    val total = vecs.length.toDouble
    def r(x: Double, s0: Int): Double = math.floor(x * s0 + 0.5) / s0
    val expected = byCid.map { case (cid, members) =>
      val cossum = members.map { case (_, v) => math.floor(cos(v, centroids(cid)) * 1e6).toLong }.sum
      // share uses the QUERY's exact expression shape (n*10000.0/total,
      // not (n/total)*10000): around the discontinuous floor the two
      // differ in the last ulp and a half-integer boundary would flip
      (cid, members.length.toLong, math.floor(members.length * 10000.0 / total + 0.5) / 10000,
        math.floor(cossum.toDouble / members.length / 100.0 + 0.5) / 10000)
    }.toSet
    val got = SparkEntry.queries("s11_cluster_stats")(spark, sf)
      .collect().map(r0 => (r0.getInt(0), r0.getLong(1), r0.getDouble(2), r0.getDouble(3))).toSet
    assert(got == expected, s"\ngot      $got\nexpected $expected")
  }

  test("s01 giant-bucket chains order by signature: interleaved clusters stay connected") {
    import spark.implicits._
    // A giant bucket is not always one pure dup cluster: a band-level
    // collision can interleave SEVERAL true clusters in one bucket. A
    // doc_id-ordered chain links similarity-uncorrelated neighbors
    // (cross-cluster edges fail Jaccard verification -> clusters
    // fragment); the sig-ordered chain puts each cluster contiguous.
    // Injected sort keys (a real false-positive bucket is not
    // deterministically constructible from text): 39 docs in ONE
    // (band, bkey) bucket, cluster = id % 3, ids interleaved so id
    // order alternates clusters and even the +-2 skip edge never links
    // two same-cluster members.
    def key(cluster: Int) = Array.fill(8)(cluster.toLong)
    val rows = (0L until 39L).map(id =>
      (id, 0, 7L, graft.queries.SimilarityQueries.packSig(key((id % 3).toInt))))
    val edges = graft.queries.SimilarityQueries.giantBucketChains(
        rows.toDF("doc_id", "band", "bkey", "__sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.forall { case (a, b) => a < b }, "pairs must be normalized a < b")
    // verification would drop cross-cluster edges: the SAME-cluster
    // edges alone must still span each cluster (union-find)
    for (c <- 0 until 3) {
      val members = (0L until 39L).filter(_ % 3 == c)
      val parent = scala.collection.mutable.Map(members.map(m => m -> m): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.filter { case (a, b) => a % 3 == c && b % 3 == c }
        .foreach { case (a, b) => parent(find(a)) = find(b) }
      assert(members.map(find).distinct.size == 1,
        s"cluster $c fragments under chain ordering: ${members.map(find).distinct}")
    }
  }

  test("file-status fingerprint ignores hidden dirs but sees new part files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    implicit val s = spark
    val fp0 = graft.queries.SimilarityQueries.fileStatusFp(dir, "documents.parquet")
    // _temporary residue from a dead/concurrent writer must NOT move the
    // fingerprint: listFiles(_, true) recurses into it and its part
    // files have ordinary names, so a leaf-only hidden check would churn
    // the snapshot (rebuild on residue, rebuild again on cleanup)
    val tmp = java.nio.file.Paths.get(dir, "documents.parquet", "_temporary", "0")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-00000"), Array[Byte](1, 2, 3))
    assert(graft.queries.SimilarityQueries.fileStatusFp(dir, "documents.parquet") == fp0,
      "_temporary residue moved the fingerprint")
    // a REAL new part file must move it
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "documents.parquet", "part-extra.parquet"),
      Array[Byte](1, 2, 3))
    assert(graft.queries.SimilarityQueries.fileStatusFp(dir, "documents.parquet") != fp0,
      "new data file did not move the fingerprint")
  }

  test("s01 persisted pair table invalidates when the documents table changes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_s01_inval").toString
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    def writeDocs(text1: String): Unit =
      Seq((0L, filler), (1L, text1)).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def pairs(): Seq[(Long, Long)] =
      SparkEntry.queries("s01_minhash_neardup")(spark, dir)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // identical texts -> Jaccard 1.0 -> the pair commits to the stage
    writeDocs(filler)
    assert(pairs() == Seq((0L, 1L)))
    // REWRITE doc 1 with unrelated text: the docs snapshot (content
    // hash + recursive file listing) must move, invalidating the
    // persisted pairs — a stale read-back would still report (0,1)
    writeDocs((1 to 40).map(i => s"x$i").mkString(" "))
    assert(pairs().isEmpty, "stale persisted pair table served after documents changed")
    // and an unchanged table reuses the committed stage (same result)
    assert(pairs().isEmpty)
  }

  test("ANN probe/seed predicates push to the scan — no TypedFilter anywhere") {
    // round-4 VERDICT #1: `.as[...].filter(_._1 < k)` is an opaque
    // TypedFilter — Catalyst can't push it into the parquet scan nor
    // prune the embedding column, so every probe paid a full O(N·dim)
    // deserializing pass of the corpus on paths advertised probe-only
    for (name <- Seq("s03_ann_cosine_topk", "s04_ann_lsh_topk",
        "s07_ann_ivf_topk", "s09_ann_sq8_rerank")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val typed = df.queryExecution.analyzed.collect {
        case t: org.apache.spark.sql.catalyst.plans.logical.TypedFilter => t
      }
      assert(typed.isEmpty, s"$name plans ${typed.size} TypedFilter(s)")
    }
    // in-plan probe sides (s04, s09) must show the pushed vec_id bound
    for (name <- Seq("s04_ann_lsh_topk", "s09_ann_sq8_rerank")) {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*LessThan\\(vec_id,10\\)".r
        .findFirstIn(plan).isDefined, s"$name: $plan")
    }
    // s07 resolves its probes driver-side pre-plan: a warm-index query
    // plan must contain NO embeddings scan at all — only the persisted
    // centroid/list tables and the broadcast local probe relation
    val ivfPlan = SparkEntry.queries("s07_ann_ivf_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("embeddings.parquet"), ivfPlan)
  }

  test("s07 warm-index seed count comes from the marker, not a count job") {
    // first run commits the centroid stage (if not already committed)
    SparkEntry.queries("s07_ann_ivf_topk")(spark, sf).count()
    assert(graft.queries.SimilarityQueries.ivfSeedCountFromMarker(spark, sf),
      "warm-index s07 still runs the seed count job (round-4 VERDICT #2)")
  }

  test("t04 lang-id confusion matrix is well-formed") {
    // The synthetic corpus text is English word-soup regardless of its
    // lang label, so accuracy-vs-label is meaningless here; assert the
    // operator's output contract instead (DuckDB verifies the values).
    val rows = SparkEntry.queries("t04_lang_id")(spark, sf).collect()
    val preds = rows.map(_.getAs[String]("pred_lang")).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "und")))
    val total = rows.map(_.getAs[Long]("n")).sum
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == nDocs)
  }

  test("t02 prunes the documents scan to the columns it uses") {
    val plan = SparkEntry.queries("t02_token_count")(spark, sf)
      .queryExecution.executedPlan.toString
    // ReadSchema must carry only text+lang — reading doc_id/source/n_chars
    // for a two-column aggregate means pruning broke (at 100 TB that is
    // the difference between scanning 2 columns and the whole table)
    assert(plan.contains("ReadSchema: struct<text:string,lang:string>")
      || plan.contains("ReadSchema: struct<lang:string,text:string>"), plan)
  }

  test("no registered query plans a CartesianProduct") {
    // the only intended cross join (s03 brute-force ANN) broadcasts its
    // 10-row probe side -> BroadcastNestedLoopJoin, never a cartesian;
    // anything else would be an accidental all-pairs blowup at scale
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("s07 IVF ANN: exact cosines, measurable recall vs s03 brute force") {
    val brute = SparkEntry.queries("s03_ann_cosine_topk")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = SparkEntry.queries("s07_ann_ivf_topk")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = ivf.keySet.intersect(brute.keySet)
    // cosine math is shared -> identical values where the answers overlap
    common.foreach(k => assert(ivf(k) == brute(k), s"cosine mismatch at $k"))
    val recall = common.size.toDouble / brute.size
    info(f"IVF recall@5 vs brute force: $recall%.3f (nprobe=2 of 16 lists)")
    // 0.90 measured with the 2-iteration Lloyd quantizer; 0.5 floor
    // leaves room for tie-order jitter without masking a regression
    assert(recall > 0.50, f"recall $recall%.3f")
    // every probe still returns a full (or near-full) top-5 from its lists
    assert(ivf.size >= 45, s"ivf rows: ${ivf.size}")
  }

  test("s04 LSH ANN: exact cosines on overlap, measurable recall vs s03") {
    val brute = SparkEntry.queries("s03_ann_cosine_topk")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("s04_ann_lsh_topk")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = lsh.keySet.intersect(brute.keySet)
    common.foreach(k => assert(lsh(k) == brute(k), s"cosine mismatch at $k"))
    val recall = common.size.toDouble / brute.size
    info(f"LSH recall@5 vs brute force: $recall%.3f (8 tables, multiprobe-1)")
    // round 1's single-table LSH scored 0 rows at the driver's sf and the
    // old `> 0.0` floor never noticed — require real recall and a
    // (near-)full top-5 per probe
    assert(recall >= 0.5, f"recall $recall%.3f")
    assert(lsh.size >= 45, s"lsh rows: ${lsh.size}")
  }

  test("s04 probe path broadcasts candidates and probes (no sort-merge)") {
    // the scale contract of the persisted-index design: the embeddings
    // scan must stream through BROADCAST joins against the (small)
    // candidate set and probe vectors — a SortMergeJoin here would
    // shuffle the full embeddings table per query, the exact cost the
    // index exists to avoid
    val plan = SparkEntry.queries("s04_ann_lsh_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("s07 probe scan partition-prunes to the probed inverted lists") {
    // the persisted IVF index is written partitionBy(cid); the probe's
    // literal `cid IN (...)` must reach the scan as a PartitionFilter —
    // that pruning (read nprobe/k of the corpus, not all of it) IS the
    // IVF scale story
    val plan = SparkEntry.queries("s07_ann_ivf_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    // a NON-EMPTY PartitionFilters clause naming cid on the index scan
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined, plan)
  }

  test("s05 decodes real PNG bytes: ImageIO round-trip drives the output") {
    val id = 42L
    val png = graft.queries.SimilarityQueries.synthesizePng(id)
    assert(png.take(4).map(b => f"$b%02x").mkString == "89504e47", "not a PNG stream")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val (w, h) = (img.getWidth, img.getHeight)
    // decoded pixel sum must equal the synthesis formula independently
    // recomputed here — proves the output columns come from a real
    // decode of the bytes, not from the generator's parameters
    val expectedSum = (for { y <- 0 until h; x <- 0 until w }
      yield (x * 7 + y * 13 + id * 31) % 256).sum
    val row = SparkEntry.queries("s05_multimodal_decode")(spark, sf)
      .filter(col("doc_id") === id).head
    assert(row.getAs[Int]("width") == w)
    assert(row.getAs[Int]("height") == h)
    assert(row.getAs[Long]("px_sum") == expectedSum)
  }

  test("s08 decodes real PNG frames; pooled thumbnails match an independent recompute") {
    import graft.queries.SimilarityQueries
    val id = 42L
    val frames = SimilarityQueries.clipFrames(SimilarityQueries.synthesizeClip(id))
    assert(frames.nonEmpty)
    frames.foreach(fr =>
      assert(fr.take(4).map(b => f"$b%02x").mkString == "89504e47", "frame not a PNG"))
    val row = SparkEntry.queries("s08_frame_sample")(spark, sf)
      .filter(col("doc_id") === id).head
    assert(row.getAs[Int]("n_frames") == frames.length)
    val entries = row.getAs[String]("sampled_frames").split(";")
    val sampledIdx = frames.indices by 4
    assert(entries.length == sampledIdx.size)
    assert(row.getAs[Int]("n_sampled") == sampledIdx.size)
    // every sampled entry's WxH AND pooled pixel sum must equal values
    // INDEPENDENTLY recomputed here from an independent ImageIO decode
    // of that container frame — the output can only come from a real
    // decode, and the 16x16 box-pool spec (integer floors, empty boxes
    // widened to one sample, integer-division average) is re-derived
    // from scratch rather than calling the production avgPool16Sum
    entries.zip(sampledIdx).foreach { case (e, fi) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(fi)))
      val (w, h) = (img.getWidth, img.getHeight)
      val r = img.getRaster
      val expected = (for { oy <- 0 until 16; ox <- 0 until 16 } yield {
        val (y0, x0) = (oy * h / 16, ox * w / 16)
        val y1 = math.max(y0 + 1, (oy + 1) * h / 16)
        val x1 = math.max(x0 + 1, (ox + 1) * w / 16)
        val samples = for { y <- y0 until y1; x <- x0 until x1 } yield r.getSample(x, y, 0).toLong
        samples.sum / samples.size
      }).sum
      assert(e == s"$fi:${w}x$h->16x16:$expected", e)
    }
  }

  test("AWT Graphics2D resize pipeline stays functional (spec-level, not pinned)") {
    // The pinned s08 output deliberately excludes Graphics2D bilinear
    // values (implementation-defined per JDK — round-3 ADVICE #4); this
    // keeps the real AWT resize path exercised: decode -> drawImage to
    // 16x16 must yield a plausible, run-to-run deterministic raster.
    import graft.queries.SimilarityQueries
    val frame = SimilarityQueries.clipFrames(SimilarityQueries.synthesizeClip(7L)).head
    def resizeSum(): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
      val thumb = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = thumb.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 16, 16, null)
      g.dispose()
      (for { y <- 0 until 16; x <- 0 until 16 }
        yield thumb.getRaster.getSample(x, y, 0).toLong).sum
    }
    val (a, b) = (resizeSum(), resizeSum())
    assert(a == b, "AWT resize nondeterministic across identical calls")
    assert(a > 0 && a <= 16L * 16 * 255)
    // both are area-averaging resamplers of the same source: the pooled
    // spec value and the AWT value must agree to first order (20% — a
    // cross-check that neither path degenerated, not a bit pin)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
    val pooled = SimilarityQueries.avgPool16Sum(img)
    assert(math.abs(a - pooled).toDouble / pooled < 0.2, s"awt=$a pooled=$pooled")
  }

  test("s10 dedup keeper matches an independent pairs->union-find->min recompute") {
    // independent ground truth: collect s01's verified pairs, run a
    // from-scratch union-find here, keeper = component min; every
    // corpus doc must appear exactly once, singletons keeping themselves
    val pairs = SparkEntry.queries("s01_minhash_neardup")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (x, y) =>
      parent.getOrElseUpdate(x, x); parent.getOrElseUpdate(y, y)
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { if (rx < ry) parent(ry) = rx else parent(rx) = ry }
    }
    val expectedKeeper = parent.keys.map(v => v -> find(v)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val got = SparkEntry.queries("s10_dedup_keeper")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSeq == docs.toSeq, "one row per corpus doc, ordered")
    got.foreach { case (d, k, dropped) =>
      assert(k == expectedKeeper.getOrElse(d, d), s"doc $d keeper $k")
      assert(dropped == (d != k), s"doc $d is_dropped flag")
    }
    assert(pairs.nonEmpty && got.exists(_._3), "corpus has near-dups to drop")
  }

  test("s10 keeper core is correct for negative and >10^12 doc_ids") {
    // hash-derived 64-bit doc ids (the 100 TB shape) are negative half
    // the time and exceed any fixed zero-pad width — the keeper must be
    // the NUMERIC component min regardless (a padded-string min is not)
    import spark.implicits._
    val a = -9223372036854775000L // near Long.MinValue
    val b = -42L
    val c = 5000000000000L       // 13 digits
    val d = 5000000000001L
    val lone = 7L
    val pairs = Seq((a, b), (c, d)).toDF("a", "b")
    val docIds = Seq(a, b, c, d, lone).toDF("doc_id")
    val got = graft.queries.SimilarityQueries.keeperAssignments(pairs, docIds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(a) == (a, false), "negative cluster keeps its numeric min")
    assert(got(b) == (a, true))
    assert(got(c) == (c, false), "13-digit ids survive the round-trip")
    assert(got(d) == (c, true))
    assert(got(lone) == (lone, false), "singleton keeps itself")
  }

  test("s09 SQ8 ANN: exact rerank cosines, high recall vs s03 brute force") {
    val brute = SparkEntry.queries("s03_ann_cosine_topk")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sq8 = SparkEntry.queries("s09_ann_sq8_rerank")(spark, sf)
      .select("probe_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = sq8.keySet.intersect(brute.keySet)
    // rerank uses the same exact-cosine math as s03 -> identical values
    common.foreach(k => assert(sq8(k) == brute(k), s"cosine mismatch at $k"))
    val recall = common.size.toDouble / brute.size
    info(f"SQ8 recall@5 vs brute force: $recall%.3f (int8 ADC scan, top-100 float rerank)")
    // int8 approx cosine is accurate to ~1/127 per dim and the rerank
    // window is 4x the answer size — expect near-perfect recall
    assert(recall >= 0.8, f"recall $recall%.3f")
    assert(sq8.size >= 45, s"sq8 rows: ${sq8.size}")
  }

  test("s06 embedding near-dup: high recall and exact values vs brute-force pairs") {
    // exact answer: all pairs with cosine >= 0.3, computed driver-side
    // (500 vectors at sf0.001 -> 125k pairs, trivial)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      c = cos(vecs(i)._2, vecs(j)._2)
      rc = math.floor(c * 1e6 + 0.5) / 1e6 // same 6-dp rounding as the query
      if rc >= 0.3
    } yield (vecs(i)._1, vecs(j)._1) -> rc).toMap
    val got = SparkEntry.queries("s06_embedding_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision 1.0: every reported pair is a true pair with the exact cosine
    got.foreach { case (k, v) =>
      assert(exact.contains(k), s"false positive $k")
      assert(math.abs(exact(k) - v) < 1e-9, s"cosine mismatch at $k")
    }
    val recall = got.size.toDouble / exact.size
    info(f"s06 recall vs exact all-pairs (cos>=0.3): $recall%.3f (${got.size}/${exact.size})")
    // the round-1 single-table LSH missed ~98%% of true pairs; the
    // multi-table+multiprobe blocking must catch nearly all
    assert(recall >= 0.8, f"recall $recall%.3f")
  }

  test("s01 minhash near-dup: recall and exact Jaccard vs brute-force pairs") {
    import graft.queries.SimilarityQueries.wordShingles
    import graft.stages.EntityLink.jaccard
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> wordShingles(r.getString(1))).sortBy(_._1)
    val exact = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      jac = jaccard(docs(i)._2, docs(j)._2)
      if jac >= 0.8
    } yield (docs(i)._1, docs(j)._1) -> jac).toMap
    val got = SparkEntry.queries("s01_minhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (k, v) =>
      assert(exact.contains(k), s"false positive $k")
      assert(exact(k) == v, s"jaccard mismatch at $k")
    }
    info(f"s01 recall vs exact all-pairs (J>=0.8): ${got.size}/${exact.size}")
    // 16 bands x 4 rows: P(candidate) = 1-(1-J^4)^16 >= 0.9998 at J=0.8
    assert(exact.nonEmpty, "corpus has no true near-dup pairs — test is vacuous")
    assert(got.size.toDouble / exact.size >= 0.9)
  }

  test("s02 simhash near-dup: recall vs brute-force Hamming pairs") {
    import graft.queries.SimilarityQueries.simhash64
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> simhash64(r.getString(1))).sortBy(_._1)
    val exact = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      h = java.lang.Long.bitCount(docs(i)._2 ^ docs(j)._2)
      if h <= 6
    } yield (docs(i)._1, docs(j)._1) -> h).toMap
    val got = SparkEntry.queries("s02_simhash_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    got.foreach { case (k, v) =>
      assert(exact.contains(k), s"false positive $k")
      assert(exact(k) == v, s"hamming mismatch at $k")
    }
    info(f"s02 recall vs exact all-pairs (Hamming<=6): ${got.size}/${exact.size}")
    assert(exact.nonEmpty, "corpus has no true near-dup pairs — test is vacuous")
    // 28 block-pair tables guarantee capture at Hamming <= 6 by
    // pigeonhole (<= 6 dirty blocks of 8 leave a clean keyed pair):
    // recall must be EXACTLY 1.0, and the sets identical
    assert(got.keySet == exact.keySet,
      s"missing: ${(exact.keySet -- got.keySet).take(5)}")
  }

  test("s02 giant-bucket guard: identical-fingerprint cluster yields O(n) edges") {
    import spark.implicits._
    // 600 docs with IDENTICAL text (one simhash -> one giant bucket in
    // every one of the 28 block-pair tables, far over the 256 cap) +
    // one small identical pair + unique filler. Without the guard the
    // self-join would enumerate C(600,2) = 179,700 candidates in EVERY
    // table; the fingerprint-ordered double chain bounds it at O(2n),
    // still Hamming-verified and still one connected component.
    val template = (1 to 40).map(i => s"nav$i word$i").mkString(" ")
    val near = (1 to 40).map(i => s"body$i text$i").mkString(" ")
    val docsDf = (
      (1000L until 1600L).map(id => (id, template)) ++
        Seq((1L, near), (2L, near)) ++
        (10L until 30L).map(id => (id, (1 to 40).map(i => s"u${id}x$i yy${id * 31 + i}").mkString(" ")))
      ).toDF("doc_id", "text")
    val pairs = graft.queries.SimilarityQueries.simhashPairsOf(docsDf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // the small-bucket path still enumerates its pair exhaustively
    assert(pairs.contains((1L, 2L)))
    // giant cluster: double chain = at most 2 edges per member, not n^2
    val giant = pairs.filter { case (a, b) => a >= 1000 && b >= 1000 }
    assert(giant.length >= 599, s"chain too sparse to span: ${giant.length}")
    assert(giant.length <= 1200, s"giant bucket not chained: ${giant.length} edges")
    // chain edges keep the cluster ONE component with the min-id keeper
    val keep = graft.queries.SimilarityQueries.pairedKeepers(
      graft.queries.SimilarityQueries.simhashPairsOf(docsDf))
      .filter(col("doc_id") >= 1000).collect()
    assert(keep.length == 600)
    assert(keep.forall(_.getLong(1) == 1000L), "cluster keeper must be the min id")
    // sf-scale buckets sit far below the cap: the guard must be inert
    // there (same pair set as the recall spec's exact reference)
  }

  test("q15 as-of join matches the naive join+argmax semantics") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("cu"), col("ts").as("cts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("value"))
    val naive = clicks.join(purch, col("cu") === col("pu") && col("pts") < col("cts"))
      .groupBy(col("event_id"))
      .agg(max(struct(col("pts"), col("value"))).as("m"))
      .select(col("event_id"), unix_micros(col("m.pts").cast("timestamp")).as("purchase_us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val asof = SparkEntry.queries("q15_asof_join")(spark, sf)
      .select("event_id", "purchase_us", "click_us").collect()
    assert(asof.nonEmpty)
    asof.foreach { r =>
      assert(r.getLong(1) < r.getLong(2), "as-of must be strictly earlier")
      assert(naive(r.getLong(0)) == r.getLong(1), s"event ${r.getLong(0)}")
    }
    assert(asof.length == naive.size, "row sets differ")
  }

  test("q15 as-of join plan: window-based, no join operator") {
    val plan = SparkEntry.queries("q15_asof_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("q16 salted join equals the plain equi join") {
    val salted = SparkEntry.queries("q16_salted_join")(spark, sf).collect()
    val e = spark.read.parquet(s"$sf/events.parquet").select(col("user_id"), col("value"))
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = e.join(c, "user_id")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        (floor(sum("value") * 100 + 0.5) / 100).as("total_value"))
      .orderBy("c_mktsegment").collect()
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("t07 fingerprint groups equal the driver-side rolling-hash computation") {
    // the operator is non-SQL (no DuckDB oracle) — pin its values against
    // an independent driver-side evaluation of the same polynomial hash
    def fp(t: String): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < t.length) { h = 31 * h + t.charAt(i); i += 1 }
      h
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> fp(r.getString(1)))
    val expected = docs.groupBy(_._2).map { case (h, rows) =>
      h -> (rows.map(_._1).min, rows.length.toLong)
    }
    val got = SparkEntry.queries("t07_fingerprint")(spark, sf).collect()
      .map(r => r.getAs[Long]("fingerprint") ->
        (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n_docs"))).toMap
    assert(got == expected)
    // mass conservation: every doc lands in exactly one group (the
    // synthetic corpus happens to be exact-dup-free, so groups == docs;
    // grouping behavior under real dups is covered by t01's oracle)
    assert(got.values.map(_._2).sum == docs.length)
  }

  test("t13 stratified sample is deterministic with per-lang rates in bounds") {
    val rows = SparkEntry.queries("t13_stratified_sample")(spark, sf).collect()
    val again = SparkEntry.queries("t13_stratified_sample")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    val byLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en keeps ~1/2, others ~1/4 (hash-threshold; binomial tolerance)
    byLang.foreach { case (lang, n) =>
      val rate = n.toDouble / total(lang)
      val want = if (lang == "en") 0.5 else 0.25
      assert(math.abs(rate - want) < 0.18, s"$lang rate $rate want ~$want")
    }
  }

  test("t09 split is a deterministic partition of the corpus") {
    val rows = SparkEntry.queries("t09_train_split")(spark, sf).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(bySplit.values.sum == nDocs)
    assert(bySplit.keySet == Set("train", "val", "test"))
    // train dominates (12/16 of the hash space)
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // determinism: a second run lands every doc in the same split
    val again = SparkEntry.queries("t09_train_split")(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("kg04 wide report reproduces the corresponding-author ' *' convention") {
    val rows = SparkEntry.queries("kg04_wide_report")(spark, sf)
      .filter(col("doc_id") === "https://www.nature.com/articles/s41567-025-02944-3")
      .collect()
    assert(rows.length == 1)
    val firstCorr = rows.head.getAs[String]("first_corr_affiliations")
    assert(firstCorr.contains(" *"), firstCorr)
    assert(firstCorr.contains("、"), firstCorr)
    assert(rows.head.getAs[String]("countries") == "Switzerland")
  }
}
