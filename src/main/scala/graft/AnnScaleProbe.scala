package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN scale-headroom instrument (not part of the driver contract): runs
  * the PRODUCTION similarity queries (s03 brute force, s04 multi-table
  * LSH, s09 SQ8 rerank) unchanged against a synthesized 1M x 64-dim
  * embedding table, so the 100 TB claims rest on the same code the
  * driver checks at sf0.01 — not on a parallel implementation.
  *
  * Corpus: ids 0-9 are the probes; ids 10-999 are planted near-duplicates
  * (probe + 5% noise, cosine ~0.95+ — the semantic-dedup retrieval case);
  * the rest isotropic noise. Deterministic (id-seeded), partitioned
  * generation. Recall is measured vs the exact brute-force answer.
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ANN_N=1000000 sbt "runMain graft.AnnScaleProbe"
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "1000000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_ANN_DIR", "/tmp/graft_ann_scale")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // heap comes from build.sbt's forked -Xmx (SPARK_DRIVER_MEM env);
      // setting spark.driver.memory after JVM start would be a no-op
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fail fast on a typo'd SPARK_GRAFT_ANN_QUERIES name: resolving it
    // lazily after the corpus write + brute-force reference run would
    // discard all that completed work on a NoSuchElementException
    val approxNames = sys.env.get("SPARK_GRAFT_ANN_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("s04_ann_lsh_topk", "s07_ann_ivf_topk", "s09_ann_sq8_rerank"))
    val unknown = ("s03_ann_cosine_topk" +: approxNames).filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown SPARK_GRAFT_ANN_QUERIES names: ${unknown.mkString(",")} — valid: " +
        SparkEntry.queries.keys.filter(_.startsWith("s0")).toSeq.sorted.mkString(","))

    val dim = 64
    def vecOf(id: Long): Array[Float] = {
      val rnd = new scala.util.Random(id)
      Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    }
    spark.range(0, n, 1, cpus.toInt * 4).map { id =>
      val v =
        if (id >= 10 && id < 1000) {
          // planted near-duplicate of probe id%10 (cosine ~0.95+)
          val base = vecOf(id % 10)
          val rnd = new scala.util.Random(id * 7919)
          base.map(x => x + (rnd.nextDouble() * 2 - 1).toFloat * 0.05f)
        } else vecOf(id)
      (id, v, (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"PROBE ann corpus written: $n vectors x $dim dims")

    // two LIKE-FOR-LIKE samples (both collect the 50-row result — the
    // driver transfer is negligible next to the scans), the second also
    // yields the rows; a third untimed collect would re-run the full
    // scan for no extra information, and a count()-vs-collect() pair
    // would make "best" the min of two differently-shaped measurements
    import MainUtil.timed
    def run(name: String): Map[(Long, Long), Double] = {
      def sample() = timed(SparkEntry.queries(name)(spark, dir)
        .select("probe_id", "vec_id", "cosine").collect())
      val (_, w1) = sample()
      val (collected, w2) = sample()
      val rows = collected.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      println(f"PROBE $name cpus=$cpus n=$n walls=$w1%.2f,$w2%.2f best=${math.min(w1, w2)}%.2f rows=${rows.size}")
      rows
    }

    val brute = run("s03_ann_cosine_topk")
    // SPARK_GRAFT_ANN_QUERIES (validated up front, before the corpus
    // write) narrows the approximate-path list — e.g. "s07_ann_ivf_topk"
    // for the 10M k=128 run, where rebuilding the LSH and SQ8 indexes
    // too would add tens of minutes for no new information
    for (name <- approxNames) {
      val approx = run(name)
      val common = approx.keySet.intersect(brute.keySet)
      // report drift instead of crashing: a cosine mismatch would discard
      // all completed 1M-vector measurements if it threw here
      val mismatched = common.count(k => approx(k) != brute(k))
      if (mismatched > 0)
        println(s"PROBE $name WARNING: $mismatched/${common.size} cosine mismatches vs s03")
      println(f"PROBE $name recall@5 vs exact: ${common.size.toDouble / brute.size}%.3f")
    }
    spark.stop()
  }
}
