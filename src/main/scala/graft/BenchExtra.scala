package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization tooling: isolated per-query timing with a
  * configurable repeat count (guide §1.4 — noop sink, same session
  * config as graft.Bench, which stays FROZEN). Not part of the driver
  * contract; numbers are cited in OPTIMIZATION_r06.md only.
  *
  * Usage: runMain graft.BenchExtra <reps> [name1,name2,...]
  * Prints one line per query: name, all rep seconds, and the min.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftUdfs.register(spark)

    // same warmup as graft.Bench
    spark.range(1000000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").select("l_orderkey").limit(1).count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val verbose = sys.env.get("GRAFT_BX_VERBOSE").contains("1")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val taskCount = new java.util.concurrent.atomic.AtomicInteger
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet()
        taskCount.addAndGet(j.stageInfos.map(_.numTasks).sum)
        if (verbose) jobStarts.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(si => s"${si.name.takeWhile(_ != '(')}x${si.numTasks}").mkString("|"),
          j.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStarts.remove(j.jobId)).foreach { case (t0, desc, nt) =>
          println(f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  tasks=$nt%4d  ${desc.take(120)}")
        }
    })
    val qmap = SparkEntry.queries
    // graft.Bench's headline list, duplicated verbatim (Bench.scala is
    // frozen for measurement, so its private list cannot be exposed)
    val headline = Seq(
      "q01_pricing_agg", "q02_revenue_by_nation", "q03_top_orders",
      "q06_filter_pushdown_agg", "q07_window_running", "q08_distinct_agg",
      "q11_events_json_hourly", "q13_rollup", "q15_asof_join", "q17_sessionize",
      "t01_dedup_exact", "t02_token_count", "t03_quality_score", "t04_lang_id",
      "t06_bpe_tokens", "t08_repetition_ratio", "t09_train_split", "t12_redact",
      "t15_contamination", "t17_dup_spans", "t18_seq_pack", "t19_span_removal",
      "s01_minhash_neardup", "s02_simhash_neardup", "s03_ann_cosine_topk",
      "s04_ann_lsh_topk", "s05_multimodal_decode", "s06_embedding_neardup",
      "s07_ann_ivf_topk", "s08_frame_sample", "s09_ann_sq8_rerank",
      "s10_dedup_keeper", "s11_cluster_stats", "s12_incremental_neardup",
      "s13_incremental_keeper")
    // the two KG bench sections, replicated with graft.Bench's exact
    // methodology (Bench.scala itself is frozen)
    val cpusI = cpus.toInt
    val kgSections: Map[String, () => Unit] = Map(
      "kg_extract_pipeline" -> (() => {
        graft.stages.MentionDetect.triplesDirect(
          graft.fixtures.FixtureCorpus.corpus(spark, 60000, cpusI * 4)).count(): Unit
      }),
      "kg_entity_link" -> (() => {
        val ment = graft.stages.MentionDetect.mentionsDirect(
          graft.fixtures.FixtureCorpus.corpus(spark, 2000, cpusI * 2))
        graft.stages.Pipeline.entities(spark, ment).count(): Unit
      }))
    val names = (headline ++ kgSections.keys.toSeq)
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"benchextra: $name")
      def once(): Unit = kgSections.get(name) match {
        case Some(f) => f()
        case None => qmap(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val samples = (1 to reps).map { _ =>
        try time(once())
        catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name rep failed: $e"); -1.0 }
      }
      val ok = samples.filter(_ >= 0)
      val best = if (ok.isEmpty) -1.0 else ok.min
      val (jobs, tasks) = (jobCount.getAndSet(0), taskCount.getAndSet(0))
      println(f"BX $name%-24s min=$best%8.3f  jobs/rep=${jobs / reps}  tasks/rep=${tasks / reps}  reps=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
