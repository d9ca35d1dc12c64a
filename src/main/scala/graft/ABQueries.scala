package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 optimization tooling: same-session A/B of query
  * reformulations — each entry pairs the CURRENT production query with
  * an inline copy of the PREVIOUS formulation, timed alternately in one
  * JVM so both arms sample the same host-noise window (cross-session
  * comparison is unreliable on this VM; see BASELINE.md's noise notes).
  *
  * Usage: runMain graft.ABQueries <repsPerArm> [name1,name2,...]
  */
object ABQueries {

  /** Old formulations, frozen as of the round-6 start commit. */
  private def oldVariants: Map[String, (SparkSession, String) => DataFrame] = {
    def docs(dir: String)(implicit s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/documents.parquet")
    val nTokensOld = size(split(trim(col("text")), "\\s+"))
    Map(
      "t02_token_count" -> { (s: SparkSession, dir: String) =>
        implicit val sp = s
        docs(dir)
          .withColumn("n_tokens", nTokensOld)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("total_tokens"),
            (floor(avg("n_tokens") * 100 + 0.5) / 100).as("avg_tokens"))
          .orderBy("lang")
      },
      "t03_quality_score" -> { (s: SparkSession, dir: String) =>
        implicit val sp = s
        val tokens = nTokensOld
        val punct = length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))
        val stop = size(split(concat(lit(" "), col("text"), lit(" ")), "\\sthe\\s")) - 1
        def r(c: Column, sc: Int): Column = floor(c * sc + 0.5) / sc
        docs(dir)
          .withColumn("n_tokens", tokens)
          .withColumn("punct_ratio", r(punct.cast("double") / length(col("text")), 10000))
          .withColumn("stopword_ratio", r(stop.cast("double") / tokens, 10000))
          .withColumn("mean_word_len",
            r((length(col("text")) - tokens + 1).cast("double") / tokens, 100))
          .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_word_len")
          .orderBy("doc_id")
      },
      "t04_lang_id" -> { (s: SparkSession, dir: String) =>
        implicit val sp = s
        def hits(word: String) =
          size(split(concat(lit(" "), col("text"), lit(" ")), s"\\s$word\\s")) - 1
        val scored = docs(dir)
          .withColumn("en_hits", hits("the"))
          .withColumn("de_hits", hits("der") + hits("und"))
          .withColumn("fr_hits", hits("le") + hits("et"))
          .withColumn("es_hits", hits("el") + hits("y"))
        val best = greatest(col("en_hits"), col("de_hits"), col("fr_hits"), col("es_hits"))
        scored
          .withColumn("pred_lang",
            when(best === 0, lit("und"))
              .when(best === col("en_hits"), lit("en"))
              .when(best === col("de_hits"), lit("de"))
              .when(best === col("fr_hits"), lit("fr"))
              .when(best === col("es_hits"), lit("es")))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred_lang")
      })
  }

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
    spark.range(1000000).selectExpr("sum(id)").count()

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val newQ = SparkEntry.queries
    val names = oldVariants.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      run(newQ(name)(spark, sfDir)); run(oldVariants(name)(spark, sfDir)) // warm both
      val (nw, old) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      (1 to reps).foreach { _ =>
        nw += time(run(newQ(name)(spark, sfDir)))
        old += time(run(oldVariants(name)(spark, sfDir)))
      }
      val (a, b) = (nw.result(), old.result())
      println(f"ABQ $name%-24s new_min=${a.min}%7.3f old_min=${b.min}%7.3f  " +
        f"new=${a.map(x => f"$x%.3f").mkString(",")} old=${b.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
