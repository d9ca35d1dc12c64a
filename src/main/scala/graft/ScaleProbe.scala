package graft

import graft.fixtures.FixtureCorpus
import graft.stages.MentionDetect
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling instrument (not part of the driver contract): times each KG
  * stage separately at the current SPARK_GRAFT_CPUS so stage-level
  * scaling efficiency can be attributed. Usage:
  *   SPARK_GRAFT_CPUS=8 SPARK_GRAFT_KG_N=100000 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val kgN = sys.env.getOrElse("SPARK_GRAFT_KG_N", "100000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      // 3 repetitions: the host shows bursty contention (steal spikes,
      // all-core frequency effects) — report every sample plus the best.
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label cpus=$cpus walls=${walls.map(w => f"$w%.2f").mkString(",")} best=${walls.min}%.2f")
    }

    spark.range(1000000).selectExpr("sum(id)").count() // warm up scheduler
    // warm up the extraction path itself — C2 compilation of the regex
    // rule maps dominates a cold first pass (measured 4x)
    MentionDetect.triplesDirect(FixtureCorpus.corpus(spark, 5000, cpus.toInt)).count()

    val parts = cpus.toInt * 4
    time("corpus_gen") {
      FixtureCorpus.corpus(spark, kgN, parts).select(length($"content")).agg(sum("length(content)")).head.getLong(0)
    }
    time("slice_only") {
      FixtureCorpus.corpus(spark, kgN, parts).mapPartitions(_.map { f =>
        if (f.lang == "aps-md") graft.rules.MarkdownSlicer.slice(f.content).map(_.length.toLong).getOrElse(0L)
        else f.content.length.toLong
      }).agg(sum("value")).head.getLong(0)
    }
    time("records") {
      MentionDetect.records(FixtureCorpus.corpus(spark, kgN, parts)).count()
    }
    time("triples") {
      MentionDetect.triplesDirect(FixtureCorpus.corpus(spark, kgN, parts)).count()
    }
    spark.stop()
  }
}
