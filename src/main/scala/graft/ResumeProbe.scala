package graft

import graft.exec.Checkpoint
import graft.fixtures.FixtureCorpus
import graft.stages.Pipeline
import org.apache.spark.sql.SparkSession

/** Resumability instrument (north-rule evidence, not driver contract):
  * times the checkpointed pipeline cold, then resumed with the same
  * snapshot id (every stage must skip), and checks outputs identical.
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_KG_N=20000 sbt "runMain graft.ResumeProbe"
  */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_KG_N", "20000").toInt
    val root = sys.env.getOrElse("SPARK_GRAFT_CKPT_DIR", "/tmp/graft_resume_probe")
    MainUtil.deleteRecursively(new java.io.File(root))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import MainUtil.timed
    val files = FixtureCorpus.corpus(spark, n, cpus.toInt * 4)
    val snap = Checkpoint.snapshotId("fixture", n)

    val ((t1, e1), cold) = timed {
      val (t, e) = Pipeline.runCheckpointed(spark, files, Checkpoint(root, "run-1"), snap)
      (t.count(), e.count())
    }
    val ((t2, e2), warm) = timed {
      val (t, e) = Pipeline.runCheckpointed(spark, files, Checkpoint(root, "run-2"), snap)
      (t.count(), e.count())
    }
    require(t1 == t2 && e1 == e2, s"resume changed outputs: $t1/$e1 vs $t2/$e2")
    println(f"PROBE resume cpus=$cpus pages=$n triples=$t1 entities=$e1 cold=$cold%.1fs resumed=$warm%.1fs speedup=${cold / warm}%.0fx")
    spark.stop()
  }
}
