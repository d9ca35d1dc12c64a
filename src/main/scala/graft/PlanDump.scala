package graft

import org.apache.spark.sql.SparkSession

/** Round-6 optimization tooling: dump `.explain("formatted")` for every
  * declared query to `plans/r06/<name>_<tag>.txt` (tag = args(0),
  * default "before"). Pure planning — no jobs execute — so it is safe
  * to run alongside measurement work. Queries named in args(1) (comma
  * list) restrict the dump.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
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

    val outDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(outDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $name -> plans/r06/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
