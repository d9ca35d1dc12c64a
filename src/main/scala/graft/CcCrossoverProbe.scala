package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.stages.Canonicalize

/** CC crossover instrument (not part of the driver contract): measures
  * BOTH Canonicalize paths on the same k-edge graphs around the
  * union-find / label-prop boundary — the evidence behind
  * [[Canonicalize.DefaultSmallCutoff]]. The graph shape is the worst
  * case for BOTH sides: all-distinct string vertices (maximum driver
  * memory per edge for the union-find collect) arranged in 1,000 long
  * chains (maximum pointer-jump rounds for label propagation). Driver
  * heap cost of the union-find call is sampled by a 10 ms poller and
  * reported as peak-minus-baseline; both paths must agree on row count
  * and an order-independent (id, canonicalId) hash.
  *
  * Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_CC_EDGES=132000,500000,1000000,2000000 \
  *   sbt "runMain graft.CcCrossoverProbe"
  */
object CcCrossoverProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES",
      "132000,500000,1000000,2000000").split(',').map(_.trim.toLong)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import MainUtil.timed

    def fingerprint(cc: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = cc.agg(count(lit(1)),
        sum(pmod(xxhash64(concat(col("id"), col("canonicalId"))),
          lit(1000000000000L)))).head()
      (r.getLong(0), r.getLong(1))
    }

    val rt = Runtime.getRuntime
    for (n <- sizes) {
      val comps = 1000L // 1,000 chains of n/1000 edges: diameter n/1000
      val edges = spark.range(0L, n, 1L, cpus.toInt)
        .select(format_string("v%09d", col("id")).as("src"),
          format_string("v%09d", col("id") + comps).as("dst"))
        .localCheckpoint(true) // same materialized input for both paths

      System.gc(); Thread.sleep(200)
      val base = rt.totalMemory - rt.freeMemory
      @volatile var peak = base
      @volatile var sampling = true
      val poller = new Thread(() => {
        while (sampling) {
          peak = math.max(peak, rt.totalMemory - rt.freeMemory)
          Thread.sleep(10)
        }
      })
      poller.setDaemon(true); poller.start()
      val (ufFp, wUf) = timed(fingerprint(
        Canonicalize.connectedComponents(edges, smallCutoff = Long.MaxValue)))
      sampling = false; poller.join()

      val (lpFp, wLp) = timed(fingerprint(
        Canonicalize.connectedComponents(edges, smallCutoff = 0)))
      require(ufFp == lpFp, s"paths disagree at $n edges: uf=$ufFp lp=$lpFp")
      println(f"PROBE cc edges=$n chains=$comps uf=$wUf%.2f s " +
        f"(driver heap +${(peak - base) / 1048576} MB peak) lp=$wLp%.2f s " +
        f"vertices=${ufFp._1} agree=true")
    }
    spark.stop()
  }
}
