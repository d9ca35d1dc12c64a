package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native cosine expression must be BIT-IDENTICAL to the
  * higher-order-function formula it replaced in the ANN scoring paths
  * (the pinned oracles were generated under the HOF formula and must
  * stay green), including its null semantics.
  */
class CosineSimilaritySpec extends SparkSpec {

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, p) => acc + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("bit-identical to the aggregate/zip_with formula on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .withColumn("native", CosineSimilarity.cosineSim(col("a"), col("b")))
      .withColumn("hof", hofCosine(col("a"), col("b")))
    // exact bit equality, not tolerance: the accumulation order matches
    // aggregate's sequential fold by construction
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("null semantics match: length mismatch and null element give NULL") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)), // length mismatch
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)) // null element
    ).toDF("a", "b")
      .withColumn("native", CosineSimilarity.cosineSim(col("a"), col("b")))
      .withColumn("hof", hofCosine(col("a"), col("b")))
    df.collect().foreach { r =>
      assert(r.isNullAt(2), "native should be null")
      assert(r.isNullAt(3), "hof reference is null too")
    }
  }

  test("zero-norm vector: NULL, where the HOF formula would kill the job") {
    import spark.implicits._
    val zero = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    // the deliberate divergence: under ANSI mode the Divide in the HOF
    // formula throws DIVIDE_BY_ZERO on a single degenerate embedding —
    // a job-killer at scale; the native expression yields NULL, which
    // sorts LAST under the rank windows (never a top-k result)
    val e = intercept[Exception] {
      zero.withColumn("hof", hofCosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO")
      || Option(e.getCause).exists(_.getMessage.contains("DIVIDE_BY_ZERO")), e.toString)
    val native = zero
      .withColumn("native", CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect().head
    assert(native.isNullAt(2))
  }

  test("SQL registration: cosine_sim works from spark.sql") {
    CosineSimilarity.register(spark)
    val v = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head.getDouble(0)
    assert(v == 1.0)
  }
}
