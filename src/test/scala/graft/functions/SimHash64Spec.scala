package graft.functions

import graft.SparkSpec
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll

class SimHash64Spec extends SparkSpec with graft.PropChecks {

  test("expression eval equals the plain-Scala reference implementation") {
    val texts = Seq("the quick brown fox", "THE QUICK brown FOX", "",
      "one", "a b c d e f g", "spark scan merge join")
    texts.foreach { t =>
      assert(SimHash64.hash(t) == SimilarityQueries.simhash64(t), s"mismatch for '$t'")
    }
    checkProp(forAll(Gen.listOf(Gen.alphaNumStr)) { words =>
      val t = words.mkString(" ")
      SimHash64.hash(t) == SimilarityQueries.simhash64(t)
    })
  }

  test("codegen and interpreted paths agree over real data") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaExpr = df.select($"doc_id", SimHash64.simhash64($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    val viaScala = df.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> SimilarityQueries.simhash64(t) }.toMap
    assert(viaExpr == viaScala)
  }

  test("expression is codegen'd (no fallback) and plan stays whole-stage") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(SimHash64.simhash64(col("text")).as("fp"))
      .filter(col("fp") =!= 0L)
    // '*(n)' node prefixes mark WholeStageCodegen membership
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash64("), plan)
    assert(plan.contains("*(1) Filter"), plan)
    df.count() // executes the generated code path
  }

  test("SQL registration works") {
    SimHash64.register(spark)
    val n = spark.sql(
      "SELECT simhash64(text) AS fp FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
      .filter(col("fp").isNotNull).count()
    assert(n == 500)
  }

  test("invalid input type is rejected at analysis") {
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3).select(SimHash64.simhash64(col("id"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("simhash64") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
