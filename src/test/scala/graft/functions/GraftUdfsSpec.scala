package graft.functions

import graft.SparkSpec
import graft.fixtures.FixtureCorpus
import graft.rules.{AffiliationNormalizer, MarkdownSlicer}

/** The SQL surface of the rule functions (SURVEY §2.2 P26 / §2.7): the
  * registered UDFs must agree with the direct Scala calls the typed
  * pipeline makes, exercised through spark.sql.
  */
class GraftUdfsSpec extends SparkSpec {

  test("normalize_affiliation is callable from SQL and matches the Scala rule") {
    import spark.implicits._
    val affs = Seq(
      "Institute of Physics, École Polytechnique Fédérale de Lausanne (EPFL), Lausanne, Switzerland",
      "Department of Bioengineering, Stanford University, Stanford, CA, USA",
      "Institute of Microbiology, University of Oxford, Oxford, UK")
    affs.toDF("aff").createOrReplaceTempView("affs")
    val rows = spark.sql(
      """SELECT aff, normalize_affiliation(aff).institution AS inst,
        |       normalize_affiliation(aff).country AS country,
        |       affiliation_country(aff) AS country2
        |FROM affs""".stripMargin).collect()
    assert(rows.length == affs.length)
    rows.foreach { r =>
      val (inst, country) = AffiliationNormalizer.normalize(r.getString(0))
      assert(r.getString(1) == inst, r.getString(0))
      assert(r.getString(2) == country && r.getString(3) == country)
    }
    // dept/school segments stripped, country recognized
    val stanford = rows.find(_.getString(0).contains("Stanford")).get
    assert(stanford.getString(2) == "USA")
    assert(!stanford.getString(1).toLowerCase.contains("department"))
  }

  test("slice_markdown is callable from SQL and matches the Scala slicer") {
    import spark.implicits._
    val md = FixtureCorpus.resourceText("/graft/fixtures/aps_raw_pyzr-jmvw.md")
    Seq(md).toDF("content").createOrReplaceTempView("pages")
    val sliced = spark.sql("SELECT slice_markdown(content) AS s FROM pages")
      .collect().head.getString(0)
    assert(sliced == MarkdownSlicer.slice(md).get)
    assert(sliced.length < md.length) // it actually sliced
  }

  test("clean_ws is callable from SQL (P14 via the SQL surface)") {
    val got = spark.sql("SELECT clean_ws('  a \t b\n\nc ') AS s").collect().head.getString(0)
    assert(got == "a b c")
  }

  test("LLM parser Column form strips all whitespace like the Scala .strip()") {
    import spark.implicits._
    import graft.rules.LlmResponseParser
    // multi-line intro ending in \n\n before the next marker — the shape
    // of main.py's own worked example; Spark trim() would keep the
    // newlines where Python .strip() removes them
    // field edges carry \n\n, U+3000 ideographic space AND U+00A0 NBSP:
    // both surfaces share the (?U)\s strip class (Java String.strip
    // would KEEP the NBSP — the pre-round-3 divergence)
    val resp = "新闻风格介绍：line one\nline two\n\n论文信息提取：第一作者/共同作者单位/通讯作者单位：\u3000X\u00a0，" +
      "其他作者单位：Y，所有作者单位所属国家：Z，论文url链接：u，论文名：T"
    val fromCols = Seq(resp).toDF("response")
      .select(LlmResponseParser.columns(org.apache.spark.sql.functions.col("response")): _*)
      .collect().head
    val fromScala = LlmResponseParser.parse(resp)
    LlmResponseParser.fields.map(_._1).zipWithIndex.foreach { case (name, i) =>
      assert(fromCols.getString(i) == fromScala(name), name)
    }
    assert(fromScala("news_intro") == "line one\nline two") // no trailing \n\n
    assert(fromScala("first_corr_affils") == "X") // U+3000 and NBSP both stripped
  }

  test("null inputs return null through every registered UDF") {
    val r = spark.sql(
      """SELECT normalize_affiliation(CAST(NULL AS STRING)) AS n1,
        |       affiliation_country(CAST(NULL AS STRING)) AS n2,
        |       slice_markdown(CAST(NULL AS STRING)) AS n3,
        |       clean_ws(CAST(NULL AS STRING)) AS n4""".stripMargin).collect().head
    (0 until 4).foreach(i => assert(r.isNullAt(i), s"col $i"))
  }
}
