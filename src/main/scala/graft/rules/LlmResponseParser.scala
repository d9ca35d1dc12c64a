package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P25: the LLM-response field parser (main.py:97-113) — six anchored
  * regexes over a response text, DOTALL, "N/A" default on miss.
  *
  * Exposed as Column expressions (codegen'd regexp_extract, no UDF) plus
  * a pure-Scala variant for unit tests. Keys are the reference's Chinese
  * report fields, exposed under ASCII column names for the SQL surface.
  */
object LlmResponseParser {

  /** (columnName, regex) — regexes carry (?s) for DOTALL semantics. */
  val fields: Seq[(String, String)] = Seq(
    ("news_intro", "(?s)新闻风格介绍：(.*?)论文信息提取："),
    ("first_corr_affils", "(?s)第一作者/共同作者单位/通讯作者单位：(.*?)，其他作者单位："),
    ("other_affils", "(?s)其他作者单位：(.*?)，所有作者单位所属国家："),
    ("countries", "(?s)所有作者单位所属国家：(.*?)，论文url链接："),
    ("url", "(?s)论文url链接：(.*?)，论文名："),
    ("paper_title", "(?s)论文名：(.*)$"))

  /** Column form: one output column per field over a response column.
    * regexp_extract returns "" on miss; the reference returns "N/A" —
    * reproduced with a length guard, then strip (Python .strip()).
    */
  def columns(response: Column): Seq[Column] = fields.map { case (name, rx) =>
    // regexp-based strip, not trim(): Spark trim removes only 0x20
    // spaces while Python .strip() (the reference) removes all
    // whitespace — a multi-line capture ending in "\n\n" must strip
    // identically on both surfaces. (?U) makes Java's \s match Unicode
    // White_Space (U+3000 ideographic space, U+00A0 NBSP, ...), the
    // class closest to Python's .strip() — notably Java's
    // String.strip()/Character.isWhitespace EXCLUDES NBSP, which Python
    // strips, so parse() below shares this regex instead of .strip.
    when(response.rlike(rx),
        regexp_replace(regexp_extract(response, rx, 1), StripRx, ""))
      .otherwise(lit("N/A")).as(name)
  }

  /** The shared strip class — one definition so the Column form and
    * parse() cannot diverge (they previously did on NBSP: (?U)\s
    * matches it, Character.isWhitespace does not).
    */
  private[rules] val StripRx = "(?U)^\\s+|\\s+$"
  private val StripPattern = StripRx.r

  /** Pure-Scala variant for unit tests and mapPartitions use. */
  def parse(response: String): Map[String, String] = {
    fields.map { case (name, rx) =>
      name -> rx.r.findFirstMatchIn(response)
        .map(m => StripPattern.replaceAllIn(m.group(1), "")).getOrElse("N/A")
    }.toMap
  }
}
