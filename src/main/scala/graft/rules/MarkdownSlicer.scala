package graft.rules

/** The APS markdown "line machine" (SURVEY.md §2.9): slice a crawled
  * markdown page down to its core content (title .. abstract), dropping
  * navigation/share/noise lines.
  *
  * Two variants, with semantics matching the reference exactly (verified
  * byte-for-byte against the committed golden files
  * result.md -> extracted_content.md and
  * result_f961f7e5.md -> extracted_content_f961f7e5.md):
  *
  *  - [[slice]]       = clean variant (aps_clean_extractor.py:5-60):
  *                      title line .. first >100-char line after
  *                      "## Abstract", noise-filtered.
  *  - [[sliceToImage]] = content variant (aps_content_extractor.py:5-63):
  *                      stops at the first image after the abstract and
  *                      collapses runs of empty lines.
  *
  * Pure function; invoked inside mapPartitions (one compiled rule set per
  * JVM). A miss returns None (the reference returns Chinese sentinel
  * strings; we map misses to None so no triple is emitted — E3 decision
  * in SURVEY.md §2.8).
  */
object MarkdownSlicer {

  private val navKeywords = Seq(
    "Skip to Main Content", "Physical Review", "All Journals",
    "Highlights", "Recent", "Collections")

  private val navKeywordsVariant = navKeywords ++ Seq("Authors", "RSS")

  private val shareButtons =
    Set("X", "Facebook", "Mendeley", "LinkedIn", "Reddit", "Sina Weibo")

  private def isNavigation(line: String, kws: Seq[String]): Boolean =
    kws.exists(line.contains)

  /** Skip predicate of the clean variant (aps_clean_extractor.py:72-104).
    * Checks mix stripped-line equality with raw-line containment — the
    * mix is load-bearing for golden equality.
    */
  private def shouldSkip(line: String): Boolean = {
    val s = line.strip()
    if (s == "open icon close icon" || s == "Shareopen icon close icon") true
    else if (shareButtons.contains(s)) true
    else if (s.startsWith("  *") && shareButtons.contains(s.drop(4).strip())) true
    else if (line.contains("[PDF]") &&
      (line.contains("Share") || shareButtons.exists(line.contains))) true
    else if (line.contains("altmetric.com") || s == "[ ]") true
    else if (s == "Export Citation" || s == "Show metricsopen icon close icon") true
    else false
  }

  /** Filter predicate of the content variant
    * (aps_content_extractor.py:75-110) — all checks on the stripped line.
    */
  private def shouldFilter(raw: String): Boolean = {
    val line = raw.strip()
    if (line.startsWith("![") || (line.startsWith("  *") && line.contains("!["))) true
    else if (shareButtons.contains(line)) true
    else if (line.startsWith("  *") && shareButtons.exists(line.contains)) true
    else if (line == "open icon close icon" || line == "Shareopen icon close icon" ||
      line == "Show metricsopen icon close icon" || line == "Export Citation") true
    else if (line.contains("altmetric.com") || line == "[ ]") true
    else if (line.startsWith("[PDF]") && line.contains("Shareopen icon close icon")) true
    else false
  }

  private def findTitle(lines: Array[String], kws: Seq[String]): Option[Int] =
    lines.indices.find { i =>
      lines(i).strip().startsWith("# ") && !isNavigation(lines(i), kws)
    }

  /** Clean variant: returns the sliced content, or None when the title,
    * abstract marker, or abstract body is missing.
    */
  def slice(markdown: String): Option[String] = {
    val lines = markdown.split("\n", -1)
    for {
      titleStart <- findTitle(lines, navKeywords)
      abstractLine <- (titleStart until lines.length)
        .find(i => lines(i).strip() == "## Abstract")
      abstractContent <- (abstractLine + 1 until lines.length)
        .find { i => val s = lines(i).strip(); s.nonEmpty && s.length > 100 }
    } yield {
      (titleStart to abstractContent).iterator
        .map(lines(_))
        .filterNot(shouldSkip)
        .mkString("\n")
        .strip()
    }
  }

  /** Content variant: collects from the title, stops at the first image
    * line after "## Abstract", filters noise, collapses empty-line runs.
    */
  def sliceToImage(markdown: String): Option[String] = {
    val lines = markdown.split("\n", -1)
    for {
      titleStart <- findTitle(lines, navKeywordsVariant)
      _ <- (titleStart until lines.length)
        .find(i => lines(i).strip().startsWith("## Abstract"))
    } yield {
      val out = Vector.newBuilder[String]
      var inAbstract = false
      var i = titleStart
      var done = false
      while (i < lines.length && !done) {
        val line = lines(i)
        val s = line.strip()
        if (s.startsWith("## Abstract")) {
          out += line
          inAbstract = true
        } else if (inAbstract &&
          (s.startsWith("![") || (s.startsWith("  *") && s.contains("![")))) {
          done = true
        } else if (!shouldFilter(line)) {
          out += line
        }
        i += 1
      }
      collapseEmptyLines(out.result().mkString("\n"))
    }
  }

  /** P24: runs of blank lines -> one (aps_content_extractor.py:134-151). */
  def collapseEmptyLines(content: String): String = {
    val out = Vector.newBuilder[String]
    var prevEmpty = false
    content.split("\n", -1).foreach { line =>
      val empty = line.strip().isEmpty
      if (!empty || !prevEmpty) out += line
      prevEmpty = empty
    }
    out.result().mkString("\n").strip()
  }
}
