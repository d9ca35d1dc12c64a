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
  *
  * ALLOCATION DISCIPLINE: this is the byte-dominant extraction stage
  * (the raw-crawl pages are ~86% of fixture-corpus bytes, and the 2 MB
  * giant skew rows all take this path), and the round-4 scaling
  * decomposition identified store-bearing memory traffic — allocation —
  * as the binding multi-thread ceiling on a single VM. The previous
  * implementation materialized EVERY line of the page as a fresh String
  * (`split("\n", -1)`) plus a second stripped copy per predicate call:
  * ~3-4 bytes allocated per input byte, and for the giant rows ~5 MB per
  * page of which the slicer window needs ~3 KB. This version scans line
  * BOUNDARIES over the raw string (indexOf('\n')) and evaluates every
  * predicate on (start, end) index ranges — regionMatches equality /
  * startsWith, bounded index scans for containment, index arithmetic for
  * strip — so the only per-page allocations are the output builder and
  * the final String: O(output), not O(page), and the scan STOPS at the
  * abstract line instead of materializing the page tail.
  */
object MarkdownSlicer {

  private val navKeywords = Seq(
    "Skip to Main Content", "Physical Review", "All Journals",
    "Highlights", "Recent", "Collections")

  private val navKeywordsVariant = navKeywords ++ Seq("Authors", "RSS")

  private val shareButtons =
    Seq("X", "Facebook", "Mendeley", "LinkedIn", "Reddit", "Sina Weibo")

  // ---- index-range line primitives (no String allocation) ----

  /** End (exclusive) of the line starting at `s`: index of the next
    * '\n', or the string end.
    */
  private def lineEnd(md: String, s: Int): Int = {
    val i = md.indexOf('\n', s)
    if (i < 0) md.length else i
  }

  /** First index >= s with a non-whitespace char, bounded by e
    * (String.strip semantics: Character.isWhitespace — all Unicode
    * whitespace is BMP, so the char-based test is exact).
    */
  private def stripStart(md: String, s: Int, e: Int): Int = {
    var i = s
    while (i < e && Character.isWhitespace(md.charAt(i))) i += 1
    i
  }

  /** End (exclusive) of the stripped range [ss, e). */
  private def stripEnd(md: String, ss: Int, e: Int): Int = {
    var i = e
    while (i > ss && Character.isWhitespace(md.charAt(i - 1))) i -= 1
    i
  }

  private def regionEquals(md: String, s: Int, e: Int, lit: String): Boolean =
    e - s == lit.length && md.regionMatches(s, lit, 0, lit.length)

  private def regionStartsWith(md: String, s: Int, e: Int, lit: String): Boolean =
    e - s >= lit.length && md.regionMatches(s, lit, 0, lit.length)

  /** Bounded containment scan — java's indexOf would run past `e` to the
    * end of a 2 MB page on every miss. Exact for '\n'-free literals
    * (every literal here), since an occurrence crossing the line end
    * would have to contain the newline.
    */
  private def regionContains(md: String, s: Int, e: Int, lit: String): Boolean = {
    val n = lit.length
    if (n == 0) return true
    val c0 = lit.charAt(0)
    val last = e - n
    var i = s
    while (i <= last) {
      if (md.charAt(i) == c0 && md.regionMatches(i, lit, 0, n)) return true
      i += 1
    }
    false
  }

  private def isNavigation(md: String, s: Int, e: Int, kws: Seq[String]): Boolean =
    kws.exists(regionContains(md, s, e, _))

  private def isShareButton(md: String, ss: Int, se: Int): Boolean =
    shareButtons.exists(regionEquals(md, ss, se, _))

  /** Skip predicate of the clean variant (aps_clean_extractor.py:72-104)
    * over the raw line [s, e) and its stripped range [ss, se). Checks
    * mix stripped-range equality with raw-range containment — the mix is
    * load-bearing for golden equality. (The stripped-startsWith "  *"
    * arm is replicated from the reference even though a stripped range
    * cannot start with a space — kept inert for fidelity.)
    */
  private def shouldSkip(md: String, s: Int, e: Int, ss: Int, se: Int): Boolean = {
    if (regionEquals(md, ss, se, "open icon close icon") ||
      regionEquals(md, ss, se, "Shareopen icon close icon")) true
    else if (isShareButton(md, ss, se)) true
    else if (regionStartsWith(md, ss, se, "  *") &&
      isShareButton(md, stripStart(md, ss + 4, se), stripEnd(md, stripStart(md, ss + 4, se), se))) true
    else if (regionContains(md, s, e, "[PDF]") &&
      (regionContains(md, s, e, "Share") ||
        shareButtons.exists(regionContains(md, s, e, _)))) true
    else if (regionContains(md, s, e, "altmetric.com") ||
      regionEquals(md, ss, se, "[ ]")) true
    else if (regionEquals(md, ss, se, "Export Citation") ||
      regionEquals(md, ss, se, "Show metricsopen icon close icon")) true
    else false
  }

  /** Filter predicate of the content variant
    * (aps_content_extractor.py:75-110) — all checks on the stripped
    * range [ss, se).
    */
  private def shouldFilter(md: String, ss: Int, se: Int): Boolean = {
    if (regionStartsWith(md, ss, se, "![") ||
      (regionStartsWith(md, ss, se, "  *") && regionContains(md, ss, se, "!["))) true
    else if (isShareButton(md, ss, se)) true
    else if (regionStartsWith(md, ss, se, "  *") &&
      shareButtons.exists(regionContains(md, ss, se, _))) true
    else if (regionEquals(md, ss, se, "open icon close icon") ||
      regionEquals(md, ss, se, "Shareopen icon close icon") ||
      regionEquals(md, ss, se, "Show metricsopen icon close icon") ||
      regionEquals(md, ss, se, "Export Citation")) true
    else if (regionContains(md, ss, se, "altmetric.com") ||
      regionEquals(md, ss, se, "[ ]")) true
    else if (regionStartsWith(md, ss, se, "[PDF]") &&
      regionContains(md, ss, se, "Shareopen icon close icon")) true
    else false
  }

  /** Start offset of the title line: first line whose stripped range
    * starts with "# " and whose RAW line carries no nav keyword.
    */
  private def findTitleStart(md: String, kws: Seq[String]): Int = {
    var s = 0
    while (s <= md.length) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      if (regionStartsWith(md, ss, stripEnd(md, ss, e), "# ") &&
        !isNavigation(md, s, e, kws)) return s
      if (e == md.length) return -1
      s = e + 1
    }
    -1
  }

  /** Clean variant: returns the sliced content, or None when the title,
    * abstract marker, or abstract body is missing.
    */
  def slice(markdown: String): Option[String] = {
    val md = markdown
    val titleStart = findTitleStart(md, navKeywords)
    if (titleStart < 0) return None

    // find "## Abstract" (stripped equality), then the first stripped
    // line after it that is longer than 100 chars (P21 threshold)
    var abstractLine = -1
    var abstractContentEnd = -1
    var s = titleStart
    var done = false
    while (!done && s <= md.length) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      val se = stripEnd(md, ss, e)
      if (abstractLine < 0) {
        if (regionEquals(md, ss, se, "## Abstract")) abstractLine = s
      } else if (se - ss > 100) {
        abstractContentEnd = e
        done = true
      }
      if (e == md.length) done = true else s = e + 1
    }
    if (abstractLine < 0 || abstractContentEnd < 0) return None

    // emit [titleStart .. abstractContent] inclusive, noise-filtered —
    // the single output builder is the only page-sized allocation
    val sb = new java.lang.StringBuilder(abstractContentEnd - titleStart + 1)
    s = titleStart
    while (s <= abstractContentEnd) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      val se = stripEnd(md, ss, e)
      if (!shouldSkip(md, s, e, ss, se)) {
        if (sb.length > 0) sb.append('\n')
        sb.append(md, s, e)
      }
      s = e + 1
    }
    Some(sb.toString.strip())
  }

  /** Content variant: collects from the title, stops at the first image
    * line after "## Abstract", filters noise, collapses empty-line runs
    * (P24, fused into the emit loop — collapsing a joined copy
    * afterwards would double the output allocation).
    */
  def sliceToImage(markdown: String): Option[String] = {
    val md = markdown
    val titleStart = findTitleStart(md, navKeywordsVariant)
    if (titleStart < 0) return None

    // confirm an abstract header exists after the title (guard parity
    // with the reference: no abstract -> no content)
    var hasAbstract = false
    var s = titleStart
    while (!hasAbstract && s <= md.length) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      if (regionStartsWith(md, ss, stripEnd(md, ss, e), "## Abstract")) hasAbstract = true
      if (e == md.length) s = md.length + 1 else s = e + 1
    }
    if (!hasAbstract) return None

    val sb = new java.lang.StringBuilder(256)
    var inAbstract = false
    var prevEmpty = false
    var firstOut = true
    var stop = false
    s = titleStart
    while (!stop && s <= md.length) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      val se = stripEnd(md, ss, e)
      var emit = false
      if (regionStartsWith(md, ss, se, "## Abstract")) {
        emit = true
        inAbstract = true
      } else if (inAbstract &&
        (regionStartsWith(md, ss, se, "![") ||
          (regionStartsWith(md, ss, se, "  *") && regionContains(md, ss, se, "![")))) {
        stop = true
      } else if (!shouldFilter(md, ss, se)) {
        emit = true
      }
      if (emit) {
        val empty = ss == se
        if (!empty || !prevEmpty) {
          if (!firstOut) sb.append('\n')
          sb.append(md, s, e)
          firstOut = false
        }
        prevEmpty = empty
      }
      if (e == md.length) stop = true else s = e + 1
    }
    Some(sb.toString.strip())
  }

  /** P24: runs of blank lines -> one (aps_content_extractor.py:134-151).
    * Public single-pass form, also used standalone by the line-machine
    * byte-golden checks.
    */
  def collapseEmptyLines(content: String): String = {
    val md = content
    val sb = new java.lang.StringBuilder(md.length)
    var prevEmpty = false
    var first = true
    var s = 0
    var done = false
    while (!done && s <= md.length) {
      val e = lineEnd(md, s)
      val ss = stripStart(md, s, e)
      val empty = ss == stripEnd(md, ss, e)
      if (!empty || !prevEmpty) {
        if (!first) sb.append('\n')
        sb.append(md, s, e)
        first = false
      }
      prevEmpty = empty
      if (e == md.length) done = true else s = e + 1
    }
    sb.toString.strip()
  }
}
