package graft.rules

import java.util.regex.Pattern
import graft.model.{Author, PaperRecord, PubDate}
import scala.collection.mutable

/** Nature rule map: article HTML -> PaperRecord.
  *
  * Re-expresses the CSS-selector extraction of parse_nature_authors
  * (nature_extractor.py:153-247) as compiled-regex extraction over the
  * page text. Selector semantics covered:
  *
  *  - P1  title: h1.c-article-title (miss -> None; the reference's
  *        "Unknown Title" default is dropped at emission per E3)
  *  - P4  journal: meta[citation_journal_title] -> meta[og:site_name] ->
  *        .c-journal-title/... with generic-value rejection (F3),
  *        fallback "Nature"
  *  - P7  date: li.c-article-identifiers__item time[datetime] ->
  *        {iso_date, formatted_date}
  *  - P10 abstract: #Abs1-content p with <sup> citation markers dropped
  *  - P13 contributions: h3#contributions + following p
  *  - J1  author <-> affiliation join: affiliation list items carry an
  *        address and an author list (split on ",  " / " & ",
  *        nature_extractor.py:195); inverted into affiliations-per-author
  *  - J2  corresponding set: #corresponding-author-list anchor texts
  *  - W1  role assignment (nature_extractor.py:220-228), exact strings
  *  - A1  countries: set of normalized affiliation countries (we emit
  *        sorted — SURVEY.md §5.4 determinism rule)
  */
object NatureRules {

  private def tagStrip(html: String): String = Text.tagStrip(html)

  private val titlePat = Pattern.compile(
    """<h1[^>]*class="[^"]*c-article-title[^"]*"[^>]*>(.*?)</h1>""", Pattern.DOTALL)

  private val metaJournalPat = Pattern.compile(
    """<meta[^>]*name="citation_journal_title"[^>]*content="([^"]*)"""")
  private val metaSitePat = Pattern.compile(
    """<meta[^>]*property="og:site_name"[^>]*content="([^"]*)"""")
  private val journalClassPats = Seq(
    "c-journal-title", "journal-title", "c-header__title", "c-header__nav-link--home")
    .map(c => Pattern.compile(s"""<[^>]*class="[^"]*$c[^"]*"[^>]*>(.*?)</""", Pattern.DOTALL))

  private val timePat = Pattern.compile(
    """<li[^>]*class="[^"]*c-article-identifiers__item[^"]*"[^>]*>.*?<time[^>]*datetime="([^"]*)"[^>]*>(.*?)</time>""",
    Pattern.DOTALL)

  private val abstractPat = Pattern.compile(
    """<div[^>]*id="Abs1-content"[^>]*>\s*<p>(.*?)</p>""", Pattern.DOTALL)
  private val supPat = Pattern.compile("""<sup>.*?</sup>""", Pattern.DOTALL)

  private val contributionsPat = Pattern.compile(
    """<h3[^>]*id="contributions"[^>]*>.*?</h3>\s*<p>(.*?)</p>""", Pattern.DOTALL)

  private val equalContribPat = Pattern.compile(
    """<li[^>]*class="[^"]*c-article-author-information__item[^"]*"[^>]*>(.*?)</li>""",
    Pattern.DOTALL)

  private val affItemPat = Pattern.compile(
    """<li[^>]*id="(Aff[^"]*)"[^>]*>.*?c-article-author-affiliation__address[^>]*>(.*?)</p>.*?c-article-author-affiliation__authors-list[^>]*>(.*?)</p>""",
    Pattern.DOTALL)

  private val corrListPat = Pattern.compile(
    """<[^>]*id="corresponding-author-list"[^>]*>(.*?)</(?:div|p)>""", Pattern.DOTALL)
  private val anchorPat = Pattern.compile("""<a[^>]*>(.*?)</a>""", Pattern.DOTALL)

  private val authorNamePat = Pattern.compile(
    """<span[^>]*class="[^"]*js-search-name[^"]*"[^>]*>(.*?)</span>""", Pattern.DOTALL)

  // author-list split: re.split(r',\s*|\s*&\s*') (nature_extractor.py:195)
  private val authorSplit = Pattern.compile(""",\s*|\s*&\s*""")

  private val ogUrlPat = Pattern.compile(
    """<meta[^>]*property="og:url"[^>]*content="([^"]*)"""")

  private def firstGroup(p: Pattern, html: String): Option[String] = {
    val m = p.matcher(html)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Canonical page url (og:url) — the page identity the reference keys
    * its record on (nature_extractor.py:241 uses the request url).
    */
  def canonicalUrl(html: String): Option[String] =
    firstGroup(ogUrlPat, html).map(_.trim).filter(_.nonEmpty)

  private def allMatches(p: Pattern, html: String): Seq[Array[String]] = {
    val m = p.matcher(html)
    val out = mutable.ArrayBuffer.empty[Array[String]]
    while (m.find()) out += (1 to m.groupCount()).map(m.group).toArray
    out.toSeq
  }

  def journalName(html: String): String = {
    val generic = Set("Nature", "nature.com")
    // meta content is entity-encoded like all HTML (decode '&amp;' etc.)
    firstGroup(metaJournalPat, html).map(v => Text.decodeEntities(v).trim)
      .filter(v => v.nonEmpty && !generic(v))
      .orElse(firstGroup(metaSitePat, html).map(v => Text.decodeEntities(v).trim)
        .filter(v => v.nonEmpty && !generic(v)))
      .orElse(journalClassPats.iterator
        .flatMap(p => firstGroup(p, html)).map(tagStrip)
        .find(v => v.nonEmpty && !generic(v)))
      .getOrElse("Nature")
  }

  def parse(html: String, sourcePath: String): PaperRecord = {
    val docUrl = canonicalUrl(html).getOrElse(sourcePath)
    val title = firstGroup(titlePat, html).map(tagStrip).filter(_.nonEmpty)

    val pubDate = {
      val m = timePat.matcher(html)
      if (m.find()) Some(PubDate(Some(m.group(1).trim), Some(tagStrip(m.group(2)))))
      else None
    }

    val abstractText = firstGroup(abstractPat, html)
      .map(a => tagStrip(supPat.matcher(a).replaceAll("")))
      .filter(_.nonEmpty)

    val contributions = firstGroup(contributionsPat, html).map(tagStrip).filter(_.nonEmpty)
    val equalContribs = allMatches(equalContribPat, html).map(g => tagStrip(g(0)))
      .filter(_.nonEmpty)

    // J1 build side: affiliation item -> (address, authors-in-affiliation)
    val authorAff = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    val countries = mutable.SortedSet.empty[String]
    allMatches(affItemPat, html).foreach { g =>
      val address = tagStrip(g(1))
      val c = AffiliationNormalizer.country(address)
      if (c.nonEmpty) countries += c
      authorSplit.split(tagStrip(g(2))).map(_.trim).filter(_.nonEmpty).foreach { name =>
        authorAff.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += address
      }
    }

    // J2 build side: corresponding-author name set
    val corresponding: Set[String] = firstGroup(corrListPat, html)
      .map(seg => allMatches(anchorPat, seg).map(g => tagStrip(g(0))).toSet)
      .getOrElse(Set.empty)

    val authors = allMatches(authorNamePat, html).map(g => tagStrip(g(0)))
      .zipWithIndex.map { case (name, idx) =>
        val isCorr = corresponding.contains(name)
        // W1 exact role strings (nature_extractor.py:220-228)
        val role =
          if (idx == 0 && isCorr) "First/Corresponding Author"
          else if (isCorr) "Corresponding Author"
          else if (idx == 0) "First Author"
          else "Other Author"
        Author(name, idx, role, authorAff.get(name).map(_.toSeq).getOrElse(Seq.empty),
          isCorr, Seq.empty, Seq.empty, None)
      }

    PaperRecord(
      docId = docUrl,
      journalTag = "nature-html",
      title = title,
      journalName = Some(journalName(html)),
      url = Some(docUrl),
      doi = None,
      publicationDate = pubDate,
      abstractText = abstractText,
      contributions = contributions,
      equalContributions = equalContribs,
      countries = countries.toSeq,
      authors = authors,
      notes = Map.empty)
  }
}
