package graft.rules

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.FixtureCorpus.resourceText

/** The 4-strategy author-parse fallback chain (E1) + J4/F5/F6/L2. */
class ApsHtmlRulesSpec extends AnyFunSuite {

  test("strategy 1 (detailed DOM): footnote joins, contact role, countries") {
    val r = ApsHtmlRules.parse(resourceText("/graft/fixtures/aps_html_detailed.html"), "p")
    assert(r.docId == "10.1103/PhysRevLett.130.267401")
    assert(r.title.contains("Excitonic Effects in Two-Dimensional Semiconductors"))
    assert(r.journalName.contains("Physical Review Letters"))
    assert(r.publicationDate.flatMap(_.isoDate).contains("2023-06-28"))
    assert(r.authors.map(_.name) == Seq("Anna Kowalski", "Ben Okafor", "Chen Wei"))
    val anna = r.authors.head
    assert(anna.role == "First/Corresponding Author" && anna.isCorresponding)
    assert(anna.creditRoles == Seq("Contact author: anna.kowalski@tuw.edu.pl"))
    assert(r.authors(1).affiliations.size == 2)
    assert(r.countries == Seq("Poland", "Singapore"))
  }

  test("strategy 3 (meta zip, J4): equal-length author/institution pairing") {
    val r = ApsHtmlRules.parse(resourceText("/graft/fixtures/aps_html_meta.html"), "p")
    assert(r.docId == "10.1103/PhysRevB.99.000001")
    assert(r.publicationDate.flatMap(_.isoDate).contains("2024-02-12"))
    assert(r.authors.map(a => (a.name, a.affiliations)) == Seq(
      ("Dana Petrov", Seq("Department of Physics, University of Toronto, Toronto, Canada")),
      ("Emil Haugen", Seq("Center for Quantum Materials, University of Oslo, Oslo, Norway"))))
    assert(r.abstractText.exists(_.startsWith("We report the observation")))
  }

  test("J4 guard: mismatched meta lengths -> authors with no affiliations") {
    val html =
      """<meta name="citation_author" content="A One"/>
        |<meta name="citation_author" content="B Two"/>
        |<meta name="citation_author_institution" content="Only Inst"/>""".stripMargin
    val r = ApsHtmlRules.parse(html, "p")
    assert(r.authors.map(_.name) == Seq("A One", "B Two"))
    assert(r.authors.forall(_.affiliations.isEmpty))
  }

  test("strategy 2 (text pattern): capitalized-name regex capped at 10 (L2)") {
    val names = (1 to 15).map(i => s"Aaa$i Bbb$i")
    // names like 'Aaa1 Bbb1' contain digits — use letter-only names
    val letterNames = Seq("Alice Smith", "Bob Jones", "Carol White") ++
      (1 to 12).map(i => s"Name${('a' + i).toChar.toUpper}xx Person${('a' + i).toChar.toUpper}yy")
    val html = s"""<div class="authors"><p>${letterNames.mkString(", ")}</p></div>"""
    val r = ApsHtmlRules.parse(html, "p")
    assert(r.authors.nonEmpty && r.authors.size <= 10)
    assert(r.authors.head.name == "Alice Smith")
  }

  test("strategy 4 (generic links): >=2-word filter (F5) and cap (L2)") {
    val html = (1 to 12).map(i => s"""<a href="/profile/author/$i">Person Number$i</a>""")
      .mkString("\n") + """<a href="/profile/author/x">Singleword</a>"""
    val r = ApsHtmlRules.parse(html, "p")
    assert(r.authors.size == 10) // capped before the 2-word filter, like the reference
    assert(r.authors.forall(_.name.split(" ").length >= 2))
  }

  test("E1 only-if-empty: detailed strategy wins when present") {
    val r = ApsHtmlRules.parse(resourceText("/graft/fixtures/aps_html_detailed.html"), "p")
    // meta tags absent -> strategy 1 output, with affiliations attached
    assert(r.authors.exists(_.affiliations.nonEmpty))
  }
}
