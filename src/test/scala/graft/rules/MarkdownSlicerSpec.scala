package graft.rules

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.FixtureCorpus.resourceText

/** Byte-golden tests for the markdown line machine against the
  * reference's committed input/output pairs (SURVEY.md §5.1):
  * result.md -> extracted_content.md and
  * result_f961f7e5.md -> extracted_content_f961f7e5.md were both
  * produced by the clean variant (verified against the reference).
  */
class MarkdownSlicerSpec extends AnyFunSuite {

  private def golden(name: String): String = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden $name")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("clean slice of pyzr-jmvw raw page is byte-identical to committed golden") {
    val raw = resourceText("/graft/fixtures/aps_raw_pyzr-jmvw.md")
    assert(MarkdownSlicer.slice(raw).contains(golden("sliced_pyzr-jmvw.md").strip()))
  }

  test("clean slice of 9pbp-jzr9 raw page is byte-identical to committed golden") {
    val raw = resourceText("/graft/fixtures/aps_raw_9pbp-jzr9.md")
    assert(MarkdownSlicer.slice(raw).contains(golden("sliced_9pbp-jzr9.md").strip()))
  }

  test("slicer is a fixpoint on already-sliced content") {
    val sliced = resourceText("/graft/fixtures/aps_sliced_7x71-8j7k.md")
    assert(MarkdownSlicer.slice(sliced).contains(sliced.strip()))
  }

  test("slicer returns None when title or abstract is missing") {
    assert(MarkdownSlicer.slice("no title here\njust text").isEmpty)
    assert(MarkdownSlicer.slice("# A Title\nbut no abstract").isEmpty)
    assert(MarkdownSlicer.slice("# A Title\n## Abstract\nshort").isEmpty)
  }

  test("content variant stops at the first image after the abstract") {
    val md = Seq(
      "# Title of Paper",
      "[A B](https://journals.aps.org/search/field/author/A%20B)1",
      "## Abstract",
      "x" * 150,
      "![figure](fig1.png)",
      "more text after image").mkString("\n")
    val out = MarkdownSlicer.sliceToImage(md).get
    assert(out.contains("x" * 150))
    assert(!out.contains("more text after image"))
    assert(!out.contains("![figure]"))
  }

  test("collapseEmptyLines keeps single blank lines only") {
    assert(MarkdownSlicer.collapseEmptyLines("a\n\n\n\nb") == "a\n\nb")
  }
}
