package graft.fixtures

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import graft.model.SourceFile
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic fixture corpus (FIXTURES.md §2/§6): the journal fixture
  * pages grafted onto the (repo, path, commit, lang, content) source
  * table, replicated at scale with one deliberately hot repo (~30% of
  * rows) to exercise skew handling. No wall-clock, no RNG — commit ids
  * are content-addressed hashes, replication keys are index-derived.
  */
object FixtureCorpus {

  final case class Fixture(id: String, lang: String, resource: String)

  val fixtures: Seq[Fixture] = Seq(
    Fixture("10.1103/pyzr-jmvw", "aps-md", "/graft/fixtures/aps_raw_pyzr-jmvw.md"),
    Fixture("10.1103/9pbp-jzr9", "aps-md", "/graft/fixtures/aps_raw_9pbp-jzr9.md"),
    Fixture("10.1103/7x71-8j7k", "aps-md", "/graft/fixtures/aps_sliced_7x71-8j7k.md"),
    Fixture("https://www.nature.com/articles/s41567-025-02944-3", "nature-html",
      "/graft/fixtures/nature_s41567-025-02944-3.html"),
    Fixture("https://www.science.org/doi/10.1126/scitranslmed.test01", "science-html",
      "/graft/fixtures/science_synthetic.html"),
    Fixture("10.1103/PhysRevLett.130.267401", "aps-html",
      "/graft/fixtures/aps_html_detailed.html"),
    Fixture("10.1103/PhysRevB.99.000001", "aps-html",
      "/graft/fixtures/aps_html_meta.html"))

  def resourceText(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing fixture resource $path")
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  // MessageDigest.getInstance contends on the JCA provider map across
  // executor threads — keep one digest per thread for the hot path.
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  def sha256Hex(s: String): String = {
    val md = digests.get()
    md.reset()
    md.digest(s.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
  }

  private def commitOf(repo: String, path: String): String =
    // synthetic commit id — cheap non-crypto hash is enough
    f"${scala.util.hashing.MurmurHash3.stringHash(s"$repo/$path", 7)}%08x${s"$repo/$path".length}%04x"

  /** The base rows — one per fixture page (7: three aps-md, one
    * nature-html, one science-html, two aps-html). Paths embed the
    * fixture id so extraction provenance survives replication.
    */
  def baseRows: Seq[SourceFile] = fixtures.map { f =>
    val repo = f.lang match {
      case "aps-md" | "aps-html" => "journals/aps"
      case "nature-html" => "nature/articles"
      case _ => "science/articles"
    }
    val path = s"${f.id.replace("https://", "").replace('/', '_')}.page"
    SourceFile(repo, path, commitOf(repo, path), f.lang, resourceText(f.resource))
  }

  /** Skew shape (FIXTURES.md §6): ~30% of rows land in one hot repo,
    * the rest spread over 20 cold repos; every 1000th row is a "giant
    * file" — the page body with 50 copies of itself appended (~1-2 MB),
    * the single-hot-key skew the north rule names. The slicer stops at
    * the first abstract, so a giant row emits the same triples as its
    * base page (asserted in GoldenTripleSpec).
    */
  val GiantEvery = 1000
  val GiantFactor = 50

  private def rowAt(base: IndexedSeq[SourceFile], i: Int): SourceFile = {
    // Giant rows are always the raw APS page: the slicer's title..abstract
    // window makes the 50x-appended body emit exactly the base triples.
    val giant = i > 0 && i % GiantEvery == 0
    val b = if (giant) base.head else base(i % base.length)
    val repo = if (i % 10 < 3) "journals/hot-repo" else s"repo-${i % 20}"
    val path = s"${b.path.stripSuffix(".page")}_rep$i.page"
    val content =
      if (giant) b.content + ("\n" + b.content) * GiantFactor
      else b.content
    SourceFile(repo, path, commitOf(repo, path), b.lang, content)
  }

  def corpusRows(n: Int): Iterator[SourceFile] = {
    val base = baseRows.toIndexedSeq
    Iterator.range(0, n).map(rowAt(base, _))
  }

  def corpus(spark: SparkSession, n: Int, partitions: Int): Dataset[SourceFile] = {
    import spark.implicits._
    // Distributed synthesis: ship only the small base pages to executors
    // and materialize row i on its own partition — no driver-side corpus.
    val base = baseRows.toIndexedSeq
    spark.range(0, n.toLong, 1L, partitions).mapPartitions { it =>
      it.map(i => rowAt(base, i.toInt))
    }
  }

  /** (path -> sha256) manifest for the ingest invariant at corpus size n. */
  def manifest(n: Int): Map[String, String] = {
    val base = baseRows.toIndexedSeq
    Iterator.range(0, n).map { i =>
      val r = rowAt(base, i)
      r.path -> sha256Hex(r.content)
    }.toMap
  }
}
