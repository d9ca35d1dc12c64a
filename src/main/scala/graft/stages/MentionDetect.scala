package graft.stages

import graft.model._
import graft.rules._
import org.apache.spark.sql.Dataset
import scala.util.{Failure, Success, Try}

/** Mention detection: Dataset[SourceFile] -> Dataset[PaperRecord] ->
  * Dataset[Triple].
  *
  * One mapPartitions pass; rule maps (compiled regexes) live in JVM-wide
  * objects, so pattern-compilation cost is paid once per executor — the
  * Spark analog of the reference's browser-singleton reuse
  * (aps_extractor.py:14-50). Dispatch on the `lang` shape tag mirrors the
  * URL-substring dispatch of main.py:167-179; unknown shapes and parse
  * failures land in the quarantine side-output (E2 semantics:
  * aps_extractor.py:401-418) instead of failing the job.
  */
object MentionDetect {

  def parseOne(f: SourceFile): Either[QuarantineRow, PaperRecord] = {
    Try {
      f.lang match {
        case "aps-md" =>
          // Raw crawl markdown is sliced first; already-sliced pages pass
          // through the slicer unchanged (it is a fixpoint for them).
          ApsRules.parseRaw(f.content, f.path)
            .toRight(QuarantineRow(f.repo, f.path, f.lang, "no paper body found"))
        case "aps-html" => Right(ApsHtmlRules.parse(f.content, f.path))
        case "nature-html" => Right(NatureRules.parse(f.content, f.path))
        case "science-html" => Right(ScienceRules.parse(f.content, f.path))
        case other => Left(QuarantineRow(f.repo, f.path, f.lang, s"unknown shape tag: $other"))
      }
    } match {
      case Success(r) => r
      case Failure(e) => Left(QuarantineRow(f.repo, f.path, f.lang, String.valueOf(e)))
    }
  }

  /** Page docId WITHOUT the full parse — only the per-shape identity
    * rule (canonical URL / DOI / path fallback). The flagship entry's
    * dedup bridge needs just (pageId -> docId); routing it through
    * [[parseOne]] re-ran the whole author/affiliation extraction per
    * page, adding a third full corpus parse on top of the two
    * Pipeline.run performs by design. None where parseOne quarantines
    * on identity grounds (unknown shape tag, no aps-md body, identity
    * rule throws); a page whose identity extracts but whose FULL parse
    * would fail mid-extraction still yields its docId here — acceptable
    * for the bridge (its triples never materialize, so the id only
    * feeds page counting), parity otherwise spec-gated over the fixture
    * corpus in GoldenTripleSpec.
    */
  def docIdOf(f: SourceFile): Option[String] =
    Try {
      f.lang match {
        case "aps-md" =>
          MarkdownSlicer.slice(f.content).map(ApsRules.docIdOfSliced(_, f.path))
        case "aps-html" => Some(ApsHtmlRules.docIdOf(f.content, f.path))
        case "nature-html" => Some(NatureRules.canonicalUrl(f.content).getOrElse(f.path))
        case "science-html" => Some(ScienceRules.canonicalUrl(f.content).getOrElse(f.path))
        case _ => None
      }
    }.toOption.flatten

  def records(files: Dataset[SourceFile]): Dataset[PaperRecord] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[PaperRecord]
    files.mapPartitions(_.map(parseOne).collect { case Right(r) => r })
  }

  def quarantine(files: Dataset[SourceFile]): Dataset[QuarantineRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[QuarantineRow]
    files.mapPartitions(_.map(parseOne).collect { case Left(q) => q })
  }

  def triples(records: Dataset[PaperRecord]): Dataset[Triple] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Triple]
    records.flatMap(TripleEmit.emit)
  }

  /** Fused extraction: SourceFile -> Triple in ONE mapPartitions pass.
    *
    * The staged form (records(...) then triples(...)) pays the
    * ExpressionEncoder round-trip of the deeply nested PaperRecord
    * (Seq[Author] / Map / Option fields) per row — measured ~20x the
    * actual parse cost. The fused form keeps PaperRecord as a plain JVM
    * object inside the partition and only encodes the flat 4-string
    * Triple rows. Use this whenever the record itself is not needed
    * downstream.
    */
  def triplesDirect(files: Dataset[SourceFile]): Dataset[Triple] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Triple]
    files.mapPartitions(_.flatMap(f => parseOne(f) match {
      case Right(r) => TripleEmit.emit(r)
      case Left(_) => Nil
    }))
  }

  /** Fused mention stream (same rationale as [[triplesDirect]]). */
  def mentionsDirect(files: Dataset[SourceFile]): Dataset[Mention] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Mention]
    files.mapPartitions(_.flatMap(f => parseOne(f) match {
      case Right(r) => Pipeline.mentionsOfRecord(r)
      case Left(_) => Nil
    }))
  }
}
