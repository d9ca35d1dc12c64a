package graft.rules

import graft.model.{PaperRecord, Triple}

/** Triple emission: PaperRecord -> ordered-free (subj, pred, obj) set.
  *
  * Emission rules (FIXTURES.md §3 + SURVEY.md §2.8 E3 decision):
  * a missing field emits NO triple (the reference's "Unknown Title" /
  * "N/A" defaults are not emitted); every string passes P14
  * whitespace-normalization exactly once, at emit.
  *
  * Predicates: hasTitle publishedIn publishedOn hasAbstract hasDOI
  * hasAuthor hasRole isCorresponding affiliatedWith locatedIn
  * hasContactEmail hasContribution hasEqualContribution hasNote
  * hasCreditRole hasFunding.
  */
object TripleEmit {

  def authorSubj(name: String): String = s"author:${Text.cleanWs(name)}"
  def instSubj(aff: String): String = s"inst:${Text.cleanWs(aff)}"

  def emit(r: PaperRecord): Seq[Triple] = {
    val doc = r.docId
    def t(subj: String, pred: String, obj: String): Option[Triple] = {
      val o = Text.cleanWs(obj)
      if (o.isEmpty) None else Some(Triple(doc, Text.cleanWs(subj), pred, o))
    }

    val docTriples = Seq(
      r.title.flatMap(t(doc, "hasTitle", _)),
      r.journalName.flatMap(t(doc, "publishedIn", _)),
      r.doi.flatMap(t(doc, "hasDOI", _)),
      r.publicationDate.flatMap(d => d.isoDate.orElse(d.formattedDate))
        .flatMap(t(doc, "publishedOn", _)),
      r.abstractText.flatMap(t(doc, "hasAbstract", _)),
      r.contributions.flatMap(t(doc, "hasContribution", _))).flatten ++
      r.equalContributions.flatMap(t(doc, "hasEqualContribution", _)) ++
      r.funding.flatMap(t(doc, "hasFunding", _)) ++
      r.notes.toSeq.sortBy(_._1).flatMap { case (label, text) =>
        t(doc, "hasNote", s"$label: $text")
      }

    val authorTriples = r.authors.flatMap { a =>
      val subj = authorSubj(a.name)
      Seq(
        t(doc, "hasAuthor", subj),
        t(subj, "hasRole", a.role),
        if (a.isCorresponding) t(subj, "isCorresponding", "true") else None,
        a.email.flatMap(t(subj, "hasContactEmail", _))).flatten ++
        a.affiliations.flatMap(aff => t(subj, "affiliatedWith", instSubj(aff))) ++
        a.creditRoles.flatMap(t(subj, "hasCreditRole", _))
    }

    val instTriples = r.authors.flatMap(_.affiliations).distinct.flatMap { aff =>
      val c = AffiliationNormalizer.country(Text.cleanWs(aff))
      if (c.nonEmpty) t(instSubj(aff), "locatedIn", c) else None
    }

    (docTriples ++ authorTriples ++ instTriples).distinct
  }
}
