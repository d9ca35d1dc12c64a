package graft

import graft.fixtures.FixtureCorpus
import graft.queries.PinnedOracles
import org.scalatest.funsuite.AnyFunSuite

/** Pin-regeneration audit gate (round-4 VERDICT #7): 23 VALUES pins now
  * gate the engine's correctness, so regenerating one must leave a
  * logged reason. tools/pin_oracle.py refuses to write without
  * `--reason` and appends (date, name, sha256, reason) to
  * pins/CHANGELOG.tsv; this spec asserts every committed pin's sha256
  * equals its LATEST changelog entry. A pin quietly re-captured — or
  * hand-edited — without the tool therefore fails `sbt test`, which is
  * what lets a later round distinguish "regenerated deliberately for
  * the avg-pool change" from "re-captured to hide a regression".
  */
class PinAuditSpec extends AnyFunSuite {

  private def sha256(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map(b => f"$b%02x").mkString

  private lazy val changelog: Seq[(String, String, String, String)] =
    FixtureCorpus.resourceText("/graft/pins/CHANGELOG.tsv")
      .linesIterator.filter(_.nonEmpty).map { line =>
        val parts = line.split("\t", -1)
        assert(parts.length == 4, s"malformed changelog line: $line")
        (parts(0), parts(1), parts(2), parts(3))
      }.toSeq

  test("changelog lines are well-formed (date, name, sha256, non-empty reason)") {
    assert(changelog.nonEmpty)
    changelog.foreach { case (date, name, sha, reason) =>
      assert(date.matches("\\d{4}-\\d{2}-\\d{2}"), s"bad date for $name: $date")
      assert(sha.matches("[0-9a-f]{64}"), s"bad sha for $name")
      assert(reason.trim.nonEmpty, s"empty reason for $name on $date")
    }
  }

  test("every committed pin matches its latest changelog entry") {
    val latest: Map[String, String] =
      changelog.map { case (_, name, sha, _) => name -> sha }.toMap // last wins
    val unaudited = PinnedOracles.names.flatMap { n =>
      val in = getClass.getResourceAsStream(s"/graft/pins/$n.sql")
      assert(in != null, s"missing pin resource $n.sql")
      val actual = try sha256(in.readAllBytes()) finally in.close()
      latest.get(n) match {
        case Some(logged) if logged == actual => None
        case Some(_) => Some(s"$n (hash differs from latest changelog entry — " +
          "regenerate via tools/pin_oracle.py --reason '...')")
        case None => Some(s"$n (no changelog entry at all)")
      }
    }
    assert(unaudited.isEmpty,
      s"pins regenerated/edited without a logged reason: ${unaudited.mkString("; ")}")
  }

  test("every changelog entry names a registered pin") {
    val known = PinnedOracles.names.toSet
    val stray = changelog.map(_._2).filterNot(known.contains).distinct
    assert(stray.isEmpty, s"changelog entries for unregistered pins: $stray")
  }
}
