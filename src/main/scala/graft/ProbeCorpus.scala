package graft

/** Deterministic synthetic-corpus building blocks shared by the dedup
  * and incremental scale probes — ONE copy of the magic constants
  * (seed multipliers, word counts, vocab size, mutation-position
  * formula), so a tweak to one probe's skew model cannot silently
  * diverge the other probe's documented corpus shape (the two
  * generators were byte-identical hand-maintained twins).
  */
object ProbeCorpus {

  /** 40 identical nav lines — the giant-bucket boilerplate page. */
  val NavTemplate: String =
    (1 to 40).map(i => s"navitem$i home search login").mkString(" ")

  /** 30-word shared header carried by 30% of unique docs
    * (partial-signature banded-join skew, no true dups).
    */
  val BoilerPrefix: String = (1 to 30).map(i => s"sitehdr$i").mkString(" ")

  /** A cluster's 240 base words, seeded by cluster id. */
  def clusterBase(cid: Long): Array[String] = {
    val rnd = new scala.util.Random(cid * 2654435761L)
    Array.fill(240)("w" + rnd.nextInt(500000))
  }

  /** Near-dup cluster member text: replaces k base words at
    * deterministic scattered positions (seeded by cid and salt) with
    * `tag`-prefixed member-unique tokens — spanning exact dups (k=0)
    * down to pairs straddling the 0.8 verification threshold. The tag
    * keeps different probes' mutation vocabularies disjoint.
    */
  def mutated(cid: Long, salt: Int, k: Int, tag: String): String = {
    val words = clusterBase(cid)
    var p = 0
    while (p < k) {
      val pos = (((cid * 7919 + salt * 104729 + p * 1299709) % 240 + 240) % 240).toInt
      words(pos) = s"$tag${cid}_${salt}_$p"
      p += 1
    }
    words.mkString(" ")
  }

  /** 120 unique words seeded by id; 30% of ids carry [[BoilerPrefix]]. */
  def uniqueText(id: Long): String = {
    val rnd = new scala.util.Random(id * 31)
    val unique = Array.fill(120)("w" + rnd.nextInt(500000)).mkString(" ")
    if (id % 10 < 3) BoilerPrefix + " " + unique else unique
  }
}
