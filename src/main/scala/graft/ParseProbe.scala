package graft

import graft.fixtures.FixtureCorpus
import graft.stages.MentionDetect

/** Microbenchmark: per-page parse cost by fixture lang, no Spark. */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val base = FixtureCorpus.baseRows
    // warm up
    (1 to 500).foreach(_ => base.foreach(MentionDetect.parseOne))
    base.foreach { b =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { MentionDetect.parseOne(b); i += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"PARSE ${b.lang}%-12s ${b.path}%-55s $us%9.1f us/page")
    }
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { base.foreach(b => graft.rules.TripleEmit.emit(MentionDetect.parseOne(b).toOption.get)); i += 1 }
    println(f"PARSE+EMIT all ${(System.nanoTime() - t0) / 1000.0 / (n * base.size)}%9.1f us/page avg")

    // multithreaded: does parse+emit scale across threads (lock/alloc
    // contention check, no Spark involved)?
    for (threads <- Seq(1, 8, 32)) {
      val perThread = n
      val t1 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var j = 0
          while (j < perThread) {
            base.foreach(b => graft.rules.TripleEmit.emit(MentionDetect.parseOne(b).toOption.get))
            j += 1
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - t1) / 1e9
      val pages = threads.toLong * perThread * base.size
      println(f"PARSE-MT threads=$threads%2d pages=$pages wall=$wall%.2f pages/s=${pages / wall}%.0f")
    }
  }
}

/** Variant forcing a fresh content copy per parse — emulates the
  * DRAM-streaming access pattern of real per-row data (Spark decode).
  */
object ParseProbeFresh {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val base = graft.fixtures.FixtureCorpus.baseRows
    (1 to 300).foreach(_ => base.foreach(graft.stages.MentionDetect.parseOne))
    for (threads <- Seq(1, 8, 32)) {
      val t1 = System.nanoTime()
      val ts = (1 to threads).map { _ =>
        new Thread(() => {
          var j = 0
          while (j < n) {
            base.foreach { b =>
              val fresh = b.copy(content = new String(b.content.toCharArray))
              graft.stages.MentionDetect.parseOne(fresh).foreach(graft.rules.TripleEmit.emit)
            }
            j += 1
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - t1) / 1e9
      val pages = threads.toLong * n * base.size
      println(f"FRESH-MT threads=$threads%2d pages=$pages wall=$wall%.2f pages/s=${pages / wall}%.0f")
    }
  }
}
