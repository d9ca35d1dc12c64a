package graft.streaming

import graft.{PropChecks, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** Property check: the batch sessionization plan (lag/cumsum/groupBy)
  * agrees with a sequential per-user fold on random event sets —
  * session boundaries, counts, and rounded totals.
  */
class SessionizePropSpec extends SparkSpec with PropChecks {

  private val GapUs = 300L

  private def refSessions(evs: List[(Long, Long, Double)]): Set[(Long, Long, Long, Long, Double)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Double)]
      var cur: Option[(Long, Long, Long, Double)] = None
      sorted.foreach { case (_, us, v) =>
        cur = cur match {
          case Some((s, e, n, t)) if us - e <= GapUs => Some((s, us, n + 1, t + v))
          case Some(closed) => out += closed; Some((us, us, 1L, v))
          case None => Some((us, us, 1L, v))
        }
      }
      cur.foreach(out += _)
      out.map { case (s, e, n, t) => (u, s, e, n, math.floor(t * 100 + 0.5) / 100) }
    }.toSet

  test("batch sessionization matches a sequential fold on random inputs") {
    import spark.implicits._
    val genEvents: Gen[List[(Long, Long, Double)]] =
      Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.choose(0L, 3L)
        us <- Gen.choose(0L, 3000L)
        v <- Gen.choose(-50, 50)
      } yield (u, us, v.toDouble)))

    checkProp(forAll(genEvents) { evs =>
      val df = evs.toDF("user_id", "us0", "value")
        .withColumn("ts", timestamp_micros(col("us0")))
        .select("user_id", "ts", "value")
      val got = Sessionize.sessionizeBatch(df, GapUs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      Prop(got == refSessions(evs)) :| s"got=$got expected=${refSessions(evs)}"
    }, minSuccessful = 15)
  }
}
