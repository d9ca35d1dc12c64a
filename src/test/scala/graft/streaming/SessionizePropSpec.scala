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

  private def refSessionsGap(evs: List[(Long, Long, Double)],
      gapUs: Long): Set[(Long, Long, Long, Long, Double)] =
    evs.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Double)]
      var cur: Option[(Long, Long, Long, Double)] = None
      sorted.foreach { case (_, us, v) =>
        cur = cur match {
          case Some((s, e, n, t)) if us - e <= gapUs => Some((s, us, n + 1, t + v))
          case Some(closed) => out += closed; Some((us, us, 1L, v))
          case None => Some((us, us, 1L, v))
        }
      }
      cur.foreach(out += _)
      out.map { case (s, e, n, t) => (u, s, e, n, math.floor(t * 100 + 0.5) / 100) }
    }.toSet

  private def refSessions(evs: List[(Long, Long, Double)]): Set[(Long, Long, Long, Long, Double)] =
    refSessionsGap(evs, GapUs)

  test("stateFn over random watermark-respecting micro-batches equals the batch fold") {
    // drives the state machine DIRECTLY (TestGroupState) over random
    // event sets randomly split into micro-batches with arbitrary
    // in-batch and cross-batch disorder; the simulated store drops
    // sub-watermark rows exactly like FlatMapGroupsWithStateExec, and
    // the reference fold runs over the admitted events — the documented
    // contract: every admissible event keeps exact parity
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // values are multiples of 0.25: non-integer (so fractional-double
    // summation is exercised) but binary-EXACT, so summation order
    // cannot move the floor(x*100+0.5) rounding — the documented parity
    // contract (Sessionize scaladoc: inexact decimals like 0.005 may
    // differ in the last ulp across batch splits; exact values may not)
    val gen = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        ms <- Gen.choose(0L, 3000L)
        v <- Gen.choose(-200, 200)
      } yield (ms, v / 4.0))
      nBatches <- Gen.choose(1, 5)
      cuts <- Gen.listOfN(n, Gen.choose(0, nBatches - 1))
      delayMs <- Gen.choose(200L, 4000L)
    } yield (evs, cuts, nBatches, delayMs)

    checkProp(forAll(gen) { case (evs, cuts, nBatches, delayMs) =>
      def ev(ms: Long, v: Double) =
        Sessionize.Event(1L, new java.sql.Timestamp(ms), v)
      val batches = (0 until nBatches).map(b =>
        evs.zip(cuts).collect { case ((ms, v), c) if c == b => (ms, v) })
      var state: Option[Sessionize.Pending] = None
      var wmMs = 0L
      val admitted = scala.collection.mutable.ListBuffer.empty[(Long, Long, Double)]
      val out = scala.collection.mutable.ListBuffer.empty[Sessionize.SessionOut]
      def step(batch: Seq[(Long, Double)], wm: Long, timedOut: Boolean): Unit = {
        val gs = TestGroupState.create[Sessionize.Pending](
          org.apache.spark.api.java.Optional.ofNullable(state.orNull),
          GroupStateTimeout.EventTimeTimeout, 0L,
          org.apache.spark.api.java.Optional.of(wm), hasTimedOut = timedOut)
        out ++= Sessionize.stateFn(GapUs * 1000)(1L,
          batch.map { case (ms, v) => ev(ms, v) }.iterator, gs)
        state = if (gs.exists) Some(gs.get) else None
      }
      batches.foreach { b =>
        val adm = b.filter(_._1 >= wmMs) // the store drops sub-watermark rows
        admitted ++= adm.map { case (ms, v) => (1L, ms * 1000, v) }
        step(adm, wmMs, timedOut = false)
        wmMs = math.max(wmMs, b.map(_._1).maxOption.map(_ - delayMs).getOrElse(wmMs))
      }
      step(Nil, Long.MaxValue / 2000, timedOut = true) // watermark flush
      val got = out.map(s =>
        (s.user_id, s.session_start_us, s.session_end_us, s.n_events, s.total_value)).toSet
      // reference fold expects us in micros and gap in the same units
      val expected = refSessionsGap(admitted.toList, GapUs * 1000)
      Prop(got == expected) :| s"got=$got expected=$expected admitted=$admitted"
    }, minSuccessful = 60)
  }

  test("batch sessionization matches a sequential fold on random inputs") {
    import spark.implicits._
    val genEvents: Gen[List[(Long, Long, Double)]] =
      // multiples of 0.25: see the stateFn test's generator note
      Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.choose(0L, 3L)
        us <- Gen.choose(0L, 3000L)
        v <- Gen.choose(-200, 200)
      } yield (u, us, v / 4.0)))

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
