package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StateMachines._

/** Truth tables for the A4/A5 state machines (spec: the in-file comments of
  * DwdBaseLog.java:154-198 and DwsUserUserLoginWindow.java:95-135).
  * Property checks use seeded random sequences (scalacheck-style, without
  * the scalatest bridge dependency).
  */
class StateMachinesSpec extends AnyFunSuite {

  // ---- A4 dedupStep ----

  test("A4: first event of a new key counts, not back") {
    assert(dedupStep(NoState, 100L) === ((100L, true, false)))
  }

  test("A4: same-day repeat does not count") {
    assert(dedupStep(100L, 100L) === ((100L, false, false)))
  }

  test("A4: next-day visit counts, not back (gap <= 7)") {
    assert(dedupStep(100L, 101L) === ((101L, true, false)))
    assert(dedupStep(100L, 107L) === ((107L, true, false)))
  }

  test("A4: gap > 7 days counts as returning") {
    assert(dedupStep(100L, 108L) === ((108L, true, true)))
    assert(dedupStep(100L, 200L) === ((200L, true, true)))
  }

  test("A4 property: fold over any day sequence counts distinct days") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val days = List.fill(rnd.nextInt(50))(rnd.nextInt(1000).toLong).sorted
      var st = NoState
      var counted = 0
      days.foreach { d =>
        val (ns, first, _) = dedupStep(st, d); st = ns
        if (first) counted += 1
      }
      assert(counted === days.distinct.size, s"days=$days")
    }
  }

  // ---- A5 isNewStep (2x2 truth table + backfill) ----

  test("A5: claimed new, no state -> keep 1, state=today") {
    assert(isNewStep(NoState, claimed = true, 50L) === ((50L, 1)))
  }

  test("A5: claimed new, state==today -> keep 1") {
    assert(isNewStep(50L, claimed = true, 50L) === ((50L, 1)))
  }

  test("A5: claimed new but visited earlier -> repaired to 0") {
    assert(isNewStep(49L, claimed = true, 50L) === ((49L, 0)))
  }

  test("A5: claimed old, no state -> backfill yesterday, keep 0") {
    assert(isNewStep(NoState, claimed = false, 50L) === ((49L, 0)))
  }

  test("A5: claimed old with state -> keep 0, state unchanged") {
    assert(isNewStep(42L, claimed = false, 50L) === ((42L, 0)))
  }

  test("A5 property: is_new=1 only ever on a single (first-visit) day") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val evs = List.fill(rnd.nextInt(60))(
        (rnd.nextBoolean(), rnd.nextInt(100).toLong)).sortBy(_._2)
      var st = NoState
      val kept = evs.map { case (c, d) =>
        val (ns, fixed) = isNewStep(st, c, d); st = ns; (d, fixed)
      }
      val onesDays = kept.filter(_._2 == 1).map(_._1).distinct
      assert(onesDays.size <= 1, s"evs=$evs")
      // and that day, if present, is the global first-visit day
      onesDays.headOption.foreach(d => assert(d === evs.head._2))
    }
  }

  test("A7 funnel step: stage gating, strict-after, deadline, once-only") {
    import graft.streaming.StateMachines._
    val none = (NoState, NoState, NoState)
    // a click before any view does not advance
    assert(funnelStep(none, "click", 100L)._2 === None)
    // first view anchors stage 1; a second view is ignored
    val (s1, a1) = funnelStep(none, "view", 100L)
    assert(a1 === Some(1) && s1._1 === 100L)
    assert(funnelStep(s1, "view", 200L) === ((s1, None)))
    // click must be STRICTLY after the view anchor...
    assert(funnelStep(s1, "click", 100L)._2 === None)
    // ...and within the 24 h deadline (boundary inclusive, then expired)
    assert(funnelStep(s1, "click", 100L + UsPerDay)._2 === Some(2))
    assert(funnelStep(s1, "click", 101L + UsPerDay)._2 === None)
    // purchase gates on the CLICK anchor, not the view
    val (s2, _) = funnelStep(s1, "click", 500L)
    assert(funnelStep(s2, "purchase", 400L)._2 === None,
      "purchase before the click anchor must not convert")
    val (s3, a3) = funnelStep(s2, "purchase", 600L)
    assert(a3 === Some(3) && s3 === ((100L, 500L, 600L)))
    // terminal: nothing advances twice
    assert(funnelStep(s3, "purchase", 700L)._2 === None)
    assert(funnelStep(s3, "click", 700L)._2 === None)
  }
}
