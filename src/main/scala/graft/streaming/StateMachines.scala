package graft.streaming

/** Pure state-transition functions for the reference's stateful operators —
  * shared verbatim between the batch path (flatMapGroups over ts-sorted
  * groups, used by the correctness queries) and the streaming path
  * (flatMapGroupsWithState, graft.streaming.StatefulStreaming). One
  * implementation, two execution modes; the ScalaTest truth tables pin the
  * semantics.
  */
object StateMachines {

  val MsPerDay: Long = 86400000L

  /** "No state" sentinel. Distinct from any reachable epoch-day value:
    * `-1` would collide with the A5 backfill of day 0 (1970-01-01) - 1.
    */
  val NoState: Long = Long.MinValue

  def epochDay(tsMillis: Long): Long = Math.floorDiv(tsMillis, MsPerDay)

  def dayString(day: Long): String =
    java.time.LocalDate.ofEpochDay(day).toString

  /** A4 per-day dedup + 7-day returning rule
    * (ref DwsUserUserLoginWindow.java:95-135,
    *  DwsTrafficVcChArIsNewPageViewWindow.java:128-190).
    *
    * State = last active epoch-day (NoState = none). Returns
    * (newState, firstOfDay, isBack): firstOfDay=true → count this user for
    * the day (UU/UV); isBack=true → user returns after >7 idle days.
    */
  def dedupStep(lastDay: Long, day: Long): (Long, Boolean, Boolean) =
    if (lastDay == NoState) (day, true, false)
    else if (day == lastDay) (lastDay, false, false)
    else (day, true, day - lastDay > 7)

  /** A5 is_new repair (ref DwdBaseLog.java:154-198, in-file comments are the
    * spec).
    *
    * State = first-visit epoch-day (NoState = none). claimed = the raw
    * is_new flag. Returns (newState, repairedIsNew):
    *  - claimed=1, no state        → keep 1, state := today
    *  - claimed=1, state == today  → keep 1
    *  - claimed=1, state <  today  → repair to 0
    *  - claimed=0, no state        → backfill state := yesterday, keep 0
    *  - claimed=0, has state       → keep 0
    */
  def isNewStep(firstDay: Long, claimed: Boolean, day: Long): (Long, Int) =
    if (claimed) {
      if (firstDay == NoState) (day, 1)
      else if (firstDay == day) (firstDay, 1)
      else (firstDay, 0)
    } else {
      if (firstDay == NoState) (day - 1, 0) else (firstDay, 0)
    }

  val UsPerDay: Long = 86400000000L

  /** A7 funnel progression (view → click → purchase, 24 h per stage).
    *
    * State = (t1, t2, t3) anchor micros (NoState = stage not reached).
    * Events must arrive per key in (ts, event_id) order — then each
    * anchor is the EARLIEST qualifying event, exactly the batch query's
    * min-aggregate semantics. Returns (newState, advancedToStage): a
    * stage advances only once, strictly after the previous anchor and
    * within its 24 h deadline.
    */
  def funnelStep(st: (Long, Long, Long), eventType: String, us: Long)
      : ((Long, Long, Long), Option[Int]) = {
    val (t1, t2, t3) = st
    eventType match {
      case "view" if t1 == NoState => ((us, t2, t3), Some(1))
      case "click" if t1 != NoState && t2 == NoState &&
        us > t1 && us <= t1 + UsPerDay => ((t1, us, t3), Some(2))
      case "purchase" if t2 != NoState && t3 == NoState &&
        us > t2 && us <= t2 + UsPerDay => ((t1, t2, us), Some(3))
      case _ => (st, None)
    }
  }
}
