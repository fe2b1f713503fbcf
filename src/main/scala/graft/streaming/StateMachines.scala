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
}
