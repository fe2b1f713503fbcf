package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unpartitioned `Window.orderBy` is the one-task-global-sort anti-pattern
  * this repo bans on query paths — every surviving site is only legal
  * because its INPUT is provably bounded (a ≤ nB-row bucket rollup, a
  * limit(k) cut, a count-of-counts histogram) or harness-only. VERDICT
  * r17 #5 asked for a per-site pin so a new unbounded site can't slip in
  * silently: every `Window.orderBy` not preceded by a `partitionBy` on
  * the same expression must carry a `bounded-window:` comment within the
  * four lines above it stating its bound. This spec IS that pin — a new
  * site fails here until its author states (and thereby reviews) the
  * bound.
  */
class BoundedWindowLintSpec extends AnyFunSuite {

  test("every unpartitioned Window.orderBy site declares its bound") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".scala")) {
        val lines = java.nio.file.Files.readAllLines(p)
        for (i <- 0 until lines.size()) {
          val l = lines.get(i)
          // flag `Window.orderBy` (no partitionBy on the same line);
          // `Window.partitionBy(...).orderBy` chains are fine
          if (l.contains("Window.orderBy") && !l.contains("partitionBy")
              && !l.trim.startsWith("//")) {
            val context = (math.max(0, i - 4) until i)
              .map(lines.get).mkString("\n")
            if (!context.contains("bounded-window:") &&
                !l.contains("bounded-window:"))
              bad += s"$p:${i + 1}: $l"
          }
        }
      }
    }
    assert(bad.isEmpty,
      "unpartitioned Window.orderBy without a bounded-window: declaration " +
        "within 4 lines above:\n" + bad.mkString("\n"))
  }
}
