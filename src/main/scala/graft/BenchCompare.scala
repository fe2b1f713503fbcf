package graft

import java.io.File
import scala.collection.mutable

/** Paired A/B/A benchmark comparison of HEAD vs a base commit — the
  * protocol VERDICT r10 #1 asked for, replacing hand-run worktree
  * alternations.
  *
  * Why paired: the end-of-round r10 investigation measured a 11.9–13.9 s
  * spread across six SAME-CODE runs on a nominally idle host, and a
  * base/head comparison whose sign flipped with run ORDER. Difference of
  * medians taken from two separate sessions therefore measures the host's
  * load drift, not the code. This harness interleaves the two builds
  * inside ONE session — strictly serialized, alternating which arm runs
  * first in each pair — and reports the MEDIAN OF PER-PAIR DELTAS, so
  * slow ambient drift cancels within each pair and fast noise is voted
  * out by the median.
  *
  * Mechanics: the base commit is checked out once into a cached git
  * worktree under /tmp and compiled there; two [[BenchServer]] JVMs are
  * launched with identical JVM options — the base arm's classpath simply
  * PREPENDS the base build's class dir, so every `graft.*` query class
  * resolves from the base build while the (head-only) server main loads
  * from head. Pair p runs base-then-head when p is even, head-then-base
  * when odd. Pair 0 is a warmup (both arms pay JIT/codegen) and is
  * excluded from stats; published per-query stats are the median delta,
  * plus both arms' raw runs for audit. A query the base build doesn't
  * know (added since) is reported under `base_missing` with head-only
  * times and excluded from paired totals.
  *
  * Run: `sbt "runMain graft.Bench compare <commit> [pairs] [q1,q2,..]"`
  * → one compact JSON line on stdout + the full record in
  * bench_compare.json (SPARK_GRAFT_COMPARE_OUT overrides).
  * SPARK_GRAFT_COMPARE_SESSIONS=S (default 2) restarts both arm JVMs S
  * times and pools deltas across sessions — the defense against
  * session-scoped JIT/GC bias the r13 "3/3-positive drift" episode
  * showed a single arm pair cannot provide (see run()). Multi-session
  * is the DEFAULT protocol since r15: a published compare record spans
  * at least two independent JVM lifetimes per arm unless explicitly
  * overridden with SESSIONS=1.
  */
object BenchCompare {

  private def sh(cmd: Seq[String], cwd: Option[File] = None): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    cwd.foreach(pb.directory)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  /** The JDK-17 module opens Spark needs outside spark-submit — the same
    * list build.sbt injects into forked runs. */
  private val jvmOpts: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
    "-Dspark.ui.enabled=false",
    "-Dspark.sql.session.timeZone=UTC",
    s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")

  /** One server arm: the child process plus its line-filtered stdout. */
  private final class Arm(label: String, classpath: String) {
    val log = new File(s"/tmp/graft_compare_$label.log")
    private val pb = new ProcessBuilder(
      (Seq(s"${sys.props("java.home")}/bin/java") ++ jvmOpts ++
        Seq("-cp", classpath, "graft.BenchServer")): _*)
    pb.redirectError(ProcessBuilder.Redirect.to(log))
    private val proc = pb.start()
    private val stdin = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"), true)
    private val stdout = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))

    /** Next GRAFTBENCH-prefixed line; anything else (stray logging) is
      * skipped. Null means the arm died — fail loudly with its log. */
    private def readLine(): String = {
      var l = stdout.readLine()
      while (l != null && !l.startsWith("GRAFTBENCH")) l = stdout.readLine()
      if (l == null) sys.error(
        s"$label bench arm died; see ${log.getAbsolutePath}")
      l.stripPrefix("GRAFTBENCH").trim
    }

    def awaitReady(): Unit = {
      val l = readLine()
      require(l == "READY", s"$label arm handshake got '$l'")
    }

    /** Run one query; Right(seconds) or Left(error message). */
    def run(name: String): Either[String, Double] = {
      stdin.println(name)
      val l = readLine()
      val parts = l.split("\\s+", 3)
      if (parts(0) == "OK" && parts(1) == name) Right(parts(2).toDouble)
      else Left(l)
    }

    def shutdown(): Unit = {
      try { stdin.println("exit"); proc.waitFor(60, java.util.concurrent.TimeUnit.SECONDS) }
      finally if (proc.isAlive) proc.destroyForcibly()
      ()
    }
  }

  private def median(ts: Seq[Double]): Double = ts.sorted.apply((ts.size - 1) / 2)

  def run(refCommit: String, pairsArg: Option[Int],
      only: Option[Set[String]] = None): Unit = {
    val pairs = pairsArg
      .orElse(sys.env.get("SPARK_GRAFT_COMPARE_PAIRS").map(_.toInt))
      .getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // resolve + build the base commit once; the worktree is cached by sha
    val (rc, shaOut) = sh(Seq("git", "rev-parse", refCommit))
    require(rc == 0, s"git rev-parse $refCommit failed: $shaOut")
    val sha = shaOut.trim
    val wtDir = new File(s"/tmp/graft_base_${sha.take(12)}")
    val baseClasses = new File(wtDir, "target/scala-2.13/classes")
    if (!wtDir.exists()) {
      System.err.println(s"[compare] creating base worktree $wtDir @ ${sha.take(12)}")
      val (arc, aout) = sh(Seq("git", "worktree", "add", "--detach",
        wtDir.getAbsolutePath, sha))
      require(arc == 0, s"git worktree add failed: $aout")
    }
    if (!baseClasses.exists()) {
      System.err.println(s"[compare] compiling base commit (one-time, ~2 min)")
      val (crc, cout) = sh(Seq("sbt", "-batch", "compile"), Some(wtDir))
      require(crc == 0 && baseClasses.exists(),
        s"base compile failed:\n${cout.linesIterator.toSeq.takeRight(20).mkString("\n")}")
    }

    val headCp = sys.props("java.class.path")
    val baseCp = baseClasses.getAbsolutePath + File.pathSeparator + headCp
    // Multi-session mode (r14, the drift-investigation lesson): a single
    // long-lived arm pair can hold a SESSION-SCOPED JVM bias — JIT/
    // codegen/GC phase differences that push every pair of one query the
    // same direction and read as a fake consistent regression (the r13
    // "3/3-positive drift", which four independent sessions failed to
    // reproduce). Sessions = S restarts BOTH arm JVMs between pair
    // groups; deltas concatenate across sessions, so the published
    // median spans S independent JVM lifetimes and a one-session bias is
    // voted out. Session count, not pair count, is the knob that
    // catches this class.
    val sessions = sys.env.get("SPARK_GRAFT_COMPARE_SESSIONS") match {
      case None => 2 // multi-session is the default protocol (r14 lesson)
      case Some(raw) =>
        val n = raw.trim.toIntOption.getOrElse(sys.error(
          s"SPARK_GRAFT_COMPARE_SESSIONS must be a positive int, got '$raw'"))
        require(n >= 1,
          s"SPARK_GRAFT_COMPARE_SESSIONS must be >= 1, got $n")
        n
    }
    // optional comma-separated filter (4th CLI arg): deep-pair a suspect
    // query in isolation — the r13 drift bisect needed per-query pair
    // counts the full-headline session can't afford
    val names = Bench.headline.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))
    val baseRuns = mutable.LinkedHashMap.empty[String, Seq[Double]]
    val headRuns = mutable.LinkedHashMap.empty[String, Seq[Double]]
    val baseSteady = mutable.LinkedHashMap.empty[String, Seq[Double]]
    val headSteady = mutable.LinkedHashMap.empty[String, Seq[Double]]
    val deltas = mutable.LinkedHashMap.empty[String, Seq[Double]]
    var baseMissing = List.empty[String]
    var failed = List.empty[String]
    def add(m: mutable.LinkedHashMap[String, Seq[Double]], k: String,
        vs: Seq[Double]): Unit = m(k) = m.getOrElse(k, Seq.empty) ++ vs

    (0 until sessions).foreach { s =>
      System.err.println(s"[compare] session ${s + 1}/$sessions: starting " +
        s"arms (sf=$sfDir, pairs=$pairs+1 warmup)")
      val base = new Arm("base", baseCp)
      val head = new Arm("head", headCp)
      try {
        base.awaitReady(); head.awaitReady()
        names.foreach { name =>
          // probe the base arm once: a query added since the base commit
          // has no paired story — record head-only and move on
          base.run(name) match {
            case Left(err) if err.contains("unknown query") =>
              System.err.println(s"[compare] $name not in base build; head-only")
              if (!baseMissing.contains(name)) baseMissing ::= name
              add(headRuns, name, (0 to pairs).map(_ =>
                head.run(name).getOrElse(Double.NaN)).drop(1))
            case first =>
              var bs = Vector(first.getOrElse(Double.NaN))
              var hs = Vector(head.run(name).getOrElse(Double.NaN))
              (1 to pairs).foreach { p =>
                // alternate which arm runs first so run-order effects (the
                // r10 A/B/A sign flip) cancel across pairs
                if (p % 2 == 0) {
                  bs :+= base.run(name).getOrElse(Double.NaN)
                  hs :+= head.run(name).getOrElse(Double.NaN)
                } else {
                  hs :+= head.run(name).getOrElse(Double.NaN)
                  bs :+= base.run(name).getOrElse(Double.NaN)
                }
              }
              add(baseRuns, name, bs); add(headRuns, name, hs)
              // pair 0 is the session's warmup — excluded from stats
              add(baseSteady, name, bs.drop(1)); add(headSteady, name, hs.drop(1))
              val ds = bs.zip(hs).drop(1).collect {
                case (b, h) if !b.isNaN && !h.isNaN => h - b
              }
              if (ds.size < pairs) { if (!failed.contains(name)) failed ::= name }
              else {
                add(deltas, name, ds)
                System.err.println(f"[compare] $name%-28s base=${median(bs.drop(1))}%.3f " +
                  f"head=${median(hs.drop(1))}%.3f dMed=${median(ds)}%+.3f")
              }
          }
        }
      } finally { base.shutdown(); head.shutdown() }
    }

    val paired = deltas.keys.toSeq.filterNot(failed.contains)
    val dTotal = paired.map(n => median(deltas(n))).sum
    val bTotal = paired.map(n => median(baseSteady(n))).sum
    val hTotal = paired.map(n => median(headSteady(n))).sum
    def jsArr(ts: Seq[Double]) = ts.map(t => f"$t%.4f").mkString("[", ",", "]")
    def jsMap[A](m: collection.Map[String, A])(f: A => String) =
      m.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    // an `only`-filtered run must be distinguishable from a full-headline
    // record, and the published delta maps must be internally consistent
    // with the paired totals: both are restricted to `paired` (failed
    // queries' partial deltas stay in the full record's raw-runs arrays
    // for audit, but never in delta_medians)
    val filterJs = only.fold("")(f =>
      s""""queries":${f.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")},""")
    val pairedDeltas = deltas.filter { case (k, _) => paired.contains(k) }
    val head_ =
      f""""metric":"paired_delta_total","value":$dTotal%.3f,"unit":"sec","stats":"median of per-pair (head - base) deltas per query, pooled across sessions; value = sum over paired queries","base_commit":"$sha","pairs":$pairs,"sessions":$sessions,$filterJs"base_total":$bTotal%.3f,"head_total":$hTotal%.3f,"ratio":${hTotal / math.max(bTotal, 1e-9)}%.3f"""
    val tail_ =
      s""""base_missing":${baseMissing.map("\"" + _ + "\"").mkString("[", ",", "]")},"failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir""""
    val dMedJs = jsMap(pairedDeltas)(ds => f"${median(ds)}%.4f")
    val compact = s"""{$head_,"delta_medians":$dMedJs,$tail_}"""
    val full = s"""{$head_,"delta_medians":$dMedJs,"deltas":${jsMap(pairedDeltas)(jsArr)},"base_runs":${jsMap(baseRuns)(jsArr)},"head_runs":${jsMap(headRuns)(jsArr)},$tail_}"""
    println(compact)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_COMPARE_OUT", "bench_compare.json")), full)
  }
}
