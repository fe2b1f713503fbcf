package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs the headline queries against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Execution is forced via `queryExecution.toRdd.count()` — materializes
  * every operator of the REAL plan (no Catalyst count-only pruning, no
  * row-to-external conversion), per VERDICT r1 guidance.
  */
object Bench {

  // Headline set: the scan/agg, join, window, stateful, text, dedup,
  // similarity and multimodal paths. Quadratic blocked-pair correctness
  // checks (dedup_ngram_jaccard, sim_pairs_threshold) are excluded by
  // design — their scale paths (minhash_lsh, lsh_ann) are benched instead.
  // r13 additions (VERDICT r12 #6): one representative per native-walk
  // family so the fused paths are regression-guarded round-over-round —
  // dedup_simhash_pairs (simhash60 + banded pair store),
  // dedup_cdc_chunks (cdc_chunks walk), text_kneser_ney (tokenize +
  // exact-integer LM scoring over the bigram relations).
  // r14 addition (VERDICT r13 #5): sim_knn_graph — the ANN-graph family
  // guard. The layered walk itself measures 12.2 s at sf0.1 (75%+ of it
  // the ladder BUILD this query shares), so guarding the build guards
  // the family without letting one query dominate the headline total
  // and blunt the guard for the other 22; the full walk stays under the
  // layerdiag sweep in SCALING.md.
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "j1_order_lineitem_join", "j3_interval_join",
    "j4_lookup_dim_join", "a1_tumble_count", "a2_keyed_window_reduce",
    "a4_uv_per_day", "a5_is_new_repair", "k5_upsert_latest_per_key",
    "u1_tokenize_explode", "text_quality", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_cdc_chunks", "text_kneser_ney", "sim_topk_bruteforce",
    "sim_lsh_ann", "sim_ivf_ann", "sim_knn_graph", "mm_decode_features",
    "p7_map_projection")

  /** Per-query seconds from the GIT-COMMITTED `bench_out.json` — the
    * reference for the contention guard. (Round 4 lesson: one noisy
    * driver run recorded a fake 1.8x regression; a committed record plus
    * a retry guard lets the harness defend itself.) Read via
    * `git show HEAD:` — the working file is overwritten by every run, so
    * reading it instead would let the baseline silently drift to whatever
    * the last (possibly contended) run produced. Falls back to the file
    * only when git is unavailable.
    *
    * The record is only a valid reference for the SF it was recorded at —
    * comparing an sf0.001 smoke run against sf0.1 numbers would misfire
    * both the retry guard and vs_committed — so an SF mismatch disables it.
    */
  private def committedRecord(sfDir: String): Map[String, Double] = {
    val s =
      try scala.sys.process.Process(
        Seq("git", "show", "HEAD:bench_out.json")).!!
      catch { case _: Throwable =>
        // the working file is rewritten by every run, so this baseline can
        // drift — say so instead of silently guarding against the wrong
        // numbers
        System.err.println(
          "[bench] git unavailable; contention guard falls back to the " +
            "working-tree bench_out.json (may drift)")
        val p = java.nio.file.Paths.get("bench_out.json")
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
        else ""
      }
    if (s.isEmpty) return Map.empty
    // a real JSON parse (jackson ships on Spark's classpath): immune to
    // key reordering and to objects (raw_runs) preceding `queries`
    try {
      import scala.jdk.CollectionConverters._
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      val recSf = Option(root.get("sf")).map(_.asText()).getOrElse("")
      if (recSf.nonEmpty && recSf != sfDir) {
        System.err.println(s"[bench] committed record is for $recSf, this " +
          s"run is $sfDir; contention guard + vs_committed disabled")
        return Map.empty
      }
      val node = root.get("queries")
      if (node == null) Map.empty
      else node.fields().asScala
        .map(e => e.getKey -> e.getValue.asDouble()).toMap
    } catch { case e: Throwable =>
      System.err.println(s"[bench] committed record unparseable " +
        s"(${e.getMessage}); contention guard disabled for this run")
      Map.empty
    }
  }

  /** Lower median (sorted middle element) — robust to one contended run. */
  private def median(ts: Seq[Double]): Double = ts.sorted.apply((ts.size - 1) / 2)

  /** In-session spread EXCLUDING the first run (which pays that query's
    * one-time codegen/JIT): max/min over the steady-state runs. Identical
    * plans don't have 10–30x variance — a spread past [[SpreadBar]] is a
    * machine-load signature, never a plan property (BENCH_r06 recorded
    * [1.1, 1.1, 31.1] for one unchanged query).
    */
  private def spread(ts: Seq[Double]): Double = {
    val steady = ts.drop(1)
    if (steady.size < 2) 1.0 else steady.max / math.max(steady.min, 1e-9)
  }
  private val SpreadBar = 3.0

  /** 1-minute load average from /proc/loadavg (NaN if unreadable) —
    * recorded per query as contention evidence. Annotation only: the
    * bench itself keeps all cores busy, so the absolute value can't
    * gate anything, but a record showing loadavg 3x the core count
    * explains a poisoned median without re-adjudication.
    */
  private def loadAvg1(): Double = loadAvg(0)
  /** 5-minute load average — the quiet-wait gate reads it alongside the
    * 1-minute value because a JUST-ENDED burst leaves l1 low while the
    * machine is still draining (page cache churn, background IO): an r17
    * pin launched at l1=0.25 / l5=0.65 / l15=1.76 read a graded 1.29x
    * median inflation with zero spread flags — the post-burst band, not
    * a quiet window.
    */
  private def loadAvg5(): Double = loadAvg(1)
  private def loadAvg(idx: Int): Double =
    try java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(idx).toDouble
    catch { case _: Throwable => Double.NaN }

  def main(args: Array[String]): Unit = {
    // `Bench compare <commit> [pairs]` — the paired A/B/A protocol
    // (BenchCompare): round-over-round perf claims come from interleaved
    // same-session deltas, not from comparing two separately-hosted
    // medians. The no-arg driver path below is unchanged.
    if (args.headOption.contains("compare")) {
      require(args.length >= 2,
        "usage: Bench compare <commit> [pairs] [q1,q2,...]")
      BenchCompare.run(args(1), args.lift(2).map(_.toInt),
        args.lift(3).map(_.split(",").toSet))
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Bounded quiet-window wait (VERDICT r16 #1): the host has documented
    // multi-minute EXTERNAL load bursts that inflate every query 1.2–2x;
    // BENCH_r16's headline landed in one and misstated the engine 2x.
    // Before the first timed run, poll /proc/loadavg for up to 2 minutes
    // for a window below 1.0 — bursts are minutes-scale, so this catches
    // most of them; if none opens, proceed (the min-substitution below is
    // the second line of defense) and record both the wait and the
    // loadavg the run started at so the record explains itself.
    val startWait = System.nanoTime()
    var l = loadAvg1()
    var l5 = loadAvg5()
    // l5 gates too (see loadAvg5): a burst that ended seconds ago shows
    // l1 quiet while the window is still the degraded post-burst band
    while ((l > 1.0 || l5 > 1.5) && (System.nanoTime() - startWait) < 180e9) {
      System.err.println(f"[bench] loadavg $l%.1f/5min $l5%.1f above " +
        "1.0/1.5 — waiting for a quiet window (bounded 180s)")
      Thread.sleep(10000)
      l = loadAvg1(); l5 = loadAvg5()
    }
    val quietWaitSec = (System.nanoTime() - startWait) / 1e9
    val startLoad = l
    val spark = graft.core.Sessions.local()
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the plan, not JVM startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.toRdd.count()
    val committed = committedRecord(sfDir)
    // Contention defense (VERDICT r6 #1 — two of the last three official
    // records were load-poisoned). Per query:
    //  - 3 base runs; run 1 pays one-time codegen/JIT (fixed overhead,
    //    irrelevant at scale), the median discards it plus one bad run.
    //  - ESCALATING retries (up to 4 extra) while either (a) the MIN of
    //    all runs still exceeds 2.5x the committed record — the min, not
    //    the median, because a contended window inflates medians while a
    //    single quiet run proves the plan is fine — or (b) the in-session
    //    steady-state spread exceeds 3x, a pure load signature.
    //  - mins + per-query loadavg are published alongside medians, and a
    //    query whose spread never settled is listed in load_flagged, so a
    //    reader of the record can see exactly which numbers to distrust.
    var failed = List.empty[String]
    val raw = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val loads = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var loadFlagged = List.empty[String]
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        if (!failed.contains(name)) failed ::= name
      }
      val t = (System.nanoTime() - t0) / 1e9
      // release AFTER the timer, after EVERY run: barrier blocks must
      // not accumulate across runs or queries (SCALING.md measured a 2x
      // inflation at 16x from exactly that), and release cost is not
      // part of the query
      graft.core.Barrier.releaseAll(spark)
      t
    }
    headline.filter(SparkEntry.queries.contains).foreach { name =>
      loads(name) = loadAvg1()
      var times = Seq.fill(3)(once(name))
      val guard = committed.get(name).filter(_ > 0)
      def minExceeds = guard.exists(c => times.min > 2.5 * c)
      var extra = 0
      while ((minExceeds || spread(times) > SpreadBar) && extra < 4 &&
          !failed.contains(name)) {
        System.err.println(f"[bench] $name min=${times.min}%.3f " +
          f"spread=${spread(times)}%.1fx (committed ${guard.getOrElse(-1.0)}%.3f, " +
          f"loadavg=${loadAvg1()}%.1f); retry ${extra + 1}/4")
        times :+= once(name)
        extra += 1
      }
      if (spread(times) > SpreadBar && !failed.contains(name)) {
        loadFlagged ::= name
        System.err.println(f"[bench] $name spread ${spread(times)}%.1fx never " +
          "settled — median is load-suspect, trust the min")
      }
      raw(name) = times
    }
    // End-of-session requalification pass (VERDICT r7 #3): contention is
    // BURSTY — a query flagged mid-session often has a quiet window by the
    // time the whole set has run (the r7 session's own tail proved it:
    // flagged queries' last raw runs were their fastest). Each flagged
    // query gets up to 3 more runs now; the published min covers ALL runs,
    // and a query whose tail runs settle (spread <= bar, min inside the
    // committed guard) is moved from load_flagged to requalified.
    var requalified = List.empty[String]
    loadFlagged.reverse.filterNot(failed.contains).foreach { name =>
      val guard = committed.get(name).filter(_ > 0)
      var tail = Seq(once(name), once(name))
      def tailSpread = tail.max / math.max(tail.min, 1e-9)
      def guardBad = guard.exists(c => tail.min > 2.5 * c)
      if (tailSpread > SpreadBar || guardBad) tail :+= once(name)
      raw(name) = raw(name) ++ tail
      val all = raw(name)
      if (tailSpread <= SpreadBar && !guardBad && !failed.contains(name)) {
        requalified ::= name
        loadFlagged = loadFlagged.filterNot(_ == name)
        System.err.println(f"[bench] $name requalified at session end: " +
          f"tail runs ${tail.map(t => f"$t%.3f").mkString("[", ",", "]")}, " +
          f"min=${all.min}%.3f")
      } else {
        System.err.println(f"[bench] $name still load-suspect after tail " +
          f"pass: ${tail.map(t => f"$t%.3f").mkString("[", ",", "]")}")
      }
    }
    // Published per-query stats come from one FIXED-SIZE window for EVERY
    // query — its LAST 3 timed runs (ADVICE r8: requalification's extra
    // draws must not hand flagged queries a deeper min-sample than
    // unflagged queries' 3 runs). For an unretried query that window IS
    // its 3 runs; for a retried one it is the steady tail — a time
    // window, not a best-of-rank pick. raw_runs still carries every run.
    //
    // LOAD IMMUNITY (VERDICT r16 #1): a query whose spread never settled
    // — retries AND the tail pass exhausted — has a load-poisoned median
    // by the record's own diagnosis, so its published value is its
    // SESSION MIN over every run instead (identical plans don't vary 10x;
    // the min is the one sample load can only inflate, never deflate).
    // Substituted queries are listed in the `substituted` field so the
    // headline `value` can no longer misstate the engine 2x while the
    // evidence sits one field over (the BENCH_r16 failure shape).
    val substituted = loadFlagged.filterNot(failed.contains)
    val stats = raw.map { case (name, ts) =>
      val w = ts.takeRight(3)
      // a failed query must not shrink the total into a fake improvement
      name -> (if (failed.contains(name)) (-1.0, -1.0)
               else if (substituted.contains(name)) (ts.min, ts.min)
               else (median(w), w.min))
    }
    val qs = stats.map { case (k, (m, _)) => "\"" + k + f"""\":$m%.3f""" }
      .mkString("{", ",", "}")
    val minsJs = stats.map { case (k, (_, mn)) => "\"" + k + f"""\":$mn%.3f""" }
      .mkString("{", ",", "}")
    val rawJs = raw.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val nRunsJs = raw.map { case (k, ts) => "\"" + k + "\":" + ts.size }
      .mkString("{", ",", "}")
    val loadJs = loads.map { case (k, l) =>
      "\"" + k + "\":" + (if (l.isNaN) "null" else f"$l%.1f")
    }.mkString("{", ",", "}")
    val total = stats.values.map(_._1).filter(_ >= 0).sum
    val minTotal = stats.values.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val flaggedJson = loadFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val requalJson = requalified.map("\"" + _ + "\"").mkString("[", ",", "]")
    // ambient-window context: this run's total over the committed quiet
    // record's total (same query set only). Hour-scale host-load drift
    // inflates every query uniformly without tripping the per-query
    // spread/min triggers — the ratio makes that visible in the record
    // itself instead of requiring cross-file adjudication.
    val vsCommitted = {
      // Seq, not .keys: a Map's key view is a SET, and flatMap over it
      // collapses committed times that collide at 3-decimal rounding —
      // c.size then undercounts and the ratio silently disappears
      val names = stats.toSeq.filter(_._2._1 >= 0).map(_._1)
      val c = names.flatMap(committed.get).filter(_ > 0)
      if (c.size == names.size && c.sum > 0) f""","vs_committed":${total / c.sum}%.2f"""
      else ""
    }
    // Self-describing headline fields, shared by both outputs: `queries`
    // is ALWAYS per-query MEDIANS (seconds) over the stat window, `mins`
    // the window mins — labeled so a record reader never has to infer
    // which statistic a dict carries (the BENCH_r08 ambiguity).
    val substJson = substituted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val head =
      f""""metric":"total","value":$total%.3f,"unit":"sec","stats":"median and min per query over stat_window; value = sum of medians, with the SESSION MIN substituted for queries whose spread never settled (listed in substituted)","stat_window":"last_3_runs","median_total":$total%.3f,"min_total":$minTotal%.3f$vsCommitted"""
    val tail =
      f""""load_flagged":$flaggedJson,"substituted":$substJson,"requalified":$requalJson,"failed":$failedJson,"quiet_wait_sec":$quietWaitSec%.0f,"start_loadavg":${if (startLoad.isNaN) "null" else f"$startLoad%.1f"},"sf":"$sfDir""""
    // stdout gets the COMPACT line only: the driver records a bounded TAIL
    // of sbt output, and r8's full line was long enough that the head
    // (metric/value/medians) was truncated away, leaving an unlabeled
    // mins dict as the apparent record. Everything bulky (raw_runs,
    // loadavg, n_runs, mins) lives in the file record.
    val compact = s"""{$head,"queries":$qs,$tail}"""
    val full =
      s"""{$head,"queries":$qs,"mins":$minsJs,"n_runs":$nRunsJs,"raw_runs":$rawJs,"loadavg":$loadJs,$tail}"""
    println(compact)
    // sbt prefixes stdout with [info]/[error], which has defeated the
    // driver's JSON parse both rounds — also write the record to a file
    // so the round record is machine-readable regardless of log wrapping.
    // The DEFAULT file is the gitignored ambient scratch record: every
    // casual/driver run used to overwrite `bench_out.json` — the COMMITTED
    // quiet record the contention guard reads — and the round-close sweep
    // twice committed an ambient run over the quiet pin (VERDICT r15
    // hygiene nit). Pinning a new quiet record is now the only writer of
    // bench_out.json: SPARK_GRAFT_BENCH_OUT=bench_out.json, loadavg < 1.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_ambient.json")), full)
    spark.stop()
  }
}
