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
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "j1_order_lineitem_join", "j3_interval_join",
    "j4_lookup_dim_join", "a1_tumble_count", "a2_keyed_window_reduce",
    "a4_uv_per_day", "a5_is_new_repair", "k5_upsert_latest_per_key",
    "u1_tokenize_explode", "text_quality", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash", "sim_topk_bruteforce",
    "sim_lsh_ann", "sim_ivf_ann", "mm_decode_features", "p7_map_projection")

  /** Per-query seconds from the GIT-COMMITTED `bench_out.json` — the
    * reference for the contention guard. (Round 4 lesson: one noisy
    * driver run recorded a fake 1.8x regression; a committed record plus
    * a retry guard lets the harness defend itself.) Read via
    * `git show HEAD:` — the working file is overwritten by every run, so
    * reading it instead would let the baseline silently drift to whatever
    * the last (possibly contended) run produced. Falls back to the file
    * only when git is unavailable.
    */
  private def committedRecord(): Map[String, Double] = {
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
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(s).get("queries")
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the plan, not JVM startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.toRdd.count()
    val committed = committedRecord()
    // median of 3 runs per query: run 1 pays one-time codegen/JIT for that
    // query's generated classes (fixed overhead, irrelevant at scale), the
    // median discards it plus any one contended run. If the median still
    // exceeds 2.5x the committed record, one extra run decides whether it
    // was machine contention or a genuine regression.
    var failed = List.empty[String]
    val raw = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
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
      var times = Seq.fill(3)(once())
      val guard = committed.get(name).filter(_ > 0)
      if (guard.exists(c => median(times) > 2.5 * c) && !failed.contains(name)) {
        System.err.println(f"[bench] $name ${median(times)}%.3f exceeds " +
          f"2.5x committed ${guard.get}%.3f; retrying once")
        times :+= once()
      }
      raw(name) = times
      // a failed query must not shrink the total into a fake improvement
      name -> (if (failed.contains(name)) -1.0 else median(times))
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val rawJs = raw.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"raw_runs":$rawJs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // sbt prefixes stdout with [info]/[error], which has defeated the
    // driver's JSON parse both rounds — also write the record to a file
    // so the round record is machine-readable regardless of log wrapping.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), line)
    spark.stop()
  }
}
