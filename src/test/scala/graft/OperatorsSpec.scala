package graft

import org.apache.spark.sql.functions._

/** Cross-cutting operator invariants at sf0.001. Exact oracle equivalence
  * is the driver gate (tools/localcheck.py); these pin structural
  * properties the oracle can't see.
  */
class OperatorsSpec extends SparkSpec {

  test("every declared query runs and every oracle key has a query") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
    // and the reverse: every query is oracle-backed. A queries entry
    // without an oracleSql twin only gets the driver's weak rows>0 check —
    // this suite has kept the set at zero since r8, so pin it: adding a
    // rows-only query must be an explicit decision here, not an accident.
    val rowsOnly = qs.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty,
      s"rows-only (oracle-less) queries: ${rowsOnly.toSeq.sorted.mkString(",")}")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("histogram rank-selection equals sort-derived exact quantiles on adversarial inputs") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // ties (100 distinct values over 10k rows), heavy right skew
    // (quadratic growth crams most rows into the histogram's low
    // buckets), and an all-equal group (zero extent — the degenerate
    // one-bucket case)
    val rows =
      Seq.tabulate(10000)(i => ("A", (i % 100).toDouble)) ++
      Seq.tabulate(5000)(i => ("B", i.toDouble * i)) ++
      Seq.tabulate(777)(_ => ("C", 42.0))
    val base = rows.toDF("l_returnflag", "l_extendedprice")
    val got = graft.operators.Relational.exactQuantileSelect(base)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // the truth twin: the per-key global sort the selection replaced
    val wp = Window.partitionBy(col("l_returnflag"))
    val wr = wp.orderBy(col("l_extendedprice"))
    val expect = base
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wp))
      .groupBy(col("l_returnflag")).agg(
        max(when(col("rn") === ceil(lit(0.5) * col("n")).cast("long"),
          col("l_extendedprice"))).as("p50x"),
        max(when(col("rn") === ceil(lit(0.95) * col("n")).cast("long"),
          col("l_extendedprice"))).as("p95x"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got === expect,
      "histogram selection must pick the identical k-th-smallest values")
    assert(got("C") === ((42.0, 42.0)), "all-equal group: both quantiles 42")
  }

  test("U1 CJK tier: han bigram recall, latin path unchanged, mixed scripts") {
    import spark.implicits._
    val toks = Seq("深度学习 deep learning 2024", "我", "abc 123", "")
      .toDF("text")
      .select(graft.functions.Text.tokenizeCjk(col("text")).as("toks"))
      .as[Seq[String]].collect()
    assert(toks(0) === Seq("深度", "度学", "学习", "deep", "learning", "2024"))
    assert(toks(1) === Seq("我"), "single-char han span emits itself")
    assert(toks(2) === Seq("abc", "123"), "latin/digit path unchanged")
    assert(toks(3) === Seq.empty)
    // cyrillic runs tokenize as whole lowercased words (the ru tier's
    // documents must not tokenize to nothing)
    val ru = Seq("Распределённый Spark движок 2024").toDF("text")
      .select(graft.functions.Text.tokenizeCjk(col("text")).as("toks"))
      .as[Seq[String]].head
    assert(ru === Seq("распределённый", "spark", "движок", "2024"))
    // full recall: every adjacent han bigram of a pure-CJK keyword survives
    val kw = "搜索关键词分析"
    val got = Seq(kw).toDF("text")
      .select(graft.functions.Text.tokenizeCjk(col("text")).as("toks"))
      .as[Seq[String]].head
    kw.sliding(2).foreach(bg => assert(got.contains(bg), s"missing bigram $bg"))
  }

  test("native tokenize_cjk == composed spec on fixture + multi-script " +
      "edges") {
    import spark.implicits._
    val edges = Seq("深度学习 deep learning 2024", "我", "abc 123", "",
      "Распределённый Spark движок 2024", "中文and русскийmixed直接",
      "emoji 😀 between 汉字 and words", "ВЕРХНИЙ РЕГИСТР", "a中b中c",
      "таб\tи\nперенос", "İstanbul xİy ISTANBUL", null)
    val df = edges.toDF("text").unionByName(
      spark.read.parquet(s"$sfDir/documents.parquet").select("text"))
    val diff = df.select(
        graft.functions.Text.tokenizeCjk(col("text")).as("a"),
        graft.functions.Text.tokenizeCjkSpec(col("text")).as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(diff === 0,
      "native walk must tokenize identically to the composed spec")
  }

  test("tokenizeCjk reduces to tokenize on pure-ASCII text") {
    // guards the flagship keyword job's switch to the script-aware tier
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val a = docs.select(explode(
      graft.functions.Text.tokenize(col("text"))).as("t"))
    val b = docs.select(explode(
      graft.functions.Text.tokenizeCjk(col("text"))).as("t"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("langid: zh tier fires on han-majority text, never on ASCII") {
    val preds = SparkEntry.queries("text_langid")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds(-1L) === "zh", "mixed han-majority row")
    assert(preds(-3L) === "zh", "single han char")
    assert(preds(-4L) === "zh", "pure han keyword")
    assert(preds.filter(_._1 >= 0).values.forall(_ != "zh"),
      "ASCII corpus rows must never predict zh")
  }

  test("langid: ru tier fires on cyrillic-majority text only") {
    val preds = SparkEntry.queries("text_langid")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(preds(-21L) === "ru", "pure cyrillic row")
    assert(preds(-22L) === "ru",
      "majority-cyrillic row with a latin term and ё")
    assert(preds(-23L) !== "ru",
      "minority cyrillic must fall through to the later tiers")
    assert(preds.filter(_._1 >= 0).values.forall(_ != "ru"),
      "ASCII corpus rows must never predict ru")
  }

  test("PII scrub: planted emails/phones redacted with correct counts") {
    val rows = SparkEntry.queries("text_pii_scrub")(spark, sfDir)
      .filter(col("doc_id") < 0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows(-11L) === ((1, 1)), "one email + one phone")
    assert(rows(-12L) === ((2, 2)), "two emails + two phones")
    assert(rows(-13L) === ((0, 0)), "clean row untouched")
    assert(rows(-14L) === ((1, 0)), "mixed-case email caught by (?i)")
    assert(rows(-15L) === ((0, 0)),
      "digit runs / dates / ID lists must NOT be redacted as phones")
  }

  test("banded interval join == naive join on boundary-adversarial and " +
      "random event fixtures") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The r15 banded j3 plan verifies with exact predicates, so its only
    // failure class is CANDIDATE COVERAGE: a true pair whose click
    // bucket falls outside the purchase's exploded bucket range — see
    // J3Fixture for the boundary-adversarial construction (window edges
    // ±1 µs, bucket-boundary-aligned purchases, seeded random cloud).
    // Pin banded == naive engine-vs-engine over it.
    val edges = J3Fixture.edges
    val ev = J3Fixture.eventsDf(spark, J3Fixture.rows())
    val dir = java.nio.file.Files.createTempDirectory("j3band").toString
    ev.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val banded = graft.operators.Relational
      .queries("j3_interval_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pay = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pay_id"), col("user_id").as("pay_user"),
        col("ts").as("pay_ts"))
    val det = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
    val naive = pay.join(det,
        col("pay_user") === col("click_user") &&
        col("pay_ts") >= col("click_ts") - expr("interval 15 minutes") &&
        col("pay_ts") <= col("click_ts") + expr("interval 15 seconds"))
      .select(col("pay_id"), col("click_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === naive,
      s"banded-only=${banded -- naive} naive-only=${naive -- banded}")
    // the fixture must actually exercise both window edges: the exact
    // −15 s and +15 min offsets are IN, the ±1 µs overshoots are OUT
    assert(naive.nonEmpty && (banded -- naive).isEmpty)
    val inEdges = edges.count(o => o >= -900000000L && o <= 15000000L)
    assert(edges.zipWithIndex.count { case (_, i) =>
      naive.exists(p => p._1 == 2L * i) } == inEdges,
      "every in-window edge pair must match, every out-of-window must not")
  }

  test("mm content-class space scales with spark.graft.mmClasses " +
      "(the scale harness's clone-density knob, VERDICT r15 #2)") {
    // default 100 is the oracle contract; the harness raises it ∝ k so
    // clone density stays constant at scale. sf0.001's 500 docs cover
    // every residue of both moduli, so distinct phashes must grow.
    def distinctHashes(): Long = graft.operators.Multimodal
      .phashes(spark, sfDir).select("phash").distinct().count()
    val d100 = distinctHashes()
    spark.conf.set("spark.graft.mmClasses", "400")
    try {
      val d400 = distinctHashes()
      assert(d400 > d100,
        s"400-class space must yield more distinct hashes: $d400 vs $d100")
    } finally spark.conf.unset("spark.graft.mmClasses")
  }

  test("sampled band-coverage audit: mod=1 equals the full audit; the " +
      "pigeonhole guarantee holds on the sampled tier") {
    import org.apache.spark.sql.functions.col
    def rows(q: String) = SparkEntry.queries(q)(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    // mod=1 keeps every class → the sampled query IS the full audit
    spark.conf.set("spark.graft.bandAuditMod", "1")
    try assert(rows("mm_phash_band_coverage_sampled") ===
      rows("mm_phash_band_coverage"))
    finally spark.conf.unset("spark.graft.bandAuditMod")
    // default mod 2 (the oracle pin): a PROPER nonempty subsample, and
    // hamming ≤ 3 must still read exactly 10⁶ ppm — the guarantee is a
    // theorem on every pair, sampled or not
    val sampled = SparkEntry
      .queries("mm_phash_band_coverage_sampled")(spark, sfDir)
    val g = sampled.filter(col("guaranteed")).collect()
    assert(g.nonEmpty, "sampled audit must retain guaranteed-band rows")
    g.foreach(r => assert(r.getLong(3) === 1000000L,
      s"pigeonhole violated on sampled tier: $r"))
    val full = SparkEntry.queries("mm_phash_band_coverage")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum(col("n_pairs"))).collect()(0).getLong(0)
    val sub = sampled
      .agg(org.apache.spark.sql.functions.sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(sub > 0 && sub < full,
      s"mod 2 must be a proper nonempty subsample: $sub vs $full")
  }

  test("j3 fails loudly in a non-UTC session instead of silently " +
      "dropping rows (ADVICE r15)") {
    // the banded bucket math is epoch-exact only under UTC; a DST session
    // would MISS true pairs' click buckets — incomplete results, the
    // worst failure mode — so query construction must refuse
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try intercept[IllegalArgumentException] {
      graft.operators.Relational.queries("j3_interval_join")(spark, sfDir)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // ...but any EFFECTIVELY-UTC zone id passes (ADVICE r16): Spark
    // defaults the conf to the JVM zone, so exact string equality
    // rejected sessions where the bucket math is in fact exact
    Seq("Etc/UTC", "GMT", "+00:00").foreach { z =>
      spark.conf.set("spark.sql.session.timeZone", z)
      try graft.operators.Relational.queries("j3_interval_join")(spark, sfDir)
      finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    // a fixed but NONZERO offset still refuses (epoch buckets shift)
    spark.conf.set("spark.sql.session.timeZone", "+05:30")
    try intercept[IllegalArgumentException] {
      graft.operators.Relational.queries("j3_interval_join")(spark, sfDir)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("mm: codec stages get the parallelism floor on a single-split " +
      "scan, and no repartition when the scan is already wide") {
    import org.apache.spark.sql.functions.col
    // sf0.001 documents is one small parquet file = ONE scan split; the
    // floor (Multimodal.spreadToCores, VERDICT r14 #4) must widen the
    // codec stage to defaultParallelism so the decode never runs
    // serially on one core of a many-core executor
    val cores = spark.sparkContext.defaultParallelism
    val narrow = graft.operators.Multimodal
      .queries("mm_decode_features")(spark, sfDir)
    assert(narrow.queryExecution.toRdd.getNumPartitions >= cores,
      "single-split codec stage must widen to defaultParallelism")
    // a scan that already carries >= cores splits must pass through
    // UNTOUCHED — the floor must not add a shuffle on a real corpus.
    // Tiny fixture files pack into one split under the default 4 MB
    // openCost (that packing is exactly why the floor exists), so the
    // wide-scan regime is forced with small split confs, then restored.
    val wide = 2 * cores
    val dir = java.nio.file.Files.createTempDirectory("mmwide").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(wide, col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val confs = Seq("spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    confs.foreach(k => spark.conf.set(k, "8192"))
    try {
      val already = graft.operators.Multimodal
        .queries("mm_decode_features")(spark, dir)
      assert(already.queryExecution.toRdd.getNumPartitions >= wide,
        "wide scan must keep its own splits (no coalescing repartition)")
      assert(!already.queryExecution.executedPlan.toString.contains("Exchange"),
        "no shuffle may be added when the scan is already wide")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("mm: synthesized payload is a real PNG and ImageIO decodes its dims") {
    import graft.operators.Multimodal
    val png = Multimodal.synthPng(42L, Array.fill(100)(1.toByte))
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    assert(png.take(8).map(_ & 0xff).sameElements(magic), "PNG signature")
    val (w, h, c) = Multimodal.decodeImage(png)
    assert(w === 1 + 100 % 31)
    assert(h === 1 + (42 % 17))
    assert(c === 3)
    // real resample: output PNG decodes to exactly the requested geometry
    val (rw, rh, rc) = Multimodal.decodeImage(Multimodal.resizePng(png, 224, 77))
    assert((rw, rh, rc) === ((224, 77, 3)))
  }

  test("mm: animated GIF round-trips frame count, dims and pixel values") {
    import graft.operators.Multimodal
    val gif = Multimodal.synthGif(42L, Array.fill(100)(1.toByte))
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"), "GIF magic")
    val frames = Multimodal.decodeGifFrames(gif)
    assert(frames.length === 1 + 42 % 4, "frame count decoded from stream")
    frames.zipWithIndex.foreach { case ((w, h, px), i) =>
      assert(w === 1 + 100 % 31)
      assert(h === 1 + 42 % 17)
      assert(px === (42 * 31 + i * 7) % 256,
        s"frame $i gray fill must survive the GIF palette round-trip")
    }
    // total over negative doc_ids (the planted-fixture convention)
    val neg = Multimodal.decodeGifFrames(
      Multimodal.synthGif(-5L, Array.fill(3)(1.toByte)))
    assert(neg.length === 1 + java.lang.Math.floorMod(-5L, 4L).toInt)
    assert(neg.head._2 === 1 + java.lang.Math.floorMod(-5L, 17L).toInt)
    assert(Multimodal.decodeImage(
      Multimodal.synthPng(-5L, Array.fill(3)(1.toByte)))._2 ===
      1 + java.lang.Math.floorMod(-5L, 17L).toInt,
      "synthPng must be total over negative doc_ids")
  }

  test("mm: synthesized audio is a real WAV and AudioSystem decodes it") {
    import graft.operators.Multimodal
    val wav = Multimodal.synthWav(7L, Array.fill(123)(1.toByte))
    assert(new String(wav.take(4), "US-ASCII") === "RIFF", "RIFF magic")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (rate, frames, ch) = Multimodal.decodeWav(wav)
    assert(rate === 8000)
    assert(frames === 500 + 123 % 1000)
    assert(ch === 1)
  }

  test("X1 conservation: splits partition the filtered stream") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val sp = graft.operators.LogSplit.splits(ev)
    val base = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val perType = Seq("page", "start", "err", "action").map(sp(_).count()).sum
    val purchases = base.filter(col("event_type") === "purchase").count()
    assert(perType + purchases === base.count(),
      "page+start+err+action+purchase must equal all filtered rows")
    // display rows == Σ (k % 3) + 1 over purchase rows
    val expectedDisplays = base.filter(col("event_type") === "purchase")
      .select(sum(expr("get_json_object(props, '$.k') % 3 + 1")))
      .first().getLong(0)
    assert(sp("display").count() === expectedDisplays)
  }

  test("J4 dim join broadcasts the dim side (no shuffle of dims)") {
    val plan = graft.operators.Relational
      .queries("j4_lookup_dim_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dim join must not shuffle")
  }

  test("J5 config join broadcasts the config side") {
    val plan = graft.operators.Relational
      .queries("j5_broadcast_config_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q1 scan prunes columns and pushes the shipdate filter") {
    val plan = graft.operators.Relational
      .queries("q1_pricing_summary")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      plan.take(3000))
    // only the 6 needed columns reach the scan
    assert(!plan.contains("l_partkey"), "column pruning failed")
  }

  test("IVF centroid assignment is shuffle-free: no corpus Exchange, no Window") {
    val (assigned, _) = graft.operators.Similarity.ivf(spark, sfDir, 16, 4)
    val plan = assigned.queryExecution.executedPlan.toString
    // the r2 plan shuffled a 16x-expanded corpus through a window to rank
    // centroids; the argmax form must keep the corpus narrow end to end
    assert(!plan.contains("Window"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(vec_id"), plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("bpe merges: global top-K is TakeOrderedAndProject, not a data-sized window") {
    val plan = graft.operators.TextAnalysis
      .queries("text_bpe_merges")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // an unpartitioned row_number + literal filter does NOT get the
    // WindowGroupLimit cut (r9 plan audit) — the global rank must ride
    // orderBy+limit so the distinct-pair relation is top-K'd per
    // partition instead of sorted through one window partition
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("pack manifest: top-source cut is a partitioned WindowGroupLimit") {
    val plan = graft.operators.TextAnalysis
      .queries("corpus_pack_manifest")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }

  test("J7 as-of join: no Join node, both matched and unmatched clicks") {
    val df = graft.operators.Relational
      .queries("j7_asof_join")(spark, sfDir)
    // the union-and-window form achieves join semantics with zero join
    // operators — ONE Exchange on the key + one Sort, no candidate
    // explosion; a Join node here would mean a range-join regression
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(2000))
    assert(!plan.contains("Join"), plan.take(2000))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(3)),
      "clicks before the user's first purchase must keep NULL attribution")
    assert(rows.exists(!_.isNullAt(3)), "attributed clicks must exist")
    // spot-check one attributed click against a direct computation
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val some = rows.filter(!_.isNullAt(3)).head
    val (clickId, userId, payId) =
      (some.getLong(0), some.getLong(1), some.getLong(3))
    // events.ts is TIMESTAMP_NTZ in the fixture parquet, so Row.getTimestamp
    // would ClassCastException on the LocalDateTime; keep the value untyped
    // and push the comparison back into the engine via lit()
    val clickTs = ev.filter(col("event_id") === clickId)
      .select(col("ts")).first().getAs[Any](0)
    val best = ev.filter(col("user_id") === userId &&
        col("event_type") === "purchase" && col("ts") <= lit(clickTs))
      .orderBy(col("ts").desc, col("event_id").desc)
      .select(col("event_id")).first().getLong(0)
    assert(payId === best, "as-of pick must be the latest prior purchase")
  }

  test("bloom decontamination gate prunes the train side, result ungated-identical") {
    val (candidates, train, bench) = graft.operators.TextAnalysis
      .bloomParts(spark, sfDir)
    val (nCand, nTrain) = (candidates.count(), train.count())
    assert(nCand < nTrain / 10,
      s"bloom must prune the corpus before the verify join ($nCand of $nTrain survived)")
    // gated result ≡ ungated exact decontamination (no false negatives;
    // false positives die in the verify join)
    val gated = SparkEntry.queries("text_decontam_bloom")(spark, sfDir)
    val ungated = train.select(col("doc_id"), col("fp"))
      .join(bench, Seq("fp"), "left_semi").select(col("doc_id"), col("fp"))
    assert(gated.exceptAll(ungated).count() === 0 &&
      ungated.exceptAll(gated).count() === 0)
    // the bitmap probe is a narrow filter over a 1-row broadcast — the
    // corpus side must not shuffle to reach it
    val plan = candidates.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("salient terms: top-k plan uses WindowGroupLimit, ranks contiguous") {
    val df = graft.operators.TextAnalysis
      .queries("text_salient_terms")(spark, sfDir)
    // rank<=k must prune per-partition BEFORE the ranking exchange — a
    // full Window sort of every (doc, token) row would not scale
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    val byDoc = df.collect().groupBy(_.getLong(0))
    byDoc.values.foreach { rows =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1 to ranks.length), "ranks must be 1..k")
      assert(ranks.length <= 3)
    }
  }

  test("unigram rarity: scores match a driver recompute exactly") {
    val df = graft.operators.TextAnalysis
      .queries("text_unigram_rarity")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // independent recompute of the whole pipeline (tokenize → corpus
    // frequency → integer inverse-frequency sum → one division)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val cf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val want = docs.collect { case (id, toks) if toks.nonEmpty =>
      val n = toks.length.toLong
      val sum = toks.map(t => 1000000L / cf(t)).sum
      val rarity = sum.toDouble / n.toDouble
      id -> (n, sum, rarity, rarity > 250000.0)
    }.toMap
    assert(got === want)
    // the gate is not degenerate on real data: both classes occur
    assert(got.values.exists(_._4) || sfDir.contains("0.001"),
      "no tail docs at all")
  }

  test("stratified exact sampling: per-cell budgets met, WindowGroupLimit plan") {
    val df = graft.operators.TextAnalysis
      .queries("sample_stratified_exact")(spark, sfDir)
    // the literal max-budget prefilter must compile to WindowGroupLimit —
    // per-partition top-max(k) before the ranking exchange; without it
    // every cell's full roster rides the sort (the banned shape)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val budgets = Map("en" -> 7, "zh" -> 5, "de" -> 3)
    // exactly min(k, |cell|) docs per configured cell, ranks contiguous,
    // unconfigured langs absent
    assert(rows.map(_._1).toSet.subsetOf(budgets.keySet))
    val cells = graft.core.Tables.load(spark, sfDir, "documents")
      .groupBy(org.apache.spark.sql.functions.col("lang"),
        org.apache.spark.sql.functions.col("source"))
      .count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.groupBy(r => (r._1, r._2)).foreach { case ((lang, src), cell) =>
      val want = math.min(budgets(lang).toLong, cells((lang, src)))
      assert(cell.length.toLong === want,
        s"cell ($lang, $src) must hold exactly $want docs, got ${cell.length}")
      assert(cell.map(_._3).sorted.sameElements(1 to cell.length))
    }
  }

  test("token budget: selection is the maximal quality-ordered prefix") {
    val sel = SparkEntry.queries("corpus_token_budget")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sel.nonEmpty && sel.values.sum <= 12000L,
      "selected token mass must fit the budget")
    // reference order: (score DESC, doc_id ASC) computed directly
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.Text.bpeishTokenCount(col("text")).cast("long")
          .as("toks"),
        graft.functions.Text.stopwordRatio(col("text")).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, _, s) => (-s, id) }
    // the selected set must be exactly the greedy prefix of that order
    var cum = 0L
    docs.foreach { case (id, toks, _) =>
      cum += toks
      assert(sel.contains(id) === (cum <= 12000L),
        s"doc $id: prefix membership must follow the running total")
    }
  }

  test("winnowing guarantee: docs sharing a k+w-1 token run share a fingerprint") {
    import spark.implicits._
    // an 8-token run (k=5, w=4 → threshold 8) embedded in DIFFERENT
    // surrounding context on each side — the published winnowing
    // guarantee says at least one selected fingerprint must coincide
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five six seven $shared red green blue"),
      (2L, s"north south east west up down $shared left right over under"),
      (3L, "entirely different words nothing matching anything else " +
        "in this sentence at all whatsoever today"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextAnalysis.winnowFps(docs, 5, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "shared 8-token run must yield a shared winnowed fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty,
      "no shared grams → no shared fingerprints")
    // density: winnowing selects a fraction of all grams, never zero
    byDoc.values.foreach(s => assert(s.nonEmpty))
    val nGrams1 = 18 - 5 + 1 // doc 1 token count minus gram span
    assert(byDoc(1L).size < nGrams1, "selection must be sparser than all grams")
  }

  test("mixture sampling: rate-100 langs keep everything, rates order the kept shares") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val total = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.operators.TextAnalysis
      .queries("sample_mixture_weights")(spark, sfDir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") === total("en"), "keep_pct=100 must keep every doc")
    // hash-mod membership is exact in expectation, not per-draw; only the
    // deterministic full-keep tier admits an equality assertion
    Seq("zh", "de", "fr", "es").foreach { l =>
      assert(kept.getOrElse(l, 0L) <= total(l))
    }
    assert(kept.getOrElse("es", 0L).toDouble / total("es") <
      kept("zh").toDouble / total("zh"),
      "a 10% rate must keep a smaller share than an 80% rate")
  }

  test("dedup pair relations never cartesian-join the corpus") {
    // the 100 TB invariant: candidates meet only inside buckets/blocks —
    // an unconditioned join anywhere here would be corpus² at scale
    Seq("dedup_minhash_lsh", "dedup_keep_canonical",
        "dedup_embedding_canonical", "dedup_embedding_lsh",
        "sim_pairs_threshold", "text_contamination",
        "text_contamination_neardup",
        // round-6 multi-relation queries: all joins are keyed (equi /
        // anti / salted-equi) — only the 1-row-broadcast ops (IVF, SQ,
        // bloom) legitimately show BroadcastNestedLoopJoin and are
        // covered by their own plan pins instead
        "j8_salted_join", "pipeline_clean_corpus", "corpus_token_budget",
        "text_salient_terms",
        // round-7 TPC-H-shape additions: all equi-joined
        "q3_shipping_priority", "q18_large_volume_customer").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(2000)}")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q: ${plan.take(2000)}")
    }
  }

  test("TPC-H-shape plans: q3 top-k, q5 broadcast dims, q18 agg-then-join") {
    // q3's LIMIT after ORDER BY must compile to TakeOrderedAndProject —
    // per-partition top-k with one tiny merge, never a global sort
    val p3 = SparkEntry.queries("q3_shipping_priority")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p3.contains("TakeOrderedAndProject"), p3.take(2000))
    // q5's bounded nation⋈region dim (≤125 rows at ANY SF) must ride a
    // broadcast join, never shuffle the fact side for it
    val p5 = SparkEntry.queries("q5_local_supplier_volume")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p5.contains("BroadcastHashJoin"), p5.take(2000))
    assert(!p5.contains("CartesianProduct"), p5.take(2000))
    // q18: the lineitem HashAggregate must sit BELOW the orders join —
    // the >300 filter shrinks the join input ~100×; joining raw lineitem
    // first would shuffle the full fact table twice
    val q18 = SparkEntry.queries("q18_large_volume_customer")(spark, sfDir)
    val agg = q18.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(agg.nonEmpty)
    val joinsUnderAgg = agg.head.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joinsUnderAgg.isEmpty,
      "the quantity aggregate must not contain a join beneath it")
  }

  test("A4 exact dedup matches approx HLL within 5% (per-day verdict)") {
    val out = graft.operators.Stateful
      .queries("approx_uv_hll")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)),
      out.filterNot(_.getBoolean(2)).mkString("; "))
    // cross-check the exact twin against the a4 exact-state path
    val exact = graft.operators.Stateful
      .queries("a4_uv_per_day")(spark, sfDir)
      .agg(sum(col("uv_ct"))).first().getLong(0)
    assert(out.map(_.getLong(1)).sum === exact)
  }

  test("dedup_minhash candidates are verified near-dups (no false positives)") {
    val pairs = graft.operators.Dedup
      .queries("dedup_minhash_lsh")(spark, sfDir).collect()
    // every emitted pair passed the >= 0.6 Jaccard verify by construction;
    // structural sanity: a < b, no self-pairs, no duplicates
    val tuples = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(tuples.forall { case (a, b) => a < b })
    assert(tuples.distinct.length === tuples.length)
  }

  test("13-gram decontamination: planted overlaps flagged, 12-gram is not") {
    val out = graft.operators.TextAnalysis
      .queries("text_contamination_ngram")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // -31 embeds exactly one 13-token run from bench doc -101
    assert(out.get(-31L) === Some(1L))
    // -34 is a verbatim clone of the 15-token bench doc -102 -> 3 grams
    assert(out.get(-34L) === Some(3L))
    // a 12-token overlap is one short of the threshold; no overlap at all
    // must also stay silent; bench docs themselves are never flagged
    assert(!out.contains(-32L), "12-gram overlap must not flag")
    assert(!out.contains(-33L))
    assert(!out.contains(-101L) && !out.contains(-102L))
  }

  test("approx quantiles sit within 1% of the exact rank-selected values") {
    val out = graft.operators.Relational
      .queries("q_quantiles_approx")(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(3)), out.mkString("; "))
    // exact percentiles are ordered: p50 <= p95 within every group
    out.foreach { r =>
      assert(BigDecimal(r.getString(1)) <= BigDecimal(r.getString(2)))
    }
  }

  test("snapshot diff partitions the corpus into consistent change classes") {
    val out = graft.operators.TextAnalysis
      .queries("corpus_snapshot_diff")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byClass = out.groupBy(_._2).view.mapValues(_.length).toMap
    // membership buckets are 5%/5%/10% slices of the corpus — every class
    // must be represented, and each doc_id appears exactly once
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(byClass.keySet), byClass.toString)
    assert(out.map(_._1).distinct.length === out.length)
    // diff covers the union of both snapshots: every corpus doc except
    // the ones in neither slice (bucket in [95,100) ∩ [0,5) = none)
    val total = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(out.length === total.toInt)
  }

  test("temperature sampling flattens the head language, keeps the tail") {
    // sf0.01: the only fixture where the head language's count pushes its
    // keep rate below 1 (10/sqrt(218) ≈ 0.68) while every tail language
    // stays at 100% — the flattening the α-sampling exists to produce
    val dir = "/root/testdata/sf0.01"
    val all = graft.core.Tables.load(spark, dir, "documents")
      .groupBy(org.apache.spark.sql.functions.col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.operators.TextAnalysis
      .queries("sample_temperature_alpha")(spark, dir)
      .collect().groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val head = all.maxBy(_._2)._1
    assert(kept(head) < all(head), s"head language $head must downsample")
    all.filter { case (l, n) => l != head && 10.0 / math.sqrt(n.toDouble) >= 1.0 }
      .foreach { case (l, n) =>
        assert(kept(l) === n, s"tail language $l must keep everything")
      }
  }

  test("line dedup: boilerplate dropped everywhere, at-threshold lines kept") {
    val out = graft.operators.TextAnalysis
      .queries("text_line_dedup")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // the banner rides 4 docs (> maxDocs=2): dropped from every one —
    // including -57, which was ONLY banner and must clean to empty
    assert(out(-57L) === (("d41d8cd98f00b204e9800998ecf8427e", 0L, 1L)),
      s"all-boilerplate doc must clean to the empty fingerprint: ${out(-57L)}")
    assert(out(-51L)._2 === 2L && out(-51L)._3 === 1L)
    assert(out(-52L)._3 === 1L && out(-53L)._3 === 1L)
    // a line shared by exactly maxDocs docs is NOT boilerplate
    assert(out(-54L)._3 === 0L && out(-55L)._3 === 0L)
    assert(out(-56L)._2 === 1L && out(-56L)._3 === 0L)
    // corpus docs are single-line and unique at this SF: all untouched
    assert(out.collect { case (id, v) if id >= 0 => v._3 }.forall(_ == 0L))
  }

  test("incremental corpus pipeline equals a full re-run on the new snapshot") {
    import org.apache.spark.sql.functions._
    // materialize the NEW snapshot (the same deterministic slice +
    // revision rule the diff fixture uses) as its own documents table,
    // run the FULL front door over it, and demand the incremental query
    // reproduce it row-for-row — the Spark-side twin of the DuckDB
    // oracle's full-re-run identity
    def bucket(salt: String) =
      conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))),
        1, 6), 16, 10).cast("long") % 100
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val newSnap = docs.filter(bucket("mem|") >= 5)
      .withColumn("text", when(bucket("upd|") < 10,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("newsnap").toString
    newSnap.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val full = graft.operators.TextAnalysis
      .queries("pipeline_clean_corpus")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val incr = graft.operators.TextAnalysis
      .queries("pipeline_incremental_corpus")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(incr === full,
      "patch-and-rededup must equal the full front door on the new snapshot")
    // the interesting incremental transitions actually occur: some docs
    // were retired from, and some inserted into, yesterday's cleaned
    // corpus (= the full front door over the OLD snapshot)
    val oldDir = java.nio.file.Files.createTempDirectory("oldsnap").toString
    docs.filter(bucket("mem|") < 95)
      .write.mode("overwrite").parquet(s"$oldDir/documents.parquet")
    val old = graft.operators.TextAnalysis
      .queries("pipeline_clean_corpus")(spark, oldDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert((old -- incr).nonEmpty, "no doc was ever retired — fixture inert")
    assert((incr -- old).nonEmpty, "no doc was ever added — fixture inert")
  }

  test("hashed quality classifier: narrow plan, discriminative, edge fixtures") {
    val df = graft.operators.TextAnalysis
      .queries("text_quality_classifier")(spark, sfDir)
    // the whole classifier must stay a narrow scan: features live inside
    // one aggregate() HOF — no explode rows, no Exchange anywhere
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Generate"), plan.take(2000))
    val rows = df.collect().map(r => (r.getLong(0),
      r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getBoolean(3)))
    val kept = rows.count(_._4)
    assert(kept > 0 && kept < rows.length,
      s"classifier must split the corpus, kept $kept of ${rows.length}")
    // planted edges: -71 has zero alnum tokens (NULL score, keep=false),
    // -72 is a single token (1 feature — the bigram guard fired, score
    // defined)
    val m = rows.map(r => r._1 -> r).toMap
    assert(m(-71L)._2 === 0L && m(-71L)._3.isEmpty && !m(-71L)._4)
    assert(m(-72L)._2 === 1L && m(-72L)._3.nonEmpty)
    // n_feats = 2·|toks| − 1 for any multi-token doc (unigrams + bigrams)
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.functions.Text.tokenize(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    toks.filter(_._2 >= 2).take(50).foreach { case (id, n) =>
      assert(m(id)._2 === 2 * n - 1, s"doc $id") }
  }

  test("top n-grams: WindowGroupLimit plan, k per lang, counts ordered") {
    val df = graft.operators.TextAnalysis
      .queries("text_top_ngrams")(spark, sfDir)
    // the literal rank<=10 cut must take per-partition top-k BEFORE the
    // ranking exchange; gram strings must not appear in the counting
    // aggregate (thin gfp key only)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    val rows = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length === 10, s"$lang returned ${rs.length} grams")
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1 to 10), s"$lang ranks not contiguous")
      // counts non-increasing in rank order
      byRank.map(_._3).sliding(2).foreach { case Array(a, b) =>
        assert(a >= b, s"$lang counts not ordered") }
      // every reported gram really is an 8-token sequence
      rs.foreach { case (_, gram, _, _) =>
        assert(gram.split(" ").length === 8, s"bad gram: $gram") }
    }
  }

  test("global exact-k sample: TakeOrderedAndProject plan, k stable rows") {
    val df = graft.operators.TextAnalysis
      .queries("sample_exact_k_global")(spark, sfDir)
    // a literal limit over a deterministic order must compile to
    // per-partition top-k + merge, never a global sort or a
    // single-partition exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    val a = df.collect().map(_.getLong(0)).toSeq
    val b = graft.operators.TextAnalysis
      .queries("sample_exact_k_global")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b, "sample must be stable across reruns")
    assert(a.length === 100 && a.distinct.length === 100)
  }

  test("kneser-ney: per-context normalization identity, coverage, spread") {
    import graft.operators.TextAnalysis
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // re-derive the model exactly as the query does, then pin the KN
    // defining property: for every SEEN context w1, the full-vocab sum
    // Sum_w2 p(w2|w1) is 1 up to the documented truncation slack
    val bigrams = TextAnalysis.bigramsOf(docs)
    val cb = TextAnalysis.lmTrainSplit(bigrams)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cfw = cb.groupBy(col("w1"))
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1p_fw"))
    val cbw = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bw"))
    val tt = cb.agg(count(lit(1)).as("t_types"))
    val vocabW2 = cbw.count()
    val sums = cfw.crossJoin(cbw) // model-sized (V x V), test scale only
      .join(cb, Seq("w1", "w2"), "left")
      .crossJoin(tt)
      .withColumn("p_micro", expr(
        "(CASE WHEN cb IS NULL THEN 0 " +
          "ELSE ((4 * cb - 3) * 250000) DIV c1 END) + " +
          "((750000 * n1p_fw * n1p_bw) DIV t_types) DIV c1"))
      .groupBy(col("w1")).agg(sum(col("p_micro")).as("norm_micro"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val n = r.getLong(1)
      assert(n <= 1000000L && n > 1000000L - (2 * vocabW2 + 2),
        s"context ${r.getString(0)}: norm $n outside the truncation band")
    }
    // the query itself: one row per >=2-token doc, scores that spread
    val out = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .collect()
    val nEligible = docs.filter(
      size(graft.functions.Text.tokenize(col("text"))) >= 2).count()
    assert(out.length.toLong === nEligible)
    assert(out.map(_.getLong(2)).distinct.length > 10,
      "per-doc KN sums must discriminate, not collapse")
  }

  test("kneser-ney: fused model rollup ≡ r17 per-relation rollups") {
    // r18 rebuilt the KN model as ONE union rollup (c1/n1p_fw/n1p_bw in a
    // single pass over cb, t_types = Σ n1p_fw) where r17 ran three
    // separate rollups. The boundary cases differ in REPRESENTATION
    // (n1p_fw/n1p_bw 0 instead of a missed-join NULL) but not in any
    // output value; pin the whole query output against the r17
    // formulation recomputed verbatim.
    import graft.operators.TextAnalysis
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val bigrams = TextAnalysis.bigramsOf(docs)
    val cb = TextAnalysis.lmTrainSplit(bigrams)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cfw = cb.groupBy(col("w1"))
      .agg(sum(col("cb")).as("c1"), count(lit(1)).as("n1p_fw"))
    val cbw = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bw"))
    val tt = cb.agg(count(lit(1)).as("t_types"))
    val r17Form = bigrams
      .join(cb, Seq("w1", "w2"), "left")
      .join(broadcast(cfw), Seq("w1"), "left")
      .join(broadcast(cbw), Seq("w2"), "left")
      .join(broadcast(tt), lit(true))
      .withColumn("p_micro", expr(
        "CASE WHEN c1 IS NULL THEN " +
          "(CASE WHEN n1p_bw IS NULL THEN 0 " +
          "ELSE (1000000 * n1p_bw) DIV t_types END) " +
          "ELSE (CASE WHEN cb IS NULL THEN 0 " +
          "ELSE ((4 * cb - 3) * 250000) DIV c1 END) + " +
          "((750000 * n1p_fw * coalesce(n1p_bw, 0)) DIV t_types) DIV c1 " +
          "END"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("kn_micro_sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val now = SparkEntry.queries("text_kneser_ney")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(now.length === r17Form.length)
    assert(now === r17Form, "fused KN model must reproduce the r17 scores")
  }

  test("longest duplicated substring: planted answer, fixture sanity") {
    import spark.implicits._
    // two docs share a known 43-char normalized span; everything else
    // in the corpus is unique text, so max_dup_len must be exactly 43
    val shared = "the quick brown fox jumps over the lazy dog"
    val norm = shared.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    val docs = Seq(
      (0L, s"alpha unique prefix $shared", "en", "s0", 10L),
      (1L, s"$shared omega unique suffix", "en", "s0", 10L),
      (2L, "completely different content about catalyst rules", "en",
        "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("longdup").toString
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextAnalysis
      .queries("text_longest_dup")(spark, dir).collect()(0)
    assert(r.getLong(0) === norm.length.toLong,
      s"expected ${norm.length}, got ${r.getLong(0)} (${r.getString(2)})")
    assert(r.getString(2) === norm)
    assert(r.getLong(3) === 2L)
    // fixture sanity: the answer is a real duplicated substring — its
    // reported example occurs >= 2 times when recounted from scratch
    val f = graft.operators.TextAnalysis
      .queries("text_longest_dup")(spark, sfDir).collect()(0)
    val (l, ex) = (f.getLong(0), f.getString(2))
    assert(l > 0 && ex.length.toLong === l)
    val occ = graft.core.Tables.load(spark, sfDir, "documents")
      .select(graft.functions.Text.normalize(col("text")).as("n"))
      .collect().map { row =>
        val s = row.getString(0); var c = 0; var i = s.indexOf(ex)
        while (i >= 0) { c += 1; i = s.indexOf(ex, i + 1) }; c
      }.sum
    assert(occ >= 2, s"reported example occurs $occ times")
  }

  test("k-anonymity: doc conservation, violation scalar recompute") {
    val rows = graft.operators.TextAnalysis
      .queries("privacy_k_anonymity")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    // every document lands in exactly one equivalence class bucket
    assert(rows.map(_._3).sum === n)
    rows.foreach { case (b, _, _, lo, hi, _) =>
      assert(lo <= hi, s"bucket $b min>max")
      assert((63 - java.lang.Long.numberOfLeadingZeros(lo)) === b &&
        (63 - java.lang.Long.numberOfLeadingZeros(hi)) === b,
        s"bucket $b sizes [$lo,$hi] outside the log2 cell")
    }
    // the k=8 violation ppm recomputed from scratch on the driver
    val sizes = docs.groupBy(col("lang"), col("source"),
        expr("length(bin(greatest(n_chars, 1))) - 1"))
      .count().collect().map(_.getLong(3))
    val wantPpm = sizes.filter(_ < 8).sum * 1000000L / sizes.sum
    assert(rows.map(_._6).distinct.toSeq === Seq(wantPpm))
  }

  test("dup profile: window conservation, longest-dup consistency") {
    val rows = graft.operators.TextAnalysis
      .queries("text_dup_profile")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      Seq(8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L))
    rows.foreach { case (l, nw, nd, ndup, ppm) =>
      assert(nd <= nw && ndup <= nw, s"L=$l counts inconsistent")
      assert(ppm == (if (nw > 0) ndup * 1000000 / nw else 0L))
    }
    // longer windows are a subset-count of shorter ones
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.reverse.toSeq)
    // cross-operator consistency: duplication exists at every grid
    // length <= the longest duplicated substring, and at none above it
    val longest = graft.operators.TextAnalysis
      .queries("text_longest_dup")(spark, sfDir).collect()(0).getLong(0)
    rows.foreach { case (l, _, _, ndup, _) =>
      if (l <= longest) assert(ndup > 0,
        s"L=$l <= longest=$longest must show duplication")
      else assert(ndup === 0L,
        s"L=$l > longest=$longest cannot show duplication")
    }
  }

  test("weighted A-ES sample: top-k plan, driver recompute, length bias") {
    val df = graft.operators.TextAnalysis
      .queries("sample_weighted_ares")(spark, sfDir)
    // one narrow pass + per-partition top-k: no global sort, no exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("Exchange"), plan.take(2000))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(3)))
    // exactness: the distributed top-k equals a from-scratch driver
    // recompute of the full A-ES key ranking
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.map { case (id, text) =>
      val w = math.max(text.toLowerCase.split("[^a-z0-9]+")
        .count(_.nonEmpty), 1).toLong
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ares|$id".getBytes("UTF-8"))
      val u = md.take(5).foldLeft(0L)((a, b) => (a << 8) | (b & 0xFFL)) + 1L
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(u)
      val qlog = 1048576L * msb + ((u - (1L << msb)) * 1048576L) / (1L << msb)
      (id, ((41943040L - qlog) * 262144L) / w)
    }.sortBy { case (id, k) => (k, id) }.take(100)
    assert(got.toSeq === want.toSeq,
      "distributed top-k must equal the driver A-ES recompute")
    // the A-ES property at fixture scale: length-weighted draws select
    // longer docs — sample mean token count well above the corpus mean
    val sampleMeanW = df.agg(avg(col("w"))).collect()(0).getDouble(0)
    val corpusMeanW = docs.map { case (_, t) =>
      math.max(t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty), 1)
    }.sum.toDouble / docs.length
    assert(sampleMeanW > corpusMeanW,
      f"weighted sample mean w $sampleMeanW%.1f must exceed corpus mean " +
        f"$corpusMeanW%.1f")
  }

  test("substring dedup: shared passages strip, within-doc repeats count") {
    val df = graft.operators.TextAnalysis
      .queries("text_substring_dedup")(spark, sfDir)
    // the duplicated-fp set must come back as a broadcast (boilerplate is
    // small by definition — the hot-set discipline)
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val rows = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // -81/-82: exactly the 10-token shared passage strips from BOTH docs,
    // the distinct surroundings survive
    assert(rows(-81L) === ((3L, 10L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("unique one tail".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
    assert(rows(-82L)._1 === 5L && rows(-82L)._2 === 10L)
    // -83: a 12-token run repeated WITHIN one doc — every position covered
    assert(rows(-83L)._1 === 0L && rows(-83L)._2 === 24L)
    // the generated corpus carries PASSAGE-level dups (no whole-doc
    // clones at any sf — verified against the parquet directly), and the
    // operator must both fire on some corpus docs and leave others alone
    val touched = rows.filter { case (id, (_, nd, _)) => id >= 0 && nd > 0L }
    assert(touched.nonEmpty, "no corpus doc shares any 8-gram — inert")
    val untouched = rows.filter { case (id, (_, nd, _)) => id >= 0 && nd == 0L }
    assert(untouched.nonEmpty)
  }

  test("packed corpus: exactly the train survivors, contiguous intervals") {
    val packed = graft.operators.TextAnalysis
      .queries("pipeline_packed_corpus")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val train = graft.operators.TextAnalysis
      .queries("pipeline_clean_corpus")(spark, sfDir)
      .filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every packed doc is a train survivor; every train survivor with
    // tokens is packed
    assert(packed.map(_._1).toSet.subsetOf(train))
    assert(packed.length > 0 && train.size - packed.length <= train.size / 10,
      s"${train.size} survivors but only ${packed.length} packed")
    // the concatenated stream is gapless: sorted by doc_id, each interval
    // starts where the previous ended
    packed.sortBy(_._1).foldLeft(0L) { case (expect, (id, toks, start)) =>
      assert(start === expect, s"gap before doc $id"); start + toks }
  }

  test("health report: docs conserve, rates bounded, clone tier fires") {
    val rows = graft.operators.TextAnalysis
      .queries("corpus_health_report")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    val total = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum === total + 3, "corpus + the planted probe")
    rows.foreach { case (src, docs, chars, keep, clone, langs) =>
      assert(keep >= 0.0 && keep <= 1.0 && clone >= 0.0 && clone <= 1.0)
      assert(langs >= 1 && chars > 0, src)
    }
    // the planted probe source: 2 of its 3 docs are a clone pair
    val probe = rows.find(_._1 == "probe").get
    assert(probe._2 === 3L && math.abs(probe._5 - 2.0 / 3.0) < 1e-9)
    // the classifier is discriminative per-source, not all-or-nothing
    assert(rows.exists(r => r._4 > 0.0 && r._4 < 1.0))
  }

  test("session stats: events conserve and spans are non-negative") {
    val rows = graft.operators.Windows
      .queries("a6_session_stats")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nEvents = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull).count()
    assert(rows.map(_._3).sum === nEvents, "every event is in one session")
    rows.foreach { case (u, ns, ne, span) =>
      assert(ns >= 1 && ne >= ns, s"user $u: $ns sessions, $ne events")
      assert(span >= 0L)
    }
    // sessionization is non-trivial on the fixture: someone has >1 session
    assert(rows.exists(_._2 > 1))
  }

  test("event transitions: steps conserve (events minus users)") {
    val steps = graft.operators.Stateful
      .queries("a9_event_transitions")(spark, sfDir)
      .collect().map(r => r.getLong(2)).sum
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user's n-event chain yields exactly n-1 transitions
    assert(steps === nEvents - nUsers)
  }

  test("cohort retention: day-0 equals cohort size, no cell exceeds it") {
    val cells = graft.operators.Stateful
      .queries("a8_cohort_retention")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(cells.nonEmpty)
    val day0 = cells.filter(_._2 == 0L).map(c => c._1 -> c._3).toMap
    // every cohort has a day-0 row (a signup day is itself an active day)
    val cohorts = cells.map(_._1).distinct
    assert(cohorts.forall(day0.contains))
    // retention never exceeds the cohort's size, and some cohort actually
    // decays (otherwise the deadline/offset logic is vacuous)
    cells.foreach { case (c, off, n) =>
      assert(n <= day0(c), s"cohort $c day $off has $n > ${day0(c)}") }
    assert(cells.exists { case (c, off, n) => off > 0 && n < day0(c) })
  }

  test("funnel: stages shrink monotonically and match a direct recompute") {
    val got = graft.operators.Stateful
      .queries("a7_funnel_steps")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) >= got(2L) && got(2L) >= got(3L), s"non-monotone: $got")
    assert(got(3L) > 0, "fixture inert: nobody completes the funnel")
    // independent recompute on the driver (fixture-sized only)
    val day = 86400000000L
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts").cast("timestamp_ltz")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    def stageMin(u: Long, tpe: String, after: Long): Option[Long] = {
      val ts = byUser(u).filter(e => e._2 == tpe && e._3 > after &&
        e._3 <= after + day).map(_._3)
      if (ts.isEmpty) None else Some(ts.min)
    }
    val t1 = byUser.flatMap { case (u, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else Some(u -> vs.min)
    }
    val t2 = t1.flatMap { case (u, t) => stageMin(u, "click", t).map(u -> _) }
    val t3 = t2.flatMap { case (u, t) => stageMin(u, "purchase", t).map(u -> _) }
    assert(got === Map(1L -> t1.size.toLong, 2L -> t2.size.toLong,
      3L -> t3.size.toLong))
  }

  test("pack spans tile every pack exactly and cover every doc exactly") {
    val spans = graft.operators.TextAnalysis
      .queries("corpus_pack_spans")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val idx = graft.operators.TextAnalysis
      .queries("corpus_pack_sequences")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per doc: spans partition [0, toks) — total coverage, no overlap
    spans.groupBy(_._2).foreach { case (doc, ss) =>
      assert(ss.map(_._4).sum === idx(doc), s"doc $doc not fully covered")
      val ordered = ss.sortBy(_._3)
      ordered.foldLeft(0L) { case (expect, (_, _, from, n, _)) =>
        assert(from === expect, s"doc $doc spans not contiguous"); from + n }
    }
    // per pack: spans tile [0, 512) contiguously; every pack but the last
    // is exactly full
    val lastPack = spans.map(_._1).max
    spans.groupBy(_._1).foreach { case (pack, ss) =>
      val ordered = ss.sortBy(_._5)
      ordered.foldLeft(0L) { case (expect, (_, _, _, n, off)) =>
        assert(off === expect, s"pack $pack has a gap at $expect"); off + n }
      val filled = ordered.map(_._4).sum
      if (pack != lastPack) assert(filled === 512L, s"pack $pack underfull")
      else assert(filled <= 512L)
    }
    // the explode really is multi-pack: some doc crosses a boundary
    assert(spans.groupBy(_._2).exists(_._2.length > 1),
      "no doc spans two packs — fixture inert")
  }

  test("prefix-sum outputs are bucket-count invariant") {
    // the scale knob (spark.graft.prefixSumBuckets) must never change
    // WHAT is computed — only how the running total decomposes; an odd
    // tiny count stresses uneven bucket boundaries
    def rows(q: String) = graft.operators.TextAnalysis
      .queries(q)(spark, sfDir).collect().map(_.toSeq).toSet
    val qs = Seq("corpus_pack_sequences", "corpus_token_budget",
      "corpus_length_batches", "sample_curriculum_order")
    val defaults = qs.map(q => q -> rows(q)).toMap
    graft.core.Barrier.releaseAll(spark)
    spark.conf.set("spark.graft.prefixSumBuckets", "7")
    try qs.foreach { q =>
      assert(rows(q) === defaults(q),
        s"$q changed under a different bucket count")
      graft.core.Barrier.releaseAll(spark)
    } finally spark.conf.unset("spark.graft.prefixSumBuckets")
  }

  test("curriculum order is the exact (band, doc_id) global rank") {
    val rows = graft.operators.TextAnalysis
      .queries("sample_curriculum_order")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length.toLong
    assert(rows.map(_._3).toSet === (0L until n).toSet,
      "positions must be a permutation of 0..n-1")
    val sorted = rows.sortBy(r => (r._2, r._1))
    assert(sorted.map(_._3).toSeq === (0L until n).toSeq,
      "position order must match (band asc, doc_id asc)")
    assert(rows.map(_._2).distinct.length > 1, "single band — fixture inert")
  }

  /** JVM mirror of TextAnalysis.dsirBucket for planted-vocab assertions. */
  private def dsirBucketOf(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"dsir|$tok".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 1024L
  }

  test("DSIR weights separate target-like from junk vocabulary") {
    import spark.implicits._
    // target docs pass the quality gate and carry the marker 'vocabq';
    // junk docs fail it (too short) and carry only 'zzjunk'
    val tgtText = ("the quick brown fox jumps over a lazy dog and then " +
      "walks on to the wide green field with calm bright skies vocabq ") * 2
    val docs = (0 until 20).map(i => (i.toLong, tgtText)) ++
      (20 until 40).map(i => (i.toLong, "zzjunk zzjunk zzjunk"))
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val w = graft.operators.TextAnalysis.dsirWeights(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    graft.core.Barrier.releaseAll(spark)
    // target-dominant vocabulary weighs above uniform (1e6 micro),
    // junk-only vocabulary below — the likelihood ratio points the
    // right way on a corpus where membership is unambiguous
    assert(w(dsirBucketOf("vocabq")) > 1000000L,
      s"target token weight ${w(dsirBucketOf("vocabq"))} not > 1e6")
    assert(w(dsirBucketOf("zzjunk")) < 1000000L,
      s"junk token weight ${w(dsirBucketOf("zzjunk"))} not < 1e6")
    // the consumer keeps target-like docs at a higher rate than junk
    val kept = graft.operators.TextAnalysis
      .queries("sample_importance_dsir")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    graft.core.Barrier.releaseAll(spark)
    val (tgtKept, junkKept) = (kept.count(_ < 20), kept.count(_ >= 20))
    assert(tgtKept > junkKept,
      s"importance sampling kept $tgtKept target vs $junkKept junk docs")
  }

  test("quality drift: counts conserve, ppm shares sum to a million, drift fires") {
    val rows = graft.operators.TextAnalysis
      .queries("corpus_quality_drift")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    // bucket counts conserve both snapshot cardinalities exactly
    val nDocs = docs.count()
    val nOld = rows.map(_._2).sum
    val nNew = rows.map(_._3).sum
    assert(nOld < nDocs && nNew < nDocs && nOld != nNew,
      s"fixture snapshots must differ: old=$nOld new=$nNew all=$nDocs")
    // integer-div ppm shares: within one truncation unit per bucket
    Seq(rows.map(_._4).sum, rows.map(_._5).sum).foreach { s =>
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"ppm shares must sum to 1e6 minus truncation: $s") }
    rows.foreach { case (b, on, nn, op, np, shift) =>
      assert(shift === np - op, s"shift identity broken in bucket $b") }
    // the monitored quantity actually moves on the fixture (text
    // revisions change stopword ratios)
    assert(rows.exists(_._6 != 0L), "no drift on fixture — report inert")
  }

  test("length batches: contiguous, length-sorted, padding beats arrival order") {
    val df = graft.operators.TextAnalysis
      .queries("corpus_length_batches")(spark, sfDir)
    // the doc-ranking window must be PARTITIONED by bucket — the only
    // unpartitioned window allowed is the bounded offset rollup, which
    // never sees the data relation
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("row_number"), plan.take(2000))
    assert("windowspecdefinition\\(bucket".r.findFirstIn(plan).isDefined,
      "row_number window lost its bucket partitioning:\n" + plan.take(2000))
    val rows = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val nDocs = rows.map(_._2).sum
    // batch ids contiguous from 0; every batch 32 docs except the last
    assert(rows.map(_._1).toSeq === (0L until rows.length.toLong),
      "batch ids must be contiguous from 0")
    rows.init.foreach { case (b, n, _, _, _) =>
      assert(n === 32L, s"batch $b not full") }
    assert(rows.last._2 === (nDocs - 1) % 32 + 1)
    // global (toks, doc_id) sort ⇒ max_toks nondecreasing across batches
    rows.sliding(2).foreach { case Array((b1, _, m1, _, _), (_, _, m2, _, _)) =>
      assert(m1 <= m2, s"max_toks decreased after batch $b1") }
    // padding identity holds per batch
    rows.foreach { case (b, n, mx, sm, pad) =>
      assert(pad === n * mx - sm, s"padding identity broken in batch $b") }
    // the operator's reason to exist: total padding strictly under the
    // same-B arrival-order (doc_id) batching on this corpus
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.Text.bpeishTokenCount(col("text")).cast("long")
          .as("toks"))
      .filter(col("toks") > 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val arrivalPad = toks.grouped(32).map { g =>
      g.length * g.map(_._2).max - g.map(_._2).sum }.sum
    val sortedPad = rows.map(_._5).sum
    assert(sortedPad < arrivalPad,
      s"length-grouping must cut padding: $sortedPad vs $arrivalPad")
    assert(nDocs === toks.length, "every nonempty doc lands in a batch")
  }

  test("funnel latency: histogram rank-selection equals a sort-derived " +
      "driver recompute of both stage latencies") {
    val got = graft.operators.Stateful
      .queries("a7_funnel_latency")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    // driver funnel replay over raw events
    val ev = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp_ltz")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val day = 86400000000L
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val t2 = ev.filter(_._2 == "click")
      .filter(e => t1.get(e._1).exists(a => e._3 > a && e._3 <= a + day))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val t3 = ev.filter(_._2 == "purchase")
      .filter(e => t2.get(e._1).exists(a => e._3 > a && e._3 <= a + day))
      .groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    def q(lats: Seq[Long]): (Long, Double, Double) = {
      val s = lats.sorted
      def kth(p: Double) = s(math.ceil(p * s.size).toInt - 1).toDouble
      (s.size.toLong, kth(0.5), kth(0.95))
    }
    val want = Map(
      "view_to_click" -> q(t2.map { case (u, t) => t - t1(u) }.toSeq),
      "click_to_purchase" -> q(t3.map { case (u, t) => t - t2(u) }.toSeq))
    assert(got === want)
  }

  test("rate anomaly: per-type median is the rank-selected window count, " +
      "flags consistent") {
    val rows = graft.operators.Stateful
      .queries("a10_rate_anomaly")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      // one med per type; med = ceil(n/2)-th smallest count
      val meds = g.map(_._4).distinct
      assert(meds.length === 1, s"$tpe has ${meds.length} medians")
      val counts = g.map(_._3).sorted
      assert(meds.head === counts(math.ceil(0.5 * counts.size).toInt - 1),
        s"$tpe median drifted")
      g.foreach { case (_, w, cnt, med, flag) =>
        assert(flag === (cnt > 2 * med), s"flag wrong at $tpe/$w") }
    }
  }

  test("bm25: scores match a driver recompute, top-k plan is " +
      "TakeOrderedAndProject") {
    val df = graft.operators.TextAnalysis
      .queries("text_bm25_topk")(spark, sfDir)
    // the global top-20 must be per-partition heads + merge, never a
    // full sort of the scored relation
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent recompute of the full rational-BM25 ladder
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    val terms = Set("dup", "vector", "window")
    val n = docs.length.toLong
    val tTok = docs.map(_._2.length.toLong).sum
    val tf = docs.flatMap { case (id, toks) =>
      toks.filter(terms).groupBy(identity).map { case (t, o) =>
        (id, toks.length.toLong, t, o.length.toLong) } }
    val dfr = tf.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val want = tf.groupBy(_._1).map { case (id, rows) =>
      val score = rows.map { case (_, dl, t, f) =>
        val idf = (n - dfr(t)) * 1000000L / (dfr(t) + 1L)
        val sat = (22000000L * tTok * f) /
          (10L * tTok * f + 3L * tTok + 9L * n * dl)
        idf * sat / 1000000L
      }.sum
      (id, rows.length.toLong, score)
    }.toSeq.sortBy(r => (-r._3, r._1)).take(20)
    assert(got.sortBy(r => (-r._3, r._1)).toSeq === want)
    assert(got.nonEmpty)
  }

  test("bigram LM: scores match a driver recompute of the interpolated " +
      "model exactly") {
    val df = graft.operators.TextAnalysis
      .queries("text_bigram_lm")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .filter(_._2.length >= 2)
    val bigrams = docs.map { case (id, toks) =>
      id -> toks.init.zip(toks.tail) }
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lm|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(6), 16) % 100
    }
    val train = bigrams.filter(b => bucket(b._1) < 50).flatMap(_._2)
    assert(train.nonEmpty, "hash split left no training bigrams")
    val cb = train.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw1 = train.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cw2 = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tb = train.size.toLong
    val want = bigrams.map { case (id, bgs) =>
      val s = bgs.map { case (w1, w2) =>
        val pb = if (cb.contains((w1, w2)) && cw1.contains(w1))
          1000000L * cb((w1, w2)) / cw1(w1) else 0L
        val pu = if (cw2.contains(w2)) 1000000L * cw2(w2) / tb else 0L
        (3L * pb + pu) / 4L
      }.sum
      val nb = bgs.length.toLong
      val score = s.toDouble / nb.toDouble
      id -> (nb, s, score, score < 32000.0)
    }.toMap
    assert(got === want)
    // train/score asymmetry is real: scored docs outnumber train docs
    assert(bigrams.size > bigrams.count(b => bucket(b._1) < 50))
  }

  test("perplexity buckets: per-lang terciles are ordered, exhaustive, " +
      "and roughly balanced") {
    val rows = graft.operators.TextAnalysis
      .queries("text_perplexity_buckets")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    assert(rows.nonEmpty)
    // same doc population as the LM scorer (every >=2-token doc, once)
    val lm = graft.operators.TextAnalysis
      .queries("text_bigram_lm")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet === lm)
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byB = rs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      assert(byB.keySet.subsetOf(Set("head", "middle", "tail")))
      // value-quantile monotonicity: tail < middle < head score ranges
      for (t <- byB.get("tail"); m <- byB.get("middle"))
        assert(t.max < m.min, s"$lang: tail/middle overlap")
      for (m <- byB.get("middle"); h <- byB.get("head"))
        assert(m.max < h.min, s"$lang: middle/head overlap")
      // cuts at the 1/3 and 2/3 quantiles keep buckets within a loose
      // balance band at this near-unique-score fixture
      if (rs.length >= 30)
        Seq("head", "middle", "tail").foreach { b =>
          val frac = byB.getOrElse(b, Array[Long]()).length.toDouble / rs.length
          assert(frac > 0.2 && frac < 0.47,
            f"$lang/$b tercile off balance: $frac%.2f")
        }
    }
  }

  test("code detect: planted classes split correctly; score is the " +
      "integer evidence formula") {
    val rows = graft.operators.TextAnalysis
      .queries("text_code_detect")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    // planted verdicts: code shapes flag; prose does not — including the
    // keyword-in-prose doc, whose evidence must be nonzero yet subcritical
    assert(Seq(-111L, -112L, -113L).forall(id => rows(id).getBoolean(7)))
    assert(Seq(-114L, -115L, -116L).forall(id => !rows(id).getBoolean(7)))
    assert(rows(-115L).getLong(6) > 0 && rows(-115L).getLong(6) < 50)
    // recompute the score from the emitted counts for every doc
    rows.values.foreach { r =>
      val score = (10L * r.getLong(2) + 25L * r.getLong(3) +
        40L * r.getLong(4)) * 100L / math.max(r.getLong(1), 1L)
      assert(r.getLong(6) === score, s"score drift at doc ${r.getLong(0)}")
    }
  }

  test("vocab coverage: matches a driver recompute, monotone, and the " +
      "top-V cut is TakeOrderedAndProject") {
    val df = graft.operators.TextAnalysis
      .queries("text_vocab_coverage")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.functions.Text.tokenize(col("text"))).as("tok"))
      .collect().map(_.getString(0))
    val ranked = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (t, n) => (-n, t) }
    val total = toks.length.toLong
    got.foreach { case (v, cov, tot, ratio) =>
      assert(tot === total)
      val want = ranked.take(v.toInt).map(_._2).sum
      assert(cov === want, s"covered_tokens at V=$v")
      assert(ratio === cov.toDouble / total.toDouble)
    }
    assert(got.map(_._2).sameElements(got.map(_._2).sorted), "monotone in V")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("triangles: degree-ordered enumeration equals a brute-force " +
      "neighbor-set recompute") {
    val got = graft.operators.Similarity
      .queries("sim_graph_triangles")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val und = graft.operators.Similarity.knnGraph(spark, sfDir)
      .select(least(col("vec_id"), col("neighbor_id")),
        greatest(col("vec_id"), col("neighbor_id")))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neigh = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (v, (d, t, c)) =>
      val dd = neigh.get(v).map(_.size.toLong).getOrElse(0L)
      assert(d === dd, s"degree at $v")
      val tt = neigh.get(v).fold(0L)(_.toSeq.combinations(2).count {
        case Seq(x, y) =>
          und.contains((math.min(x, y), math.max(x, y)))
        case _ => false
      }.toLong)
      assert(t === tt, s"triangles at $v")
      val cc = if (dd < 2) 0.0 else 2.0 * tt / (dd * (dd - 1)).toDouble
      assert(c === cc, s"coefficient at $v")
    }
    assert(got.values.exists(_._2 > 0), "fixture graph must have triangles")
  }

  test("recall report: hits equal the intersection of the emitted " +
      "topk relations") {
    def pairs(name: String) = graft.operators.Similarity
      .queries(name)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs("sim_topk_bruteforce")
    val byMethod = Map("ivf" -> pairs("sim_ivf_ann"),
      "ivf_trained" -> pairs("sim_ivf_ann_trained"),
      "lsh" -> pairs("sim_lsh_ann"))
    val got = graft.operators.Similarity
      .queries("sim_recall_report")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val qids = bf.map(_._1)
    assert(got.size === 3 * qids.size, "one row per (method, query)")
    for (q <- qids; (m, ap) <- byMethod) {
      val truth = bf.filter(_._1 == q)
      val hits = truth.count(ap.contains).toLong
      val (nTrue, h, rec) = got((m, q))
      assert(nTrue === truth.size.toLong, s"n_true at ($m, $q)")
      assert(h === hits, s"hits at ($m, $q)")
      assert(rec === hits.toDouble / truth.size.toDouble, s"recall ($m, $q)")
    }
  }

  test("mixture schedule: weighted round-robin order matches a driver " +
      "recompute; positions are a permutation") {
    val got = graft.operators.TextAnalysis
      .queries("sample_mixture_schedule")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keyed = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val w = math.ceil(math.sqrt(ds.length.toDouble)).toLong
      ds.map(_._1).sorted.zipWithIndex.map { case (id, rk) =>
        (id, src, rk / w, rk % w) }
    }
    val want = keyed.sortBy { case (_, src, c, sl) => (c, src, sl) }
      .zipWithIndex.map { case ((id, src, c, sl), pos) =>
        (id, src, c, sl, pos.toLong) }
    assert(got.sortBy(_._5).toSeq === want)
    assert(got.map(_._5).sorted.toSeq === (0L until got.length.toLong),
      "positions must be a 0-based permutation")
  }

  test("routed pipeline: lanes route by detector verdict, gates are " +
      "lane-specific, dedup is within-lane keep-first") {
    val rows = graft.operators.TextAnalysis
      .queries("pipeline_routed_corpus")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    // the planted clone pair lands in the code lane; keep-first by
    // doc_id ASC keeps -117 and drops -112
    assert(rows(-117L) === (("code", true, true)))
    assert(rows(-112L) === (("code", true, false)),
      "clone -112 must lose keep-first")
    // lane-specific gating is real: -112 (71 chars) passes the code
    // gate but would fail the prose length floor (100)
    assert(rows(-111L)._1 === "code" && rows(-113L)._1 === "code")
    // lane assignment agrees with the detector for every doc
    val det = graft.operators.TextAnalysis
      .queries("text_code_detect")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    rows.foreach { case (id, (lane, _, _)) =>
      assert((lane == "code") === det(id), s"lane/detector drift at $id") }
    // kept implies passed, and both prose verdict classes are real
    assert(rows.values.forall { case (_, p, k) => !k || p })
    assert(rows.values.exists { case (l, p, _) => l == "prose" && p })
    assert(rows.values.exists { case (l, p, _) => l == "prose" && !p })
  }

  test("quantized recall report: hits equal intersections; sq dominates " +
      "pq (coarser codes lose recall)") {
    def pairs(name: String) = graft.operators.Similarity
      .queries(name)(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs("sim_topk_bruteforce")
    val byMethod = Map("pq" -> pairs("sim_pq_ann"),
      "sq" -> pairs("sim_sq_ann"))
    val got = graft.operators.Similarity
      .queries("sim_recall_report_quantized")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val qids = bf.map(_._1)
    assert(got.size === 2 * qids.size)
    for (q <- qids; (m, ap) <- byMethod) {
      val truth = bf.filter(_._1 == q)
      val hits = truth.count(ap.contains).toLong
      val (nTrue, h, rec) = got((m, q))
      assert(nTrue === truth.size.toLong && h === hits, s"hits at ($m, $q)")
      assert(rec === hits.toDouble / truth.size.toDouble, s"recall ($m, $q)")
    }
    def total(m: String) = got.collect { case ((mm, _), (_, h, _)) if mm == m => h }.sum
    assert(total("sq") >= total("pq"),
      "int8 SQ must not recall worse than 8-byte PQ")
  }

  test("sliding window: every event lands in exactly 4 overlapping " +
      "windows; uu bounded by events") {
    val rows = graft.operators.Windows
      .queries("a1_slide_uu")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val n = graft.core.Tables.load(spark, sfDir, "events")
      .filter(col("user_id").isNotNull).count()
    assert(rows.map(_._4).sum === 4 * n, "conservation: 4 windows/event")
    rows.foreach { case (stt, edt, uu, ev) =>
      assert(uu >= 1 && uu <= ev, s"uu out of range at $stt")
      // window bounds are 1 h apart and slide-aligned (minute in :00/:15/:30/:45)
      assert(Set("00", "15", "30", "45").contains(stt.substring(14, 16)),
        s"unaligned start $stt")
    }
    // overlap is real: strictly more window rows than a 1 h tumble would produce
    val tumbles = rows.map(_._1.substring(0, 13)).distinct.length
    assert(rows.length > tumbles)
  }

  test("oov rate: matches a driver recompute against the top-16 vocab") {
    val got = graft.operators.TextAnalysis
      .queries("text_oov_rate")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val docToks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.Text.tokenize(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.nonEmpty)
    val vocab = docToks.flatMap(_._2).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.take(16).map(_._1).toSet
    assert(got.size === docToks.length)
    docToks.foreach { case (id, tks) =>
      val oov = tks.count(!vocab.contains(_)).toLong
      val (n, o, r) = got(id)
      assert(n === tks.length.toLong && o === oov, s"counts at $id")
      assert(r === oov.toDouble / tks.length.toDouble, s"rate at $id")
    }
    // both verdict classes live: some in-vocab-only docs would be rate 0,
    // but at minimum the rate must vary across the corpus
    assert(got.values.map(_._3).toSet.size > 1, "degenerate OOV rates")
  }

  test("phash neardup: banded join finds EVERY pair within hamming 3 " +
      "(pigeonhole completeness, zero false negatives)") {
    val hs = graft.operators.Multimodal.phashes(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val want = (for {
      i <- hs.indices
      j <- (i + 1) until hs.length
      h = ham(hs(i)._2, hs(j)._2) if h <= 3
    } yield (math.min(hs(i)._1, hs(j)._1),
      math.max(hs(i)._1, hs(j)._1), h.toLong)).toSet
    val got = graft.operators.Multimodal
      .queries("mm_phash_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, "banded candidates must equal the brute-force set")
    assert(got.exists(_._3 > 0), "non-exact near pairs must exist")
    assert(got.exists(_._3 === 0L), "exact pairs must exist")
  }

  test("scene cuts / audio VAD: decoded-sequence analysis fires in both " +
      "directions and matches a driver recompute") {
    // scene cuts: non-cut boundaries step by exactly 7; cuts are the
    // mod-256 wraparounds (|Δ| = 249) — both classes must exist
    val cuts = graft.operators.Multimodal
      .queries("mm_scene_cuts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3)))
    assert(cuts.nonEmpty)
    cuts.foreach { case (_, _, d, isCut) =>
      assert(d == 7 || d == 249, s"fill steps by 7 mod 256; delta $d")
      assert(isCut === (d >= 64))
    }
    assert(cuts.exists(_._4) && cuts.exists(!_._4),
      "both cut and non-cut boundaries must exist or the gate is vacuous")
    // the shot table conserves the frame sequence: per doc, segment
    // count = cuts + 1 and segment sizes sum to the frame count
    val segs = graft.operators.Multimodal
      .queries("mm_scene_segments")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val cutsPerDoc = cuts.groupBy(_._1)
      .view.mapValues(_.count(_._4).toLong).toMap
    segs.groupBy(_._1).foreach { case (doc, ss) =>
      assert(ss.length.toLong === cutsPerDoc.getOrElse(doc, 0L) + 1L,
        s"doc $doc: segments must be cuts + 1")
      assert(ss.map(_._3).sum ===
        cuts.count(_._1 == doc).toLong + 1L,
        s"doc $doc: segment sizes must sum to the frame count")
    }
    // VAD: recompute one doc's windows from the fixture formula
    val vad = graft.operators.Multimodal
      .queries("mm_audio_vad")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(vad.values.exists(_._3) && vad.values.exists(!_._3),
      "both voiced and unvoiced windows must exist")
    val docId = vad.keys.head._1
    val text = graft.core.Tables.load(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") === docId)
      .select("text").collect()(0).getString(0)
    val n = 500 + text.getBytes("UTF-8").length % 1000
    val samples = (0 until n).map(i => math.abs((docId + i * 7) % 256 - 128))
    samples.grouped(64).zipWithIndex.foreach { case (wnd, wi) =>
      val (ns, ma, voiced) = vad((docId, wi.toLong))
      assert(ns === wnd.length)
      assert(ma === wnd.map(_.toLong).sum / wnd.length)
      assert(voiced === (ma >= 64))
    }
  }

  test("wordpiece: segmentation reconstructs every word, greedy " +
      "longest-match verified against a driver recompute") {
    val seg = graft.operators.TextAnalysis
      .queries("text_wordpiece_segment")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getBoolean(3)))
    assert(seg.nonEmpty)
    seg.foreach { case (word, np, s, done) =>
      assert(done, s"fixture words must all finish within the round cap")
      assert(s.split('|').mkString("") === word,
        s"pieces must concatenate back to the word: $word vs $s")
      assert(np === s.split('|').length.toLong)
    }
    assert(seg.exists(_._2 >= 2), "multi-piece words must exist")
    assert(seg.exists(_._2 === 1L), "whole-word vocabulary hits must exist")
    // greedy longest-match: collect the TRUE inventory and walk each
    // word taking the longest matching piece — must match exactly
    val vocab = graft.operators.TextAnalysis
      .wordpieceVocab(graft.operators.TextAnalysis
        .wordpieceWords(spark, sfDir))
      .collect().map(_.getString(0)).toSet
    seg.foreach { case (word, _, s, _) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var p = 0
      while (p < word.length) {
        val l = (math.min(6, word.length - p) to 1 by -1)
          .find(k => vocab.contains(word.substring(p, p + k)))
        assert(l.isDefined, "single-char floor guarantees a match")
        out += word.substring(p, p + l.get); p += l.get
      }
      assert(out.mkString("|") === s,
        s"greedy walk diverged for $word: ${out.mkString("|")} vs $s")
    }
    // fertility rollup conserves the corpus token count
    val counts = graft.operators.TextAnalysis
      .queries("text_wordpiece_counts")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nTok = graft.core.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.Text.tokenize(
          org.apache.spark.sql.functions.col("text")))).count()
    assert(counts.map(_._2).sum === nTok)
    counts.foreach { case (_, t, sub) => assert(sub >= t) }
  }

  test("phash clusters: labels equal a driver union-find over the " +
      "near-dup pairs") {
    val got = graft.operators.Multimodal
      .queries("mm_phash_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.Multimodal.phashNearPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    got.foreach { case (id, lbl) =>
      assert(lbl === find(id), s"cluster label drift at $id") }
    assert(got.values.toSet.size < got.size, "non-trivial clusters exist")
  }

  test("trained IVF ANN: every emitted neighbor lies in a probed " +
      "trained cluster; ranks contiguous per query") {
    val (assigned, probes) = graft.operators.Similarity
      .ivfTrained(spark, sfDir, 16, 4, 2)
    val asg = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val prb = probes.select("query_id", "probe").collect()
      .map(r => (r.getLong(0), r.getInt(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = graft.operators.Similarity
      .queries("sim_ivf_ann_trained")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, _) =>
      assert(prb(q).contains(asg(n)),
        s"neighbor $n of query $q not in a probed cluster") }
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._3).sorted.toSeq === (1 to g.length), s"ranks at $q") }
  }

  test("expectations report: planted violations surface in exactly the " +
      "right checks with exact counts") {
    val rows = graft.operators.Relational
      .queries("q_expectations_report")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.size === 5)
    val nLi = graft.core.Tables.load(spark, sfDir, "lineitem").count() + 1
    val nOrd = graft.core.Tables.load(spark, sfDir, "orders").count() + 1
    // each planted bad row violates its checks exactly once
    assert(rows("lineitem_quantity_in_1_50") === ((1L, nLi, false)))
    assert(rows("lineitem_discount_in_0_01") === ((1L, nLi, false)))
    assert(rows("lineitem_fk_orders") === ((1L, nLi, false)))
    assert(rows("orders_fk_customer") === ((1L, nOrd, false)))
    assert(rows("orders_totalprice_positive") === ((1L, nOrd, false)))
  }

  test("matryoshka recall: hits equal truncated-search intersections; " +
      "truncation loses recall on non-MRL vectors") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def topk(d: Int): Set[(Long, Long)] = {
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < d) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        if (na == 0.0 || nb == 0.0) -2.0 else dot / math.sqrt(na * nb)
      }
      emb.filter(_._1 < 8).flatMap { case (q, qv) =>
        emb.filter(_._1 != q)
          .map { case (n, nv) => (n, cos(qv, nv)) }
          .sortBy { case (n, s) => (-s, n) }.take(5)
          .map { case (n, _) => (q, n) }
      }.toSet
    }
    val truth = topk(64)
    val got = graft.operators.Similarity
      .queries("sim_matryoshka_recall")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val qids = truth.map(_._1)
    assert(got.size === 3 * qids.size)
    for (d <- Seq(8, 16, 32); q <- qids) {
      val tq = truth.filter(_._1 == q)
      val hits = tq.count(topk(d).contains).toLong
      val (nTrue, h, rec) = got((s"dims_$d", q))
      assert(nTrue === tq.size.toLong && h === hits, s"hits at ($d, $q)")
      assert(rec === hits.toDouble / tq.size.toDouble, s"recall ($d, $q)")
    }
    // random (non-MRL-trained) vectors must lose recall when truncated
    def avg(d: Int) = got.collect {
      case ((m, _), (_, _, r)) if m == s"dims_$d" => r }.sum
    assert(avg(8) < qids.size.toDouble, "8-dim prefix cannot be lossless")
  }

  test("threshold sweep: counts are monotone non-increasing in the " +
      "threshold and match per-threshold recomputes") {
    val got = graft.operators.Dedup
      .queries("dedup_threshold_sweep")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.map(_._1) === Seq(0.5, 0.6, 0.7, 0.8, 0.9))
    assert(got.map(_._2).reverse === got.map(_._2).reverse.sorted,
      "n_pairs must not increase with threshold")
    assert(got.map(_._3).reverse === got.map(_._3).reverse.sorted,
      "n_drop_candidates must not increase with threshold")
    // the 0.6 slice must equal the production pair relation
    val pairs06 = graft.operators.Dedup
      .queries("dedup_minhash_lsh")(spark, sfDir).count()
    assert(got.find(_._1 == 0.6).get._2 === pairs06,
      "sweep at 0.6 must equal dedup_minhash_lsh's pair count")
  }

  test("SCD2 history: per-key intervals chain without gaps, exactly one " +
      "current version per key, latest matches K5") {
    val rows = graft.operators.Relational
      .queries("k8_scd2_history")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(4), if (r.isNullAt(5)) null else r.getString(5),
        r.getBoolean(6)))
    rows.groupBy(_._1).foreach { case (u, g) =>
      val byV = g.sortBy(_._2)
      assert(byV.map(_._2) === (1L to g.length.toLong), s"versions at $u")
      assert(byV.count(_._6) === 1 && byV.last._6,
        s"exactly the last version is current at $u")
      // each version's valid_to equals the next version's valid_from
      byV.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(0)._5 === p(1)._4, s"interval gap at $u v${p(0)._2}")
      }
      assert(byV.last._5 === null, s"open current interval at $u")
    }
    // the current version IS the K5 compacted state
    val k5 = graft.operators.Relational
      .queries("k5_upsert_latest_per_key")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_._6).foreach { case (u, _, tpe, _, _, _) =>
      assert(k5(u) === tpe, s"current version drifted from K5 at $u") }
  }

  test("running total: per-customer cumulative sums match a driver " +
      "BigDecimal recompute, seq contiguous") {
    val rows = graft.operators.Relational
      .queries("q_running_total")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("string"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3)))
    val want = orders.groupBy(_._1).toSeq.flatMap { case (c, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      var acc = BigDecimal(0)
      sorted.zipWithIndex.map { case ((_, ok, d, p), i) =>
        acc += BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        (c, ok) -> ((d, acc.toString, i + 1L))
      }
    }
    val got = rows.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.size === orders.length)
    want.foreach { case (k, v) =>
      assert(got(k) === v, s"running total drift at $k") }
  }

  test("textrank keywords: two integer rounds over the co-occurrence " +
      "graph match a driver recompute; top-50 cut ordered") {
    val got = graft.operators.TextAnalysis
      .queries("text_textrank_keywords")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // independent peel from the SAME pair relation (the tokenize/zip
    // chain is oracle-pinned by the bigram-LM/collocation family)
    val bg = graft.operators.TextAnalysis.bigramsOf(
      graft.core.Tables.load(spark, sfDir, "documents"))
      .filter(col("w1") =!= col("w2"))
      .select(col("w1"), col("w2")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val edges = (bg ++ bg.map(_.swap)).distinct
    val nodes = edges.map(_._1).distinct
    val od = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def round(r: Map[String, Long]): Map[String, Long] = {
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / od(s) }.sum).toMap
      nodes.map(w =>
        w -> (150000L + 85L * sums.getOrElse(w, 0L) / 100L)).toMap
    }
    val r0 = nodes.map(_ -> 1000000L).toMap
    val want = round(round(r0)).toSeq
      .sortBy { case (w, pr) => (-pr, w) }.take(50)
    assert(got.toSeq === want)
    // centrality is non-degenerate: ranks spread, floor respected
    assert(got.map(_._2).toSet.size > 1, "all ranks equal — inert")
    assert(got.forall(_._2 >= 150000L), "below the damping floor")
  }

  test("ngram novelty: first-seen attribution matches a driver recompute; " +
      "the earliest doc is fully novel") {
    val got = graft.operators.TextAnalysis
      .queries("corpus_ngram_novelty")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), graft.functions.Text.tokenize(col("text"))
        .as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
      .filter(_._2.length >= 8)
    val perDoc = toks.map { case (id, ts) =>
      id -> ts.sliding(8).map(_.mkString(" ")).toSet }.toMap
    val firstSeen = perDoc.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = perDoc.map { case (id, gs) =>
      val novel = gs.count(g => firstSeen(g) == id).toLong
      id -> (gs.size.toLong, novel, novel * 1000000L / gs.size)
    }
    assert(got === want, "novelty drift vs exact first-seen recompute")
    // the earliest doc with grams introduces every one of its grams
    val firstDoc = perDoc.keys.min
    assert(got(firstDoc)._3 === 1000000L)
    // and duplication actually exists: someone repeats earlier grams
    assert(got.values.exists(_._3 < 1000000L), "no repeated grams — inert")
  }

  test("join-size sketches: exact twin matches the real join; universe " +
      "sample matches a driver recompute; both estimates in envelope") {
    val got = graft.operators.Relational.queries("q_join_size_sketches")(
      spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val truth = graft.core.Tables.load(spark, sfDir, "orders")
      .join(graft.core.Tables.load(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
    got.values.foreach { case (est, exact, err) =>
      assert(exact === truth)
      assert(err === math.abs(est - exact) * 1000000L /
        math.max(exact, 1L))
      assert(est >= exact / 3 && est <= exact * 3,
        s"estimate $est vs exact $exact — outside 3x")
    }
    // universe sampling: recompute the sampled join in the driver with
    // the same md5 bucket rule — the estimate is exactly 16x that
    def b0(k: Long): Boolean = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"us|$k".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15), 16) % 16 == 0
    val oKeys = graft.core.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
      .filter(b0).groupBy(identity).map { case (k, v) =>
        k -> v.length.toLong }
    val lKeys = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).collect().map(_.getLong(0))
      .filter(b0).groupBy(identity).map { case (k, v) =>
        k -> v.length.toLong }
    val sampled = oKeys.map { case (k, c) =>
      c * lKeys.getOrElse(k, 0L) }.sum
    assert(got("universe_16")._1 === sampled * 16L,
      "universe estimate drift vs driver recompute")
  }

  test("bloom semi-join: reduction is lossless (no false negatives), " +
      "prune real, counts match a real join") {
    val r = graft.operators.Relational.queries("j9_bloom_semijoin")(
      spark, sfDir).collect().head
    val (nFact, nDim, nPass, nJoin, nTrue, prune, fp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    // the whole point: pre-filtering through the bloom loses nothing
    assert(nJoin === nTrue, "bloom dropped a joining row")
    val truth = graft.core.Tables.load(spark, sfDir, "lineitem")
      .join(graft.core.Tables.load(spark, sfDir, "part")
        .filter(col("p_size") >= 46),
        col("l_partkey") === col("p_partkey")).count()
    assert(nTrue === truth)
    assert(nPass >= nJoin && nPass <= nFact)
    assert(fp === (nPass - nJoin) * 1000000L / math.max(nPass, 1L))
    assert(prune === (nFact - nPass) * 1000000L / nFact)
    // a ~10%-selective dim must prune the majority of the fact side
    assert(prune > 500000L, s"prune_ppm $prune — reduction inert")
  }

  test("join cardinality estimate: exact twin equals the materialized " +
      "join count; estimate lands within the histogram envelope") {
    val got = graft.operators.Relational.queries("q_join_card_estimate")(
      spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    def joinCount(ta: String, ka: String, tb: String, kb: String) =
      graft.core.Tables.load(spark, sfDir, ta)
        .join(graft.core.Tables.load(spark, sfDir, tb),
          col(ka) === col(kb)).count()
    val truths = Map(
      "orders_lineitem" -> joinCount("orders", "o_orderkey",
        "lineitem", "l_orderkey"),
      "part_lineitem" -> joinCount("part", "p_partkey",
        "lineitem", "l_partkey"),
      "customer_orders" -> joinCount("customer", "c_custkey",
        "orders", "o_custkey"))
    truths.foreach { case (name, truth) =>
      val (est, exact, err) = got(name)
      // Σ cA·cB over the count relations IS the join size
      assert(exact === truth, s"$name exact twin drift vs real join")
      assert(err === math.abs(est - exact) * 1000000L /
        math.max(exact, 1L))
      // MCV + uniform-tail on FK data: generous 3x envelope
      assert(est >= exact / 3 && est <= exact * 3,
        s"$name estimate $est vs exact $exact — outside 3x")
    }
  }

  test("phash band coverage: the pigeonhole guarantee reads exactly " +
      "1e6 ppm through Hamming 3; histogram matches a driver recompute") {
    val got = graft.operators.Multimodal.queries("mm_phash_band_coverage")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.nonEmpty)
    got.foreach { case (d, n, hits, ppm, g) =>
      assert(g === (d <= 3))
      assert(ppm === hits * 1000000L / n)
      // the zero-false-negative THEOREM, measured: within the radius,
      // every pair is a candidate
      if (d <= 3) assert(hits === n,
        s"pigeonhole violated at Hamming $d: $hits of $n")
    }
    // driver recompute of the full histogram over distinct hash classes
    val hashes = graft.operators.Multimodal.queries("mm_phash_dedup")(
      spark, sfDir).collect().map(_.getString(0)).distinct
    val want = (for {
      a <- hashes; b <- hashes if a < b
      d = a.zip(b).count { case (x, y) => x != y }.toLong
      hit = (0 until 4).exists(k =>
        a.substring(16 * k, 16 * k + 16) == b.substring(16 * k, 16 * k + 16))
    } yield (d, hit)).groupBy(_._1).map { case (d, v) =>
      d -> (v.length.toLong, v.count(_._2).toLong) }
    assert(got.map(r => r._1 -> (r._2, r._3)).toMap === want,
      "coverage histogram drift vs exact recompute")
  }

  test("keyword agreement: counts equal the set algebra over the two " +
      "extractors' own outputs") {
    val r = graft.operators.TextAnalysis.queries("text_keyword_agreement")(
      spark, sfDir).collect().head
    val (na, nb, nc, oa, ob, jac) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val tfidf = graft.operators.TextAnalysis.queries("text_salient_terms")(
      spark, sfDir).collect().map(_.getString(2)).toSet
    val rake = graft.operators.TextAnalysis.queries("text_rake_keywords")(
      spark, sfDir).collect().flatMap(_.getString(0).split(" ")).toSet
    assert(na === tfidf.size.toLong)
    assert(nb === rake.size.toLong)
    assert(nc === (tfidf & rake).size.toLong)
    assert(oa === na - nc && ob === nb - nc)
    assert(jac === nc * 1000000L / math.max(na + nb - nc, 1L))
  }

  test("ESS report: Kong bound holds per group; corpus row conserves " +
      "doc counts; weights non-degenerate") {
    val rows = graft.operators.TextAnalysis.queries("sample_ess_report")(
      spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val (all, per) = rows.partition(_._1 == "__all__")
    assert(all.length === 1 && per.nonEmpty)
    assert(all.head._2 === per.map(_._2).sum,
      "corpus row lost weight-bearing docs")
    rows.foreach { case (src, n, ess, ppm) =>
      // Cauchy–Schwarz: (Σw)² ≤ n·Σw² ⇒ ESS ≤ n; and any non-zero
      // weight vector has ESS ≥ 1
      assert(ess >= 1 && ess <= n, s"$src ESS $ess outside [1, $n]")
      assert(ppm === ess * 1000000L / n)
    }
    // the diagnostic must not be inert: weights vary, so ESS < n
    // somewhere
    assert(rows.exists(r => r._3 < r._2),
      "every group at full ESS — weights degenerate to uniform")
  }

  test("RAKE keywords: top-20 matches a driver recompute; no stopword " +
      "inside any candidate") {
    val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "for", "on", "with", "as", "at", "by", "be", "this", "that")
    val pat = ("\\b(" + stop.mkString("|") + ")\\b")
    val phrases = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect()
      .flatMap { r =>
        val norm = r.getString(0).toLowerCase
          .replaceAll("[^a-z0-9]+", " ").trim
        norm.split(pat, -1).map(_.trim)
          .filter(p => p.nonEmpty && p.split(" ").length <= 4)
      }
    val wordOcc = phrases.flatMap { p =>
      val ws = p.split(" "); ws.map(w => (w, ws.length.toLong)) }
    val stats = wordOcc.groupBy(_._1).map { case (w, v) =>
      w -> v.map(_._2).sum * 1000000L / v.length }
    val want = phrases.groupBy(identity).map { case (p, v) =>
      (p, v.length.toLong, p.split(" ").map(stats).sum)
    }.toSeq.sortBy(t => (-t._3, t._1)).take(20)
    val got = graft.operators.TextAnalysis.queries("text_rake_keywords")(
      spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want, "RAKE top-20 drift vs driver recompute")
    got.foreach { case (p, _, _) =>
      assert(!p.split(" ").exists(stop.contains),
        s"stopword leaked into candidate: $p")
    }
  }

  test("threshold-algorithm certificate: ladder matches a driver " +
      "recompute; a certified depth's candidates contain the TRUE " +
      "top-10") {
    val got = graft.operators.TextAnalysis.queries("q_topk_ta")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"), col("text"))
      .collect().map { r =>
        val text = r.getString(2)
        val s2 = text.trim.split("\\s+").length.toLong
        val s3 = text.toLowerCase.split("[^a-z0-9]+")
          .filter(_.nonEmpty).distinct.length.toLong
        (r.getLong(0), r.getLong(1), s2, s3)
      }
    val trueTop = docs.map(d => (d._1, d._2 + d._3 + d._4))
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    got.foreach { case (p, nCand, thr, kth, cert) =>
      val pi = p.toInt
      val pre1 = docs.sortBy(d => (-d._2, d._1)).take(pi)
      val pre2 = docs.sortBy(d => (-d._3, d._1)).take(pi)
      val pre3 = docs.sortBy(d => (-d._4, d._1)).take(pi)
      val candIds = (pre1 ++ pre2 ++ pre3).map(_._1).distinct
      val byId = docs.map(d => d._1 -> (d._2 + d._3 + d._4)).toMap
      val candTop = candIds.map(id => (id, byId(id)))
        .sortBy(t => (-t._2, t._1)).take(10)
      assert(nCand === candIds.length.toLong)
      assert(thr === pre1.map(_._2).min + pre2.map(_._3).min +
        pre3.map(_._4).min)
      assert(kth === candTop.map(_._2).min)
      assert(cert === (candTop.length == 10 && kth >= thr))
      // Fagin's guarantee, checked empirically: a certified prefix's
      // candidate top-10 IS the full-scan top-10
      if (cert) assert(candTop.map(_._1).toSet === trueTop,
        s"certified depth $p missed a true top-10 member")
    }
    // the ladder must certify somewhere, or the report is inert
    assert(got.exists(_._5), "no depth certified — ladder inert")
  }

  test("AMS F2 sketch: exact twin matches a driver recompute; counter " +
      "parity; estimate within the tug-of-war envelope") {
    val r = graft.operators.TextAnalysis.queries("text_f2_moment")(
      spark, sfDir).collect().head
    val (nOcc, nDist, f2, est, err) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val toks = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty))
    val cf = toks.groupBy(identity).map { case (_, v) => v.length.toLong }
    assert(nOcc === toks.length.toLong)
    assert(nDist === cf.size.toLong)
    assert(f2 === cf.map(c => c * c).sum, "exact F2 drift vs recompute")
    // Cauchy–Schwarz floor: Σcf² ≥ (Σcf)²/|vocab|
    assert(f2 >= nOcc * nOcc / math.max(nDist, 1))
    assert(est >= 0)
    assert(err === math.abs(est - f2) * 1000000L / f2)
    // the estimator is unbiased with bounded variance: a 16-counter
    // median-of-means staying within 2x of truth is the loose envelope
    assert(est >= f2 / 2 && est <= f2 * 2,
      s"F2 estimate $est vs exact $f2 — outside 2x")
  }

  test("vocab growth: cumulative counts match first-seen recompute; " +
      "word tier saturates, gram tier keeps growing") {
    val got = graft.operators.TextAnalysis.queries("corpus_vocab_growth")(
      spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
    // word tier: distinct-token first-seen, bucketed by binary length
    val firstSeen = docs.flatMap { case (id, toks) =>
      toks.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (_, v) => v.map(_._2).min }
    val wantWord = firstSeen.groupBy(id =>
        java.lang.Long.toBinaryString(id + 1).length - 1)
      .map { case (j, ids) => ((1L << (j + 1)) - 1) -> ids.size.toLong }
    val gotWord = got.filter(_._1 == "word")
      .map(r => r._2 -> r._3).toMap
    assert(gotWord === wantWord, "word-tier buckets drift from recompute")
    // cumulative is monotone and ends at the full distinct type count
    Seq("word", "gram8").foreach { kind =>
      val rows = got.filter(_._1 == kind).sortBy(_._2)
      assert(rows.nonEmpty)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(b._4 > a._4 && b._2 > a._2)
        case _ => ()
      }
      assert(rows.last._4 === rows.map(_._3).sum)
    }
    val wordTotal = got.filter(_._1 == "word").map(_._3).sum
    assert(wordTotal === firstSeen.size.toLong)
    // the Heaps contrast this report exists to show: the closed word
    // vocabulary plateaus while gram types keep arriving in the last
    // checkpoint bucket
    val gramRows = got.filter(_._1 == "gram8").sortBy(_._2)
    assert(gramRows.last._3 > 0)
  }

  test("source ablation: additive conservation and delta-sign " +
      "consistency; report is non-inert") {
    val rows = graft.operators.TextAnalysis.queries(
      "corpus_source_ablation")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val n = graft.core.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum === n, "docs lost in the rollup")
    val tPass = rows.map(_._3).sum
    val tDocs = rows.map(_._2).sum
    rows.foreach { case (src, nd, np, ppm, loo, delta) =>
      assert(ppm === np * 1000000L / nd)
      // the LOO value really is total-minus-contribution
      assert(loo === (tPass - np) * 1000000L / math.max(tDocs - nd, 1L),
        s"LOO drift for $src")
      assert(delta === ppm - loo)
    }
  }

  test("blocking quality: candidates ∩ truth IS the verified pair set; " +
      "metrics bounded") {
    val row = graft.operators.Dedup.queries("dedup_blocking_quality")(
      spark, sfDir).collect().head
    val (nPoss, nTrue, nCand, nTp, rr, pc, pq) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    // the internal-consistency identity: blocking ∩ truth uses the SAME
    // predicate the verify stage applies, so the true candidates are
    // exactly dedup_minhash_lsh's verified output
    val verified = graft.operators.Dedup.queries("dedup_minhash_lsh")(
      spark, sfDir).count()
    assert(nTp === verified,
      "true-candidate count drifted from the verified pair relation")
    assert(nTp <= math.min(nTrue, nCand))
    assert(nCand <= nPoss)
    Seq(rr, pc, pq).foreach(v => assert(v >= 0 && v <= 1000000L))
    // blocking must actually block: the candidate space is a sliver of
    // the quadratic pair space
    assert(rr > 900000L, s"reduction ratio $rr — blocking barely pruned")
  }

  test("z-order skipping: full driver recompute of both layouts; " +
      "min/max pruning is sound; z-layout skips more") {
    def md5b(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(2), 16)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = docs.map { case (id, src, nc) =>
      val d1 = math.min(nc / 4, 255L)
      val d2 = md5b(s"zb|$src")
      val z = (0 until 8).map(b =>
        (((d1 >> b) & 1) << (2 * b + 1)) | (((d2 >> b) & 1) << (2 * b)))
        .sum
      (id, nc, d2, z)
    }
    def ntile(n: Int, sorted: Seq[(Long, Long, Long, Long)]) = {
      val sz = sorted.length / n; val rem = sorted.length % n
      sorted.zipWithIndex.map { case (r, i) =>
        // ntile: first `rem` tiles get sz+1 rows
        val f = if (i < rem * (sz + 1)) i / (sz + 1)
        else rem + (i - rem * (sz + 1)) / math.max(sz, 1)
        (f, r)
      }.groupBy(_._1).values.map(_.map(_._2))
    }
    val ranges = Seq((0L, 149L), (150L, 299L), (300L, 449L),
      (450L, 100000L))
    // one predicate per SOURCE (bucket collisions keep their own rows —
    // the panel is source-keyed, the bucket is just its pruning proxy)
    val panel = for {
      src <- docs.map(_._2).distinct.toSeq
      (lo, hi) <- ranges
    } yield (md5b(s"zb|$src"), lo, hi)
    def skipped(sorted: Seq[(Long, Long, Long, Long)]): Long =
      (for {
        file <- ntile(32, sorted).toSeq
        (minC, maxC) = (file.map(_._2).min, file.map(_._2).max)
        (minB, maxB) = (file.map(_._3).min, file.map(_._3).max)
        (qb, lo, hi) <- panel
      } yield {
        val skip = qb < minB || qb > maxB || hi < minC || lo > maxC
        // SOUNDNESS: a skipped (file, predicate) can contain no match
        if (skip) assert(!file.exists(r =>
          r._3 == qb && r._2 >= lo && r._2 <= hi),
          "min/max pruning skipped a file containing a match")
        if (skip) 1L else 0L
      }).sum
    val wantIngest = skipped(rows.sortBy(_._1).toSeq)
    val wantZ = skipped(rows.sortBy(r => (r._4, r._1)).toSeq)
    // Hilbert xy2d (order 8), the exact rule the unrolled SQL levels run
    def hilbert(x0: Long, y0: Long): Long = {
      var x = x0; var y = y0; var d = 0L
      Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).foreach { s =>
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
      }
      d
    }
    val wantH = skipped(rows.map(r => (r._1, r._2, r._3,
      hilbert(math.min(r._2 / 4, 255L), r._3))).sortBy(r => (r._4, r._1))
      .toSeq)
    val got = graft.operators.Dedup.queries("corpus_zorder_skipping")(
      spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("ingest_order")._2 === wantIngest, "ingest-layout drift")
    assert(got("zorder")._2 === wantZ, "z-layout drift")
    assert(got("hilbert")._2 === wantH, "hilbert-layout drift")
    assert(got("zorder")._2 > got("ingest_order")._2,
      "z-order must buy MORE skipping than ingest order")
    assert(got("hilbert")._2 > got("ingest_order")._2,
      "hilbert must buy MORE skipping than ingest order")
  }

  test("HRW shard plan: driver recompute; every moved doc's 9-shard " +
      "argmax IS the new shard (the minimal-movement property)") {
    def w(sh: Int, id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shard|$sh|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val assign = docs.map { case (id, nc) =>
      val shard = (0 until 8).maxBy(sh => (w(sh, id), sh))
      (id, nc, shard.toLong, w(8, id) > w(shard, id))
    }
    val want = assign.groupBy(_._3).map { case (sh, rows) =>
      val moved = rows.count(_._4).toLong
      sh -> (rows.length.toLong, rows.map(_._2).sum, moved,
        moved * 1000000L / rows.length)
    }
    val got = graft.operators.Dedup.queries("corpus_shard_plan")(
      spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want, "shard plan drift vs exact HRW recompute")
    // conservation: every doc lands exactly once
    assert(got.values.map(_._1).sum === docs.length.toLong)
    // the HRW guarantee: a doc that moves under S+1 moves TO shard S+1 —
    // its 9-shard argmax is the new shard, never a reshuffle among
    // survivors
    assign.filter(_._4).foreach { case (id, _, _, _) =>
      assert((0 until 9).maxBy(sh => (w(sh, id), sh)) === 8,
        s"doc $id moved somewhere other than the new shard")
    }
    // and movement is the 1/(S+1) minority, not a mod-hash avalanche
    val movedTotal = assign.count(_._4)
    assert(movedTotal < docs.length / 3,
      s"HRW moved $movedTotal of ${docs.length} — far beyond 1/(S+1)")
  }
}
