package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink library — the K1-K7 surface of the reference re-expressed for
  * Spark's micro-batch model. The reference writes to Kafka/Doris/HBase;
  * the portable analog here is keyed/partitioned parquet directories, with
  * the Kafka-specific wiring isolated in option builders (no Kafka broker
  * in this environment).
  *
  * K1 exactly-once topic sink     (ref FlinkSinkUtil.java:31-42)
  * K2 dynamic-topic routing       (ref FlinkSinkUtil.java:44-60)
  * K3/K4 serving-table append     (ref FlinkSinkUtil.java:63-86)
  * K5 upsert latest-per-key       (ref SQLUtil.java:54-62)
  * K6 dim MERGE put/delete        (ref DimHBaseSinkFunction.java:33-70)
  * K7 dim DDL on config change    (ref DimApp.java:112-178, HBaseUtil.java:69-122)
  *
  * Exactly-once: Spark's file sinks are exactly-once per micro-batch via
  * the write-ahead commit log; for Kafka the same effect needs an
  * idempotent/keyed consumer or foreachBatch+transactional producer —
  * documented at the option builder. Scale: every writer below is a
  * distributed `DataFrame` write; no collect, no driver loops.
  */
object Sinks {

  /** K1: options for an exactly-once-style Kafka topic sink. */
  def kafkaSinkOptions(bootstrap: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic,
      // idempotent producer: the at-least-once → effectively-once bridge
      "kafka.enable.idempotence" -> "true",
      "kafka.transaction.timeout.ms" -> (15 * 60 * 1000).toString)

  /** K2: dynamic routing — the `sink_table` column becomes the partition
    * (for Kafka: rename to `topic` and omit the fixed topic option; the
    * Spark Kafka sink routes per-row natively).
    */
  def writeRouted(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("sink_table").parquet(outDir)

  /** K3/K4: append to a date-partitioned serving table. */
  def writeServing(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("cur_date").parquet(outDir)

  /** Hash-bucket partition column of the keyed stores (K5/K6). The store
    * is laid out as `dir/__bucket=N/...`; a micro-batch reads and rewrites
    * ONLY the buckets its keys hash into — O(touched buckets), not
    * O(table), per batch. At 100 TB, size the bucket count so one bucket
    * is a few GB — set `spark.graft.storeBuckets` once per deployment
    * (see [[DefaultBuckets]]); the built-in fallback 16 keeps local
    * tests fast.
    */
  private val BucketCol = "__bucket"

  /** Sentinel default for the `buckets` parameters: "use the session
    * conf". A NEW store created with the default sizes itself from
    * `spark.graft.storeBuckets` (falling back to 16 — right for local
    * tests); an EXISTING store always keeps its marker-pinned layout
    * regardless. This is the 100 TB sizing knob: one conf sets every
    * ingest tier's store fan-out (size so one bucket is a few GB)
    * without threading a parameter through every call site. An explicit
    * `buckets` argument still wins over the conf.
    */
  val DefaultBuckets: Int = -1
  private def requestedBuckets(spark: SparkSession, buckets: Int): Int =
    if (buckets > 0) buckets
    else spark.conf.getOption("spark.graft.storeBuckets") match {
      case None => 16
      case Some(raw) =>
        // validate here, at store-creation time, so a typo'd conf fails
        // with its name rather than a NumberFormatException from deep
        // inside a merge; a NEW store reads the conf exactly once (its
        // count is then marker-pinned), so a mid-stream conf change
        // only affects stores created after it, never an existing one
        raw.trim.toIntOption.filter(_ > 0).getOrElse(sys.error(
          s"spark.graft.storeBuckets must be a positive int, got '$raw'"))
    }

  /** The store's bucket count is LAYOUT, not a per-call knob: it is
    * pinned in a `_graft_buckets` marker on first write and reused on
    * every later call (parquet readers skip `_`-prefixed files). Without
    * this, a caller passing a different count than the store was written
    * with would hash keys into buckets `readTouched` never looks at and
    * silently break the latest-per-key invariant with duplicates.
    * The marker is staged then atomically moved, so a crash mid-write
    * can't leave a half-written count. A store that has bucket
    * directories but no marker (foreign or pre-marker layout) is
    * refused loudly rather than guessed at. Single writer per store is
    * the operating model (one foreachBatch owns a store), as with any
    * file-based sink.
    */
  private def resolveBuckets(dir: String, requested: Int): Int = {
    val d = new java.io.File(dir)
    val marker = new java.io.File(d, "_graft_buckets")
    if (marker.exists()) {
      val txt = new String(java.nio.file.Files.readAllBytes(marker.toPath),
        "UTF-8").trim
      require(txt.nonEmpty && txt.forall(_.isDigit),
        s"corrupt bucket marker $marker: '$txt'")
      txt.toInt
    } else {
      require(!d.exists() ||
          d.listFiles() == null ||
          !d.listFiles().exists(_.getName.startsWith(s"$BucketCol=")),
        s"store $dir has bucket directories but no _graft_buckets marker; " +
          "write the marker matching the existing layout before merging")
      d.mkdirs()
      val tmp = java.nio.file.Files.createTempFile(d.toPath, "_graft_buckets", ".tmp")
      java.nio.file.Files.write(tmp, requested.toString.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, marker.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      requested
    }
  }

  /** Read a keyed store back without its internal bucket column. */
  def readStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop(BucketCol)

  /** K5: upsert-by-key into a keyed store: merge incoming rows with the
    * existing rows OF THE TOUCHED BUCKETS ONLY, keep the newest version
    * per key (version = seq column). Used from foreachBatch in streaming;
    * idempotent under replays (same input → same winner), which is what
    * makes micro-batch retries exactly-once in effect.
    */
  def upsert(spark: SparkSession, incoming: DataFrame, keyCol: String,
      seqCol: String, dir: String, buckets: Int = DefaultBuckets): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    mergeTouchedKeyed(spark, incoming, keyCol, dir, buckets)(changed =>
      changed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
  }

  /** Cap on the distinct batch keys the changed-key split will carry to
    * the driver; past it the merge falls back to the unsplit path
    * automatically (r16 left the fallback as a docstring instruction —
    * nothing enforced it, so a bulk backfill batch with millions of
    * distinct keys could stress driver memory before anyone re-read the
    * doc). The default 1M keys is ~tens of MB collected — well inside any
    * driver — while every real micro-batch stays far below it; size it
    * per deployment like `storeBuckets`.
    */
  private def keyedSplitMaxKeys(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.keyedSplitMaxKeys") match {
      case None => 1000000
      case Some(raw) => raw.trim.toIntOption.filter(_ > 0).getOrElse(sys.error(
        s"spark.graft.keyedSplitMaxKeys must be a positive int, got '$raw'"))
    }

  /** Diagnostic: how many keyed merges fell back to the unsplit path this
    * JVM (bulk-backfill gate above). Test hook + soak observability only.
    */
  private[graft] val keyedSplitFallbacks = new java.util.concurrent.atomic.AtomicLong

  /** Split a touched-bucket read around the batch's key set (null-safe, so
    * null-key rows keep their pre-split window semantics): stored rows of
    * keys the batch CHANGES go to the merge, every other stored row rides
    * through untouched. This is the r16 compute bound: per-batch shuffle +
    * window work is ∝ the changed keys' history, not the touched buckets'
    * whole content — the difference between "reprocess every key that
    * shares a bucket with a change" and "reprocess what changed" once
    * buckets hold many keys (always true at 100 TB sizing). The key set is
    * broadcast: a micro-batch's distinct keys are bounded by batch size.
    * A bulk backfill past [[keyedSplitMaxKeys]] returns None — the caller
    * merges through its unsplit form instead; the gate is a LIMIT on the
    * distinct collect, so driver memory is bounded by the cap even when
    * the batch holds millions of keys (r16 VERDICT #2). With that many
    * changed keys the split buys little anyway: most stored rows are in
    * the merge either way.
    *
    * The key set is materialized on the DRIVER and re-planted as a
    * LocalRelation rather than broadcast-joined straight off the batch
    * lineage: building a BroadcastExchange from the persisted batch plan
    * MISSES the cache inside foreachBatch and re-executes the whole
    * micro-batch stateful plan per broadcast — the exact r15
    * double-execution class, caught the day it was written by the
    * LineageExecGuard streaming gate. A broadcast collects to the driver
    * anyway, so this moves no more data than the hinted join would; it
    * just routes through an action on the persisted DataFrame itself,
    * the one path the cache provably serves, and makes execute-once
    * STRUCTURAL (a LocalRelation has no lineage to re-run).
    *
    * One scan, not two: a marker column off a single left-outer broadcast
    * join replaces the r16 semi/anti pair, and the joined frame is
    * persisted so the changed and passthrough branches — consumed in two
    * subtrees of the rewrite's one union plan, which Spark does not
    * common-subexpression — read the touched buckets' parquet ONCE
    * (ADVICE r16; per-batch store IO halves). The third tuple element
    * releases that cache; callers run it after [[overwriteTouched]].
    */
  private def splitByBatchKeys(spark: SparkSession, ex: DataFrame,
      inc: DataFrame, keyCol: String)
      : Option[(DataFrame, DataFrame, () => Unit)] = {
    import scala.jdk.CollectionConverters._
    val maxKeys = keyedSplitMaxKeys(spark)
    val field = inc.schema(keyCol)
    val keyRows = inc.select(col(keyCol)).distinct().limit(maxKeys + 1).collect()
    if (keyRows.length > maxKeys) {
      keyedSplitFallbacks.incrementAndGet()
      System.err.println(s"[graft] keyed split: batch exceeds $maxKeys " +
        s"distinct '$keyCol' keys (spark.graft.keyedSplitMaxKeys); " +
        "merging unsplit")
      None
    } else {
      val keys = spark.createDataFrame(keyRows.toSeq.asJava,
        org.apache.spark.sql.types.StructType(Seq(field.copy(name = "__mk"))))
        .withColumn("__ch", lit(true))
      val marked = ex.join(broadcast(keys), col(keyCol) <=> col("__mk"), "left")
        .persist()
      Some((marked.filter(col("__ch").isNotNull).drop("__mk", "__ch"),
        marked.filter(col("__ch").isNull).drop("__mk", "__ch"),
        () => { marked.unpersist(); () }))
    }
  }

  /** Opt-in production twin of the test-scope LineageExecGuard (r16
    * VERDICT #6): `spark.graft.lineageGuard=true` embeds a row
    * accumulator in the incoming lineage BELOW the persist boundary of
    * every store merge and asserts execute-once when the merge completes,
    * so harness runs (the 16x soak, the scale sweeps) catch a
    * reintroduced double-execution in situ, not only the spec fixtures.
    * Off by default: the nondeterministic filter fences optimizer
    * movement around itself, which is exactly what makes the count exact
    * but costs pushdown through the batch plan. The check snapshots the
    * accumulator BEFORE the verification count so a cache-evicted
    * partition recomputed BY the count cannot false-positive; an eviction
    * recompute DURING the merge does trip it — acceptable for a debug
    * conf, and says something real about memory sizing when it fires.
    */
  private def guarded(spark: SparkSession, incoming: DataFrame)
      : (DataFrame, Option[org.apache.spark.util.LongAccumulator]) =
    if (!spark.conf.getOption("spark.graft.lineageGuard")
        .exists(_.trim.equalsIgnoreCase("true"))) (incoming, None)
    else {
      val acc = spark.sparkContext.longAccumulator("graft-lineage-guard")
      val tick = udf(() => { acc.add(1L); true }).asNondeterministic()
      (incoming.filter(tick()), Some(acc))
    }

  /** Guard epilogue: executed-row count vs the persisted batch's true
    * row count (a cache read, costing one cheap job only when the guard
    * conf is on).
    */
  private def assertExecutedOnce(site: String, inc: DataFrame,
      acc: Option[org.apache.spark.util.LongAccumulator]): Unit =
    acc.foreach { a =>
      val executed = a.value
      val rows = inc.count()
      require(executed == rows, s"[graft] lineageGuard: $site executed the " +
        s"incoming micro-batch plan ${executed}/${rows} row-increments — " +
        "the r15 double-execution class is back (or the batch cache was " +
        "evicted mid-merge)")
    }

  /** [[mergeTouched]] for PER-KEY merges: `merge` receives only the rows
    * of keys present in the batch (stored ∪ incoming); stored rows of
    * every other key in the touched buckets bypass it unchanged. Correct
    * whenever merge is a per-key function — its output for key k depends
    * only on k's rows — and the store already holds each key's merged
    * state (both hold for keep-newest; a merge that mixes keys must use
    * [[mergeTouched]]). Same persist discipline; the broadcasts read the
    * cached batch, so the incoming lineage still executes exactly once
    * (LineageExecGuard covers this path).
    */
  def mergeTouchedKeyed(spark: SparkSession, incoming: DataFrame,
      keyCol: String, dir: String, buckets: Int = DefaultBuckets)(
      merge: DataFrame => DataFrame): Unit = {
    val (src, guardAcc) = guarded(spark, incoming)
    val inc = src.withColumn(BucketCol,
      pmod(hash(col(keyCol)), lit(resolveBuckets(dir, requestedBuckets(spark, buckets)))))
      .persist()
    var release: () => Unit = () => ()
    try {
      val touched = touchedBuckets(inc)
      val (changed, passthrough) = readTouched(spark, touched, dir) match {
        case Some(ex) => splitByBatchKeys(spark, ex, inc, keyCol) match {
          case Some((chEx, pass, rel)) =>
            release = rel
            (chEx.unionByName(inc, allowMissingColumns = false), Some(pass))
          case None => // bulk-backfill gate: the pre-r16 unsplit merge
            (ex.unionByName(inc, allowMissingColumns = false), None)
        }
        case None => (inc, None)
      }
      val merged = merge(changed)
      overwriteTouched(passthrough.fold(merged)(merged.unionByName(_)),
        touched, dir)
      assertExecutedOnce("mergeTouchedKeyed", inc, guardAcc)
    } finally { release(); inc.unpersist(); () }
  }

  /** The generic touched-bucket read-merge-rewrite [[upsert]]
    * specializes: bucket the incoming rows by `keyCol`, read ONLY the
    * touched buckets' existing rows, hand (existing ∪ incoming) to
    * `merge`, and dynamically overwrite just those buckets. Public so
    * streaming tiers whose per-key state is a LIST rather than one
    * newest row (the kNN-graph top-K lists) can run their own merge —
    * e.g. rank-and-keep-K per key — under the same discipline: O(touched
    * buckets) IO per batch, replay-idempotent whenever `merge` is a
    * function of the unioned SET. `merge` must preserve every column
    * (the internal bucket column rides along).
    */
  def mergeTouched(spark: SparkSession, incoming: DataFrame,
      keyCol: String, dir: String, buckets: Int = DefaultBuckets)(
      merge: DataFrame => DataFrame): Unit = {
    // the incoming lineage executes TWICE below — the touched-bucket
    // discovery collect and the overwrite's localCheckpoint — and inside
    // a streaming foreachBatch that lineage is the micro-batch's whole
    // stateful plan (complete-mode state read + agg), measured 2–4 s per
    // re-execution in the r15 soak DWS stages. A self-contained persist
    // makes the batch plan run once; released before returning.
    val (src, guardAcc) = guarded(spark, incoming)
    val inc = src.withColumn(BucketCol,
      pmod(hash(col(keyCol)), lit(resolveBuckets(dir, requestedBuckets(spark, buckets)))))
      .persist()
    try {
      val touched = touchedBuckets(inc)
      val unioned = readTouched(spark, touched, dir) match {
        case Some(ex) => ex.unionByName(inc, allowMissingColumns = false)
        case None     => inc
      }
      overwriteTouched(merge(unioned), touched, dir)
      assertExecutedOnce("mergeTouched", inc, guardAcc)
    } finally { inc.unpersist(); () }
  }

  /** Probe-read a keyed store at O(touched buckets) IO: read back ONLY
    * the buckets `keys`' values hash into, bucket column dropped. The
    * read half of [[mergeTouched]] for ingest tiers whose per-batch
    * emission joins batch rows against stored state (the SimHash pair
    * tier's roster and doc-expansion probes) — the store never re-reads
    * whole. None when none of the touched buckets exist yet.
    */
  def readTouchedFor(spark: SparkSession, keys: DataFrame, keyCol: String,
      dir: String, buckets: Int = DefaultBuckets): Option[DataFrame] = {
    val inc = keys.withColumn(BucketCol,
      pmod(hash(col(keyCol)), lit(resolveBuckets(dir, requestedBuckets(spark, buckets)))))
    readTouched(spark, touchedBuckets(inc), dir).map(_.drop(BucketCol))
  }

  /** K8 streaming tier: SCD Type-2 history maintenance — the VERSIONED
    * sibling of [[upsert]] (which keeps only the latest row per key).
    * Each micro-batch of changelog rows merges into a bucketed history
    * store where every change is a [valid_from, valid_to) interval row;
    * an interval that was current CLOSES when a later change for its key
    * arrives (including across micro-batch boundaries).
    *
    * Idempotence comes from SET semantics, not ordering: the store
    * carries the SOURCE rows (key, seq, ts, attrs), the merge unions the
    * touched buckets' existing rows with the batch and collapses
    * duplicates on (key, seq) — a replayed batch adds nothing — and the
    * presentation columns (version, valid_from/valid_to, is_current) are
    * RECOMPUTED per merge by the same partitioned window as the batch
    * `k8_scd2_history` query. History is therefore always exactly the
    * batch query over the union of all changelog rows seen so far, which
    * is what StreamingSpec pins. Scale shape matches the other tiers:
    * only touched buckets are read/rewritten, per-key work is bounded by
    * that key's change count, and the window shuffle is on the key.
    * `seqCol` must order a key's changes (globally unique per key);
    * `tsCol` supplies the interval bounds.
    */
  def scd2Upsert(spark: SparkSession, incoming: DataFrame, keyCol: String,
      seqCol: String, tsCol: String, dir: String, buckets: Int = DefaultBuckets): Unit = {
    import org.apache.spark.sql.expressions.Window
    val srcCols = incoming.columns.toSeq
    // persist for the same double-execution reason as [[mergeTouched]];
    // everything from bucket discovery on sits INSIDE the try so the
    // persisted block is released on every failure path too (a leak here
    // accumulates across a long-running streaming driver's batches)
    val (src, guardAcc) = guarded(spark, incoming)
    val inc = src.withColumn(BucketCol,
      pmod(hash(col(keyCol)), lit(resolveBuckets(dir, requestedBuckets(spark, buckets)))))
      .persist()
    var release: () => Unit = () => ()
    try {
      val touched = touchedBuckets(inc)
      // changed-key split (r16, see [[splitByBatchKeys]]): only the keys
      // this batch changes re-run the dedup + window recompute; every
      // other key's history rows — presentation columns included — ride
      // through exactly as stored (the store IS their recomputed form)
      val (unioned, passthrough) = readTouched(spark, touched, dir) match {
        case Some(ex) => splitByBatchKeys(spark, ex, inc, keyCol) match {
          case Some((chEx, pass, rel)) =>
            release = rel
            (chEx.select((srcCols :+ BucketCol).map(col): _*)
              .unionByName(inc), Some(pass))
          case None => // bulk-backfill gate: every stored row re-windows
            (ex.select((srcCols :+ BucketCol).map(col): _*)
              .unionByName(inc), None)
        }
        case None => (inc, None)
      }
      val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).asc)
      val hist = unioned.dropDuplicates(keyCol, seqCol)
        .withColumn("version", row_number().over(w).cast("long"))
        .withColumn("__valid_to_ts", lead(col(tsCol), 1).over(w))
        .withColumn("valid_from",
          date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("valid_to",
          date_format(col("__valid_to_ts"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("is_current", col("__valid_to_ts").isNull)
        .drop("__valid_to_ts")
      overwriteTouched(passthrough.fold(hist)(hist.unionByName(_)),
        touched, dir)
      assertExecutedOnce("scd2Upsert", inc, guardAcc)
    } finally { release(); inc.unpersist(); () }
  }

  /** K6: dim MERGE — apply a put/delete changelog (op column: 'd' deletes,
    * anything else upserts) to a keyed dim table. Bucketed like `upsert`:
    * only the buckets the changelog touches are read or rewritten.
    */
  def mergeDim(spark: SparkSession, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, dir: String, buckets: Int = DefaultBuckets): Unit = {
    import org.apache.spark.sql.expressions.Window
    // persist for the same double-execution reason as [[mergeTouched]]
    val (src, guardAcc) = guarded(spark, changes)
    val inc = src.withColumn(BucketCol,
      pmod(hash(col(keyCol)), lit(resolveBuckets(dir, requestedBuckets(spark, buckets)))))
      .persist()
    var release: () => Unit = () => ()
    try {
      val touched = touchedBuckets(inc)
      // changed-key split (r16, see [[splitByBatchKeys]]): only keys in
      // this changelog batch enter the latest-wins window; other keys'
      // dim rows pass through as stored
      val (unioned, passthrough) = readTouched(spark, touched, dir) match {
        case Some(ex) => splitByBatchKeys(spark, ex, inc, keyCol) match {
          case Some((chEx, pass, rel)) =>
            release = rel
            (chEx.withColumn(opCol, lit("r"))
              .unionByName(inc, allowMissingColumns = true), Some(pass))
          case None => // bulk-backfill gate: all stored rows re-window
            (ex.withColumn(opCol, lit("r"))
              .unionByName(inc, allowMissingColumns = true), None)
        }
        case None => (inc, None)
      }
      val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
      val merged = unioned.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col(opCol) =!= "d")
        .drop("__rn", opCol)
      overwriteTouched(passthrough.fold(merged)(merged.unionByName(_)),
        touched, dir)
      assertExecutedOnce("mergeDim", inc, guardAcc)
    } finally { release(); inc.unpersist(); () }
  }

  /** Distinct bucket ids of a batch — bounded by the constant bucket
    * count (layout metadata, like AQE's partition stats), NOT by data
    * size, so the driver-side collect is safe.
    */
  private def touchedBuckets(inc: DataFrame): Seq[Int] =
    inc.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq.sorted

  /** Read only the touched buckets' directories (partition pruning by
    * construction). Existence check, NOT try/catch: a transient read
    * error on a real table must propagate, or the merge would silently
    * drop existing rows.
    */
  private def readTouched(spark: SparkSession, touched: Seq[Int],
      dir: String): Option[DataFrame] = {
    val dirs = touched.map(b => new java.io.File(dir, s"$BucketCol=$b"))
      .filter(_.exists()).map(_.getPath)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", dir).parquet(dirs: _*))
  }

  /** Rewrite only the touched buckets: dynamic partition overwrite
    * replaces exactly the partitions present in the output (Spark's
    * commit protocol stages then swaps per-partition). Deliberately
    * localCheckpoint (NOT the pluggable core.Barrier): lineage must be
    * SEVERED here so the rewrite can never re-read the files it is about
    * to replace — on block loss mid-write, failing the job is the safe
    * outcome, recomputing from replaced inputs is not.
    * A touched bucket whose every key was deleted yields no output rows —
    * dynamic overwrite leaves absent partitions alone, so those are
    * dropped explicitly.
    */
  private def overwriteTouched(merged: DataFrame, touched: Seq[Int],
      dir: String): Unit = {
    val out = merged.localCheckpoint()
    out.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol).parquet(dir)
    val present = out.select(BucketCol).distinct().collect()
      .map(_.getInt(0)).toSet
    touched.filterNot(present).foreach { b =>
      val d = new java.io.File(dir, s"$BucketCol=$b")
      if (d.exists()) { d.listFiles().foreach(deleteRec); d.delete() }
    }
  }

  /** K7: DDL side effects driven by config-change events — create/drop of
    * dim tables (directory-backed here; a catalog in production).
    * op: c/r → create, d → drop, u → drop + create.
    */
  def applyDimDdl(spark: SparkSession, baseDir: String, table: String,
      op: String): Unit = {
    val path = new java.io.File(baseDir, table)
    def drop(): Unit =
      if (path.exists()) { path.listFiles().foreach(deleteRec); path.delete() }
    def create(): Unit = path.mkdirs()
    op match {
      case "c" | "r" => create()
      case "d" => drop()
      case "u" => drop(); create()
      case other => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }
}
