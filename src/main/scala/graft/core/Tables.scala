package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Fixture-table IO + declared schemas.
  *
  * Design note (SURVEY §7.1): every pipeline in this engine is a pure
  * `DataFrame => DataFrame` so the same transform runs identically in batch
  * (DuckDB-oracle correctness) and Structured Streaming (production shape).
  * This is the analog of the reference's BaseApp/SQLUtil source plumbing
  * (ref: realtime-common/.../base/BaseApp.java:24-67, util/SQLUtil.java:14-37)
  * but declarative: schemas are data, reads are one-liners, and Catalyst sees
  * the whole plan (pushdown + pruning reach the parquet scan).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Declared schemas for every fixture table (no per-query literals). */
  val schemas: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Batch read of one fixture table. Parquet is self-describing; the scan
    * gets column pruning + predicate pushdown from Catalyst for free.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively — read it as a long (legacy conf) and convert. Integer `div`
    * (not `/`): ns-epoch values exceed 2^53, double division would corrupt
    * the low bits. The fixture's timestamps are micro-aligned, so the
    * conversion is lossless.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val stamp = pathStamp(spark, path)
    val raw = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val r = read(spark, path, stamp)
      // ns-fixture: ts arrives as a nanos long (convert); derived copies
      // written by this library already carry a real timestamp
      if (r.schema("ts").dataType == LongType)
        r.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      else r
    } else read(spark, path, stamp)
    spread(raw, name, stamp.map(_._2).getOrElse(Seq.empty))
  }

  /** (cacheKey, totalBytes) for a parquet path — one filesystem listing,
    * shared by the schema cache and the ingest-spread decision below. The
    * key folds in EVERY data file's (name, length, mtime) — not just the
    * totals (ADVICE r17: a rewrite preserving total bytes within one mtime
    * tick must still miss) — so a path REWRITTEN mid-session (spec
    * fixtures regenerate into the same tmp dir) never serves a stale
    * schema; fixture files themselves are immutable for a session's life.
    * Directory listings skip `_`/`.`-prefixed entries (_SUCCESS,
    * .crc) to match Spark's own data-file filter — counting them would
    * pad the openCost math and perturb the split estimate.
    * None = path unreadable; the plain reader surfaces the real error.
    * Only NonFatal errors downgrade — OOM/interrupts propagate.
    */
  private def pathStamp(spark: SparkSession, path: String)
      : Option[(String, Seq[Long])] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      val files =
        if (st.isDirectory)
          fs.listStatus(p).toSeq.filter(f => f.isFile && {
            val n = f.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          })
        else Seq(st)
      val lens = files.map(_.getLen)
      val sig = files.map(f =>
        s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .mkString(",")
      Some((s"$path#$sig", lens))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Read a parquet path with the SESSION-CACHED inferred schema
    * (OPTIMIZATION r17). A bare `spark.read.parquet(p)` runs a one-task
    * schema-inference JOB on every call — profiled at 30–70 ms per `t()`
    * reference, paid again for every query construction of every bench
    * run (the stage listener shows it as `parquet at Tables.scala` in
    * front of every query). The schema of an immutable fixture file never
    * changes, so the first load infers and caches, and every later load
    * passes the SAME StructType back explicitly, which skips the
    * inference job entirely. This caches METADATA only — never rows, so
    * every run still computes from the parquet inputs; it is exactly
    * what a catalog/manifest-backed table format provides at scale
    * (guide §6). Keyed by (path, bytes, mtime): a rewritten path
    * re-infers.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def read(spark: SparkSession, path: String,
      stamp: Option[(String, Seq[Long])]): DataFrame =
    stamp match {
      case Some((key, _)) =>
        // bound the cache (ADVICE r17): every rewrite strands its old
        // entry, so a long session regenerating fixtures could grow this
        // without limit; schemas are tiny but the keys embed file lists.
        // A rare full clear is cheaper than LRU bookkeeping — the next
        // loads just re-infer once each.
        if (schemaCache.size > 512) schemaCache.clear()
        val sch = schemaCache.computeIfAbsent(key,
          _ => spark.read.parquet(path).schema)
        spark.read.schema(sch).parquet(path)
      case None => spark.read.parquet(path)
    }

  /** Scale-adaptive ingest spread (OPTIMIZATION r17) — the codec
    * parallelism floor of `Multimodal.spreadToCores` (VERDICT r14 #4)
    * generalized to the shared batch read path, because EVERY per-row
    * operator above a scan inherits the scan's split count, and a parquet
    * scan can never be more parallel than its ROW GROUPS (the bench
    * fixtures are ONE row group per table, so scan-rooted stages ran on
    * 1 of the session's cores).
    *
    * The r17 paired A/B (4 interleaved pairs per query, quiet window)
    * showed a BLANKET spread is a net loss: the extra exchange + AQE
    * stage costs ~0.2–0.4 s, which only pays when the task(s) it
    * re-deals hold enough input to keep the freed cores busy —
    * lineitem-rooted queries won (q1 −0.36 s, j1 −0.12 s median at
    * 3.7 MB/split) while every query rooted in a ≤2 MB single-split
    * table lost (+0.05..+0.7 s). Hence the firing conditions:
    *  (a) the scan would plan fewer splits than defaultParallelism
    *      (computed from file bytes via the FilePartition split math —
    *      no planning pass); at 100 TB every fact table has orders of
    *      magnitude more splits than the cluster has cores, so the
    *      production plan is untouched;
    *  (b) each saved split carries ≥ spark.graft.scanSpreadMinSplitBytes
    *      (default 3 MiB) — the per-task-economics bar the A/B measured:
    *      below it the re-deal's fixed cost exceeds the freed compute;
    *  (c) the relation is ≤ spark.graft.scanSpreadMaxBytes (default
    *      1 GiB): a mid-size table scanning in few splits is better
    *      served by fixing its file layout (guide §6) than a reshuffle.
    *
    * Partitioning is a DETERMINISTIC hash over ALL of the table's columns
    * (r18, VERDICT r17 #6: the r17 lead-key hash silently under-delivered
    * on a low-cardinality or skewed lead column — a constant key would
    * re-deal everything into ONE partition; the full row hash is
    * shape-proof for any table whose rows are mostly distinct, which every
    * declared fixture table is). Deterministic hash, not round-robin —
    * round-robin re-deals rows when a task retries (SPARK-38388), and
    * its sort-before-repartition pays a per-partition sort this narrow
    * exchange doesn't need. Pruning and pushdown pass through a
    * Repartition node, so the scan below keeps PushedFilters/ReadSchema
    * (plan-asserted in OperatorsSpec). Disable with
    * spark.graft.scanSpread=false (the A/B hook).
    */
  private def spread(df: DataFrame, name: String,
      fileLens: Seq[Long]): DataFrame = {
    val s = df.sparkSession
    def confLong(k: String, d: Long): Long =
      s.conf.getOption(k).map(v => v.trim.toLongOption.getOrElse(
        sys.error(s"$k must be an integer, got '$v'"))).getOrElse(d)
    val enabled = s.conf.getOption("spark.graft.scanSpread")
      .map(v => v.trim.toBooleanOption.getOrElse(
        sys.error(s"spark.graft.scanSpread must be a boolean, got '$v'")))
      .getOrElse(true)
    if (!enabled || fileLens.isEmpty || !schemas.contains(name)) return df
    val len = fileLens.sum
    val cores = s.sparkContext.defaultParallelism
    val maxBytes = confLong("spark.graft.scanSpreadMaxBytes", 1L << 30)
    val minSplit = confLong("spark.graft.scanSpreadMinSplitBytes", 3L << 20)
    if (len == 0 || len > maxBytes) return df
    // FilePartition.maxSplitBytes math, driver-side, PER FILE (a parquet
    // file splits into ceil(len/maxSplitBytes) pieces; small files can
    // only pack together, never split further — so Σ per-file splits is
    // the scan's parallelism ceiling, and row groups can only lower it:
    // firing on it is conservative). The openCost term charges each file
    // the same padding FilePartition uses when sizing bytesPerCore.
    // one conf source (ADVICE r17): read the split knobs from THIS df's
    // session, not the thread-local active one — multi-session callers
    // (BenchServer threads, suite-vs-query sessions) can differ
    val sqlc = s.sessionState.conf
    val openCost = sqlc.filesOpenCostInBytes
    val padded = len + openCost * fileLens.size
    val maxSplitBytes = math.min(sqlc.filesMaxPartitionBytes,
      math.max(openCost, padded / math.max(cores, 1)))
    val splits = fileLens
      .map(l => ((l + maxSplitBytes - 1) / maxSplitBytes).toInt).sum
    if (splits >= cores || len / math.max(splits, 1) < minSplit) return df
    df.repartition(cores, schemas(name).fields.map(f =>
      org.apache.spark.sql.functions.col(f.name)): _*)
  }

  /** Streaming read of the same table — identical downstream transforms.
    * (Kafka source analog, ref FlinkSourceUtil.java:24-56; in production
    * this becomes readStream.format("kafka") + from_json.)
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    // same ns-long vs real-timestamp dual case as load(): probe the actual
    // file schema, since library-written events copies carry a TIMESTAMP
    val tsIsLong = name == "events" && {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .schema("ts").dataType == LongType
    }
    if (tsIsLong) {
      val raw = StructType(schemas("events").map {
        case StructField("ts", _, n, m) => StructField("ts", LongType, n, m)
        case f => f
      })
      // `{name}` glob: FileStreamSource force-sets basePath to the literal
      // path when it is NOT a glob, and a single-file basePath is rejected
      // downstream; a glob path keeps our directory basePath.
      spark.readStream.schema(raw).option("basePath", dir)
        .parquet(s"$dir/{$name}.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else
      spark.readStream.schema(schemas(name)).option("basePath", dir)
        .parquet(s"$dir/{$name}.parquet")
  }

  /** Persist a relation as a BUCKETED table (hash-bucketed + sorted by
    * `key` into `buckets` files per partition dir): the co-located-join
    * layout. Two tables bucketed the same way join WITHOUT any Exchange —
    * each task zips matching buckets — which is the difference between
    * "every daily merge reshuffles 100 TB" and "every daily merge streams
    * matching files" for repeat-join workloads (snapshot diff, roster
    * patch, upsert merge). Bucket pruning also serves point lookups.
    * Requires a table name (bucket metadata lives in the catalog);
    * `spark.sql.warehouse.dir` decides the physical location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table)
}
