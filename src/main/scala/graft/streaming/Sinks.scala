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

  /** K5: upsert-by-key into a keyed store: merge incoming rows with the
    * existing table, keep the newest version per key (version = seq
    * column). Used from foreachBatch in streaming; idempotent under
    * replays (same input → same winner), which is what makes micro-batch
    * retries exactly-once in effect.
    */
  def upsert(spark: SparkSession, incoming: DataFrame, keyCol: String,
      seqCol: String, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    // existence check, NOT try/catch: a transient read error on a real
    // table must propagate, or the swap below would silently drop it
    val unioned =
      if (!new java.io.File(dir).exists()) incoming
      else spark.read.parquet(dir)
        .unionByName(incoming, allowMissingColumns = false)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val merged = unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    writeAtomic(merged, dir)
  }

  /** K6: dim MERGE — apply a put/delete changelog (op column: 'd' deletes,
    * anything else upserts) to a keyed dim table.
    */
  def mergeDim(spark: SparkSession, changes: DataFrame, keyCol: String,
      seqCol: String, opCol: String, dir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val unioned =
      if (!new java.io.File(dir).exists()) changes
      else spark.read.parquet(dir).withColumn(opCol, lit("r"))
        .unionByName(changes, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val merged = unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "d")
      .drop("__rn", opCol)
    writeAtomic(merged, dir)
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

  /** Rewrite a keyed table in place without reading+writing the same files
    * concurrently (write to a temp dir, then swap).
    */
  private def writeAtomic(df: DataFrame, dir: String): Unit = {
    val tmp = dir + "__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(dir)
    if (target.exists()) { target.listFiles().foreach(deleteRec); target.delete() }
    if (!new java.io.File(tmp).renameTo(target))
      throw new java.io.IOException(
        s"swap failed: could not rename $tmp to $dir (data is at $tmp)")
  }
}
