package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Stage-by-stage timing of the pack-index family at a scale dir — hunts
  * the superlinear growth the 64× reading exposed.
  * Usage: runMain graft.tools.ProfilePack <scaleDir> [nRuns]
  */
object ProfilePack {
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale_64x")
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        force(mk)
        graft.core.Barrier.releaseAll(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pack] $label%-32s ${ts.map(t => f"$t%.2f").mkString("[", ",", "]")}")
    }
    def docs = graft.core.Tables.load(spark, dir, "documents")
    def counts = docs
      .select(col("doc_id"),
        Text.bpeishTokenCount(col("text")).cast("long").as("toks"))
      .filter(col("toks") > 0L)

    println(s"[pack] dir=$dir docs=${docs.count()} " +
      s"parts=${docs.rdd.getNumPartitions}")
    time("scan_only")(docs.select(col("doc_id")))
    time("tokenize_count")(counts)
    time("tokenize_array")(docs.select(col("doc_id"),
      Text.bpeishTokens(col("text")).as("tl")))
    time("count_then_agg")(counts.groupBy().count())
    time("full_pack_sequences") {
      graft.SparkEntry.queries("corpus_pack_sequences")(spark, dir)
    }
    time("full_length_batches") {
      graft.SparkEntry.queries("corpus_length_batches")(spark, dir)
    }
    spark.stop()
  }
}
