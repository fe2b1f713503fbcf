package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Barrier.BarrierOps
import graft.core.Tables
import graft.functions.Text
import graft.operators.Dedup

/** Variance hunt for dedup_minhash_lsh (VERDICT r8 #2): times each
  * candidate shape N times and prints the raw runs, so the fix targets the
  * measured spread source, not the guessed one.
  * Usage: runMain graft.tools.ProfileMinhash [sfDir] [nRuns]
  */
object ProfileMinhash {
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    force(spark.read.parquet(s"$dir/documents.parquet")) // warmup
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt

    def bench(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        force(mk)
        graft.core.Barrier.releaseAll(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val steady = ts.drop(1)
      println(f"[mh] $label%-28s runs=${ts.map(t => f"$t%.2f").mkString("[", ",", "]")} " +
        f"steadySpread=${steady.max / steady.min}%.2fx min=${ts.min}%.2f")
    }

    def docs = Tables.load(spark, dir, "documents")

    // A: committed shape — barrier the FULL bandedSigs (toks ride 3x)
    bench("A_current_full_barrier") {
      Dedup.verifiedPairs(Dedup.bandedSigs(docs).barrier(), nPart)
    }
    // B: no barrier at all — ReusedExchange dedups the banded sides, the
    // toks read recomputes the derivation once more
    bench("B_no_barrier") {
      Dedup.verifiedPairs(Dedup.bandedSigs(docs), nPart)
    }
    // C: split — thin (doc_id, band, sig) straight from the slice aggs
    // (no toks join, nothing fat crosses the barrier or the banded
    // shuffle); toks barriered once at 1x volume for the two verify joins
    bench("C_split_thin") {
      val toks = docs.select(col("doc_id"),
        Text.tokenizeDistinct(col("text")).as("toks")).barrier()
      force(toks) // materialize outside the banded derivation
      Dedup.verifiedPairsSplit(Dedup.thinSigs(docs), toks, nPart)
    }
    // D: C but without any barrier on toks (tokenizeDistinct runs twice)
    bench("D_split_no_toks_barrier") {
      val toks = docs.select(col("doc_id"),
        Text.tokenizeDistinct(col("text")).as("toks"))
      Dedup.verifiedPairsSplit(Dedup.thinSigs(docs), toks, nPart)
    }
    // E: whatever shape the shipped query currently has
    bench("E_shipped_query") {
      graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
    }
    spark.stop()
  }
}
