package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Text

/** Dev profiler: times individual pipeline stages of the heavier queries so
  * optimization targets the real hotspot, not the guessed one.
  * Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3fs rows=$n")
  }
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    force(spark.read.parquet(s"$dir/lineitem.parquet")) // warmup

    val d = Tables.load(spark, dir, "documents")
    time("read only")(force(d))
    time("tokenizeDistinct")(force(d.select(col("doc_id"),
      Text.tokenizeDistinct(col("text")).as("toks"))))
    val toksDf = d.select(col("doc_id"), Text.tokenize(col("text")).as("rtoks"))
      .localCheckpoint()
    time("wordShingles from tokens")(force(toksDf.select(col("doc_id"),
      Text.wordShingles(col("rtoks"), 3).as("sh"))))
    val docs = toksDf.select(col("doc_id"),
      array_distinct(col("rtoks")).as("toks"),
      Text.wordShingles(col("rtoks"), 3).as("sh"))
    time("docs localCheckpoint")(force(docs.localCheckpoint()))
    val dc = docs.localCheckpoint()
    time("explode shingles")(force(dc.select(col("doc_id"),
      explode(col("sh")).as("shingle"))))
    val mh = dc.select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(min(md5(concat(lit("0|"), col("shingle")))).as("mh0"),
        min(md5(concat(lit("1|"), col("shingle")))).as("mh1"),
        min(md5(concat(lit("2|"), col("shingle")))).as("mh2"),
        min(md5(concat(lit("3|"), col("shingle")))).as("mh3"),
        min(md5(concat(lit("4|"), col("shingle")))).as("mh4"),
        min(md5(concat(lit("5|"), col("shingle")))).as("mh5"))
    time("minhash agg")(force(mh))
    time("full query")(force(
      graft.operators.Dedup.queries("dedup_minhash_lsh")(spark, dir)))

    // native codegen'd expression vs interpreted HOF composition
    graft.plans.GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val pairs = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .join(emb.select(col("vec_id").as("idb"), col("embedding").as("eb")),
        col("ida") =!= col("idb") && col("idb") < 64)
    time("cosine HOF (interpreted)")(force(
      pairs.select(graft.functions.Vectors.cosine(col("ea"), col("eb")))))
    time("cosine native (codegen)")(force(
      pairs.select(expr("cosine_sim(ea, eb)"))))
    spark.stop()
  }
}
