package graft

import org.apache.spark.sql.functions._

/** Pins the eval-hygiene split family: `sample_split_leakage_free` must
  * put every verified near-dup pair on ONE side (the property that makes
  * val scores honest), and the two matrix reports must conserve the pair
  * relation they summarize.
  */
class LeakageSplitSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // the CC fixpoint and the method matrix barrier several relations on
  // the JVM-wide session — release once at suite end
  override def afterAll(): Unit = graft.core.Barrier.releaseAll(spark)

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private lazy val pairCount = q("dedup_minhash_lsh").count()

  test("leakage-free split: zero verified pairs straddle a split boundary") {
    val splits = q("sample_split_leakage_free")
      .select(col("doc_id"), col("split"))
    val straddling = q("dedup_minhash_lsh")
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("pa")),
        "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("pb")),
        "doc_b")
      .filter(col("pa") =!= col("pb"))
    assert(straddling.isEmpty,
      "cluster-keyed assignment means both ends of every near-dup pair " +
        "hash to the same side — any straddler breaks eval hygiene")
    assert(pairCount > 0,
      "fixture must actually contain near-dup pairs or the test is vacuous")
  }

  test("leakage-free split covers every document exactly once") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val s = q("sample_split_leakage_free")
    assert(s.count() === docs)
    assert(s.select(col("doc_id")).distinct().count() === docs)
    assert(s.filter(!col("split").isin("train", "val", "test")).isEmpty)
  }

  test("k-fold assignment: zero verified pairs straddle a fold; every " +
      "doc in exactly one of 5 used folds, consistent with the 3-way split") {
    val folds = q("sample_kfold")
    val byDoc = folds.select(col("doc_id"), col("fold"))
    val straddling = q("dedup_minhash_lsh")
      .join(byDoc.select(col("doc_id").as("doc_a"), col("fold").as("fa")),
        "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("fold").as("fb")),
        "doc_b")
      .filter(col("fa") =!= col("fb"))
    assert(straddling.isEmpty,
      "fold is a pure function of the dup cluster — a straddler means a " +
        "rotation trains on near-dups of its held-out fold")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(folds.count() === docs)
    assert(folds.select(col("doc_id")).distinct().count() === docs)
    val used = folds.select(col("fold")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(used.sameElements(0L to 4L),
      s"all 5 folds must be populated, got ${used.mkString(",")}")
    // same cluster relation as the 3-way split: cluster ids must agree
    val threeWay = q("sample_split_leakage_free")
      .select(col("doc_id"), col("cluster_id").as("c3"))
    assert(folds.join(threeWay, "doc_id")
      .filter(col("cluster_id") =!= col("c3")).isEmpty,
      "both splits must key off the identical CC labeling")
  }

  test("naive-split leakage report conserves the pair relation") {
    val rep = q("sample_split_leakage_report").collect()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === pairCount,
      "every verified pair lands in exactly one split-pair cell")
    rep.foreach { r =>
      assert(r.getAs[Boolean]("is_leakage") ===
        (r.getAs[String]("split_x") != r.getAs[String]("split_y")))
    }
  }

  test("method matrix: each cell decomposes its two families' pair counts") {
    val m = q("dedup_method_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m.size === 6)
    def pairs(name: String) =
      q(name).select(col("doc_a"), col("doc_b")).distinct().count()
    val nMh = pairs("dedup_minhash_lsh")
    val nNg = pairs("dedup_ngram_jaccard")
    val (c, oa, ob) = m(("minhash", "ngram"))
    assert(c + oa === nMh,
      "common + only_minhash must equal the minhash pair count")
    assert(c + ob === nNg,
      "common + only_ngram must equal the ngram pair count")
    assert(m.values.exists(_._1 > 0L),
      "the families must actually agree somewhere or the report is vacuous")
  }

  test("source-overlap matrix conserves pairs; ppm within bounds") {
    val rep = q("corpus_source_overlap").collect()
    assert(rep.map(_.getAs[Long]("n_pairs")).sum === pairCount)
    rep.foreach { r =>
      val ppm = r.getAs[Long]("ppm_possible")
      assert(ppm >= 0L && ppm <= 1000000L,
        s"ppm of the possible pair count must be a fraction; got $ppm")
      assert(r.getAs[String]("source_x") <= r.getAs[String]("source_y"),
        "cells must be canonically ordered so both triangles collapse")
    }
  }
}
