package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over the `embeddings` fixture (64-d float vectors).
  *
  * - `sim_topk_bruteforce`: exact cosine top-k for a small query set against
  *   the full corpus. The query side is tiny → `broadcast()` it; the scan
  *   side streams once, no shuffle of the corpus. This is the correctness
  *   baseline.
  * - `sim_pairs_threshold`: all pairs with cosine ≥ τ *within a label
  *   block* — the blocked-join shape (never an unconditioned cross join).
  * - `sim_lsh_ann`: the 100 TB path — random-hyperplane signatures bucket
  *   the corpus (shuffle on the signature), candidates meet only within a
  *   bucket, top-k per query from candidates. Recall vs brute force is
  *   pinned by a ScalaTest, not an oracle (signature derivation is
  *   Spark-side hashing).
  *
  * Cosine math is double-accumulated native HOFs (graft.functions.Vectors)
  * — stays in codegen, no UDF.
  */
object Similarity extends OpModule {

  private val K = 5

  def queries: Map[String, Q] = baseQueries ++ queriesIvf

  private val baseQueries: Map[String, Q] = Map(
    "sim_topk_bruteforce" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr("cosine_sim(qv, nv)").as("sim")) // native codegen'd expression
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),
    "sim_pairs_threshold" -> ((s, dir) => {
      graft.plans.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
      val a = emb.select(col("vec_id").as("vec_a"), col("label").as("lab_a"),
        col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("vec_b"), col("label").as("lab_b"),
        col("embedding").as("eb"))
      a.join(b, col("lab_a") === col("lab_b") && col("vec_a") < col("vec_b"))
        .filter(expr("cosine_sim(ea, eb)") >= 0.3)
        .select(col("vec_a"), col("vec_b"))
    }),
    "sim_lsh_ann" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.plans.GraftFunctions.register(s)
      // Multi-table LSH: 4 independent 6-bit hyperplane tables; candidate
      // if ANY table bucket matches (union via explode + distinct). At
      // corpus scale the exploded (vec, sig) relation shuffles on sig —
      // never an all-pairs join. Signatures come from ONE codegen'd
      // posexplode + 24 sum-aggregates pass (the array-lambda form runs
      // interpreted per bit and re-reads the vector 24x).
      val emb = t(s, dir, "embeddings")
      val sigs = Vectors.lshSignaturesAgg(emb, "vec_id", "embedding", 6, 4)
      val withSigs = emb.join(sigs, "vec_id").localCheckpoint()
      val q = withSigs.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          explode(col("sigs")).as("qsig"))
      val cand = withSigs.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("nv"), explode(col("sigs")).as("sig"))
        .join(broadcast(q),
          col("sig") === col("qsig") && col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("qv"), col("nv"))
        .dropDuplicates("query_id", "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          expr("cosine_sim(qv, nv)").as("sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }))

  /** IVF-style ANN: a coarse quantizer (C deterministic centroids — the
    * first C vectors, classic random-init) partitions the corpus into
    * inverted lists; queries probe the nprobe nearest lists only. The
    * centroid set is O(C) and broadcast; assignment is one pass over the
    * corpus; candidate generation is a hash join on the cluster id —
    * the second 100 TB ANN path next to multi-table LSH.
    */
  private def ivf(s: org.apache.spark.sql.SparkSession, dir: String,
      cCentroids: Int, nProbe: Int) = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.register(s)
    val emb = t(s, dir, "embeddings")
    val cents = broadcast(emb.filter(col("vec_id") < cCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv")))
    val scored = emb.join(cents, lit(true))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        expr("cosine_sim(embedding, cv)").as("csim"))
    val byVec = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc,
      col("cent_id").asc)
    val ranked = scored.withColumn("crank", row_number().over(byVec))
    val assigned = ranked.filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cluster"))
      .localCheckpoint()
    val probes = ranked.filter(col("vec_id") < 8 && col("crank") <= nProbe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cent_id").as("probe"))
    (assigned, probes)
  }

  def queriesIvf: Map[String, Q] = Map(
    "sim_ivf_ann" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val (assigned, probes) = ivf(s, dir, 16, 4)
      val cand = assigned
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"),
          col("cluster"))
        .join(broadcast(probes), col("cluster") === col("probe") &&
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          expr("cosine_sim(qv, nv)").as("sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id").asc)
      cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }))

  def oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                             CAST(n.embedding AS DOUBLE[])) DESC,
         |      n.vec_id ASC) AS rank
         |  FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         |  WHERE q.vec_id < 8)
         |WHERE rank <= $K""".stripMargin,
    "sim_pairs_threshold" ->
      """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.3""".stripMargin)
  // sim_lsh_ann: no oracle (Spark-side signature hashing) → rows-only check;
  // recall vs brute force is asserted in SimilaritySpec.
}
