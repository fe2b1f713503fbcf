package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** The two LSH signature implementations — the column-expression form
  * (per-row lambdas, convenient for ad-hoc use) and the explode+aggregate
  * form (codegen'd, the scale path used by sim_lsh_ann) — must produce
  * identical signatures: same hyperplane family, same sequential
  * double-widened accumulation.
  */
class VectorsSpec extends SparkSpec {

  test("lshTables (column form) == lshSignaturesAgg (aggregate form)") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val colForm = emb.select(col("vec_id"),
      Vectors.lshTables(col("embedding"), 6, 4).as("sigs"))
    val aggForm = Vectors.lshSignaturesAgg(emb, "vec_id", "embedding", 6, 4)
    val joined = colForm.join(aggForm.withColumnRenamed("sigs", "sigs2"), "vec_id")
    val mismatched = joined.filter(col("sigs") =!= col("sigs2")).count()
    assert(mismatched === 0,
      "both signature implementations must agree on every vector")
  }

  test("cosine of a vector with itself is 1") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val bad = emb.select(
        Vectors.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(bad === 0)
  }
}
