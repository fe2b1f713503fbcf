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

  test("lshTables (column form) == lshSignaturesAgg (native walk) == " +
      "lshSignaturesAggSpec (aggregate form)") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val colForm = emb.select(col("vec_id"),
      Vectors.lshTables(col("embedding"), 6, 4).as("sigs"))
    val native = Vectors.lshSignaturesAgg(emb, "vec_id", "embedding", 6, 4)
    val aggForm = Vectors.lshSignaturesAggSpec(
      emb, "vec_id", "embedding", 6, 4)
    Seq("column" -> colForm, "aggregate-spec" -> aggForm).foreach {
      case (tag, other) =>
        val joined = native.join(
          other.withColumnRenamed("sigs", "sigs2"), "vec_id")
        val mismatched = joined.filter(col("sigs") =!= col("sigs2")).count()
        assert(mismatched === 0,
          s"native signatures must equal the $tag form on every vector")
        assert(joined.count() === emb.count(),
          s"native form must keep every vector the $tag form signs")
    }
  }

  test("native lsh_sigs plan has no exchange and drops null/empty rows " +
      "like the explode form") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val plan = Vectors.lshSignaturesAgg(emb, "vec_id", "embedding", 6, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"signatures must not shuffle:\n${plan.take(1200)}")
    val edge = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (2L, Seq.empty[Float]),
      (3L, null)).toDF("vec_id", "embedding")
    val ids = Vectors.lshSignaturesAgg(edge, "vec_id", "embedding", 6, 4)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(1L), "null/empty vectors must drop, not sign")
  }

  test("cosine of a vector with itself is 1") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val bad = emb.select(
        Vectors.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(bad === 0)
  }
}
