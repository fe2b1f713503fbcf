package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the exact-integer power-iteration PCA family (`sim_pca_power` /
  * `sim_pca_project` / `sim_pca_variance`): the DuckDB oracle already
  * pins bit-exactness; these tests pin the ALGORITHMIC invariants that a
  * hash match alone wouldn't explain — the infinity-norm rescale
  * contract, that iterating actually moves the vector, and the defining
  * property of power iteration (the Rayleigh quotient is non-decreasing
  * in the round count).
  */
class PcaSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {

  // the shared `cells` barrier lives for the whole suite (releasing
  // between tests would kill the lineage-truncated checkpoint the lazy
  // val still references); release once when the suite ends so the
  // blocks don't pin the JVM-wide session's block manager for the rest
  // of `sbt test`
  override def afterAll(): Unit = graft.core.Barrier.releaseAll(spark)

  private lazy val cells = Similarity.pcaCells(spark, sfDir)

  /** (Σ (projᵢ DIV 1000)², Σ vⱼ²) for the direction after `rounds`
    * rounds — the integer pieces of the Rayleigh quotient, same
    * arithmetic as sim_pca_variance.
    */
  private def rayleighParts(rounds: Int): (BigInt, BigInt) = {
    val v = Similarity.pcaV(spark, sfDir, rounds, Some(cells))
    val vns = v.agg(sum(col("v") * col("v"))).collect()(0).getLong(0)
    val pss = cells.join(broadcast(v), "dim")
      .groupBy(col("vec_id")).agg(sum(col("c") * col("v")).as("proj"))
      .select(expr("CASE WHEN proj >= 0 THEN proj DIV 1000 " +
        "ELSE -((-proj) DIV 1000) END").as("p"))
      .agg(sum(col("p") * col("p"))).collect()(0).getLong(0)
    (BigInt(pss), BigInt(vns))
  }

  test("component is infinity-normalized: max|v| is exactly 1000, 64 dims") {
    val v = graft.SparkEntry.queries("sim_pca_power")(spark, sfDir).collect()
    assert(v.length === 64)
    assert(v.map(r => math.abs(r.getLong(1))).max === 1000L,
      "every rescale divides by the global max-abs, so the leading " +
        "coordinate must sit exactly at the 1000 milli-unit ceiling")
  }

  test("iteration is non-vacuous: round 3 differs from round 1") {
    val v1 = Similarity.pcaV(spark, sfDir, 1, Some(cells))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v3 = Similarity.pcaV(spark, sfDir, 3, Some(cells))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 !== v3,
      "the all-ones start must not already be the fixed point — " +
        "otherwise the chained rounds test nothing")
  }

  test("Rayleigh quotient is non-decreasing in rounds (power iteration)") {
    val (p1, n1) = rayleighParts(1)
    val (p3, n3) = rayleighParts(3)
    // p3/n3 >= p1/n1, cross-multiplied to stay in exact integers
    assert(p3 * n1 >= p1 * n3,
      s"variance along the round-3 direction ($p3/$n3) fell below the " +
        s"round-1 direction ($p1/$n1) — power iteration must not regress")
  }

  test("deflation: second component is near-orthogonal to the first") {
    val both = graft.SparkEntry.queries("sim_pca_top2")(spark, sfDir)
      .collect()
    val v1 = both.filter(_.getLong(0) == 1L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val v2 = both.filter(_.getLong(0) == 2L)
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(v1.size === 64 && v2.size === 64)
    assert(v2.values.map(math.abs).max === 1000L,
      "the second ladder shares the infinity-norm rescale contract")
    val dot = v1.keys.map(d => v1(d) * v2(d)).sum.toDouble
    val n1 = math.sqrt(v1.values.map(v => v * v).sum.toDouble)
    val n2 = math.sqrt(v2.values.map(v => v * v).sum.toDouble)
    val cos = math.abs(dot / (n1 * n2))
    assert(cos < 0.2,
      s"deflation removes the v1 span up to milli truncation, so the " +
        s"second direction must be near-orthogonal; |cos| = $cos")
    assert(v1 !== v2, "deflation must not reproduce the first component")
  }

  test("plan shape (one pre-barrier round): no window, d-row/1-row " +
      "relations broadcast, one vec_id co-shuffle") {
    // the committed queries barrier each round (their final plan is a
    // checkpoint scan), so pin the ROUND plan the loop actually runs
    val v0 = spark.range(64).select(col("id").as("dim"),
      org.apache.spark.sql.functions.lit(1000L).as("v"))
    val plan = Similarity.pcaRound(cells, v0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the round is joins + aggregates — a window would mean a global " +
        "sort slipped in")
    assert(plan.contains("BroadcastExchange"),
      "the d-row component and 1-row max-abs relations must broadcast")
    // every data-sized exchange in the round rides the thin vec_id key
    // (the t aggregate, the w-join's two sides, the rescale's input);
    // the SinglePartition exchanges that also appear carry only the
    // 1-row max-abs aggregate states
    val vecExchanges = "hashpartitioning\\(vec_id".r
      .findAllIn(plan).length
    assert(vecExchanges >= 1 && vecExchanges <= 4,
      s"the round's data exchanges all ride the thin vec_id key; got " +
        s"$vecExchanges prints")
    assert(!plan.contains("RoundRobinPartitioning"),
      "no repartition-style unkeyed exchange may move the cells")
  }

  test("variance report: var_explained in (1/64, 1]") {
    val r = graft.SparkEntry.queries("sim_pca_variance")(spark, sfDir)
      .collect()(0)
    val ve = r.getAs[Double]("var_explained")
    assert(ve > 1.0 / 64 && ve <= 1.0,
      s"one learned axis must beat the uniform-axis floor; got $ve")
  }
}
