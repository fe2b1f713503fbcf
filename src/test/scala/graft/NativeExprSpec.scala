package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions

/** The native sorted_intersect_count expression must equal
  * size(array_intersect) on every pair of sorted distinct string arrays,
  * and must participate in whole-stage codegen.
  */
class NativeExprSpec extends SparkSpec {

  test("sorted_intersect_count == size(array_intersect) on fuzzed " +
      "sorted distinct arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // deterministic fuzz: 300 pairs of random-ish string sets with
    // varied overlap, lengths 0..60, unicode mixed in
    val rnd = new scala.util.Random(0xC0FFEE)
    val alphabet = Vector("a", "bb", "ccc", "δδ", "日本", "x1", "", " ",
      "zz9", "", "longer-token-value", "α", "mid")
    def set(): Seq[String] = {
      val n = rnd.nextInt(61)
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size)) +
        rnd.nextInt(40).toString).distinct.sorted
    }
    val rows = Seq.fill(300)((set(), set()))
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val diff = df.select(
        expr("sorted_intersect_count(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .filter(col("native") =!= col("builtin"))
      .count()
    assert(diff === 0,
      "two-pointer walk disagrees with array_intersect on sorted input")
    // edge shapes
    val edges = Seq(
      (Seq.empty[String], Seq.empty[String]),
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b", "c"), Seq("a", "b", "c"))).toDF("a", "b")
    val out = edges.select(expr("sorted_intersect_count(a, b)"))
      .collect().map(_.getInt(0))
    assert(out.toSeq === Seq(0, 0, 1, 3))
  }

  test("sorted_intersect_count runs inside WholeStageCodegen") {
    GraftFunctions.register(spark)
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(sort_array(graft.functions.Text.tokenizeDistinct(col("text")))
        .as("a"))
    val plan = docs
      .select(expr("sorted_intersect_count(a, a)").as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Project [sorted_intersect_count") &&
      plan.contains("*(1)"), plan.take(1200))
  }

  test("spark's array_sort order IS UTF8 binary order (the walk's " +
      "contract) on adversarial strings") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // strings whose JVM-String order and UTF8-byte order could diverge
    // (supplementary plane vs BMP); the expression compares UTF8String,
    // array_sort must agree with it
    val tricky = Seq("😀", "�", "a", "é", "Z",
      "", "zz", "0")
    val df = Seq((tricky, tricky)).toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val n = df.select(expr("sorted_intersect_count(a, b)"))
      .collect().head.getInt(0)
    assert(n === tricky.length, "self-intersection must see every element")
  }
}
