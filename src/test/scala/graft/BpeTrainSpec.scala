package graft

import org.apache.spark.sql.functions._

/** Pins `text_bpe_train` (r9 verdict #2) beyond the DuckDB gate:
  *  - greedy LEFT-TO-RIGHT NON-OVERLAPPING merge semantics on the one
  *    shape where naive counting and greedy merging disagree — an
  *    A A A … run ("a a a a a" → merge(a,a) keeps even offsets only:
  *    [aa, aa, a], 2 merges from a naive count of 4);
  *  - non-vacuous iteration on the real fixture: each round's winning
  *    pair differs from the previous round's (the previous winner's
  *    adjacencies were consumed by its rewrite), and the token stream
  *    strictly shrinks.
  */
class BpeTrainSpec extends SparkSpec {

  private def run(dir: String) =
    graft.operators.TextAnalysis.queries("text_bpe_train")(spark, dir)
      .orderBy(col("round"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("greedy non-overlapping merge: the A A A run") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_fix").toString
    Seq((1L, "a a a a a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = run(dir)
    // round 1: (a,a) counted naively 4×, greedy merges offsets 0 and 2
    // → [aa, aa, a]; round 2 tie-break (count 1 each) picks (aa, a) by
    // (wa, wb) ascending → [aa, aaa]; round 3 merges the rest.
    assert(rows(0) === ((1, "a a", 4L, 2L, 3L)))
    assert(rows(1) === ((2, "aa a", 1L, 1L, 2L)))
    assert(rows(2) === ((3, "aa aaa", 1L, 1L, 1L)))
  }

  test("fixture iteration is non-vacuous: winners change, stream shrinks") {
    val rows = run(sfDir)
    assert(rows.length === 3)
    val pairs = rows.map(_._2)
    assert(pairs.distinct.length === 3,
      s"each round must pick a fresh winner, got ${pairs.mkString(", ")}")
    val sizes = rows.map(_._5)
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b < a },
      s"token stream must strictly shrink per round: ${sizes.mkString(", ")}")
    rows.foreach { case (_, p, cnt, merges, _) =>
      assert(merges <= cnt, s"pair '$p': merged $merges > counted $cnt")
      assert(merges > 0, s"pair '$p': vacuous round")
    }
  }
}
