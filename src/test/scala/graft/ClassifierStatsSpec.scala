package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The native classifier_stats expression must be value-identical to the
  * HOF/builtin form it replaced (withClassifierScoreHof is kept in main
  * as the executable specification): every dependent oracle and the
  * streaming gate parity proofs rest on this equivalence.
  */
class ClassifierStatsSpec extends SparkSpec {

  private def cols(df: org.apache.spark.sql.DataFrame) =
    df.select(col("text"), col("n_feats"), col("score"), col("keep"))

  private def assertSame(docs: org.apache.spark.sql.DataFrame): Unit = {
    val a = cols(TextAnalysis.withClassifierScore(docs))
    val b = cols(TextAnalysis.withClassifierScoreHof(docs))
    val diff = a.exceptAll(b).unionByName(b.exceptAll(a)).collect()
    assert(diff.isEmpty, s"drift on: ${diff.take(5).mkString("; ")}")
  }

  test("bit-identical to the HOF form on the fixture corpus") {
    assertSame(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")))
  }

  test("bit-identical on crafted edges") {
    import spark.implicits._
    assertSame(Seq(
      "",                      // no token: n_feats 0, score null, keep false
      "!!! ...",               // punct-only: same
      "one",                   // single token: unigram only, no bigram
      "one two",               // one bigram
      "The THE the",           // case folding into equal features
      "a1b 2c3 4",             // digit/letter mixed tokens
      "word-with-dashes and_underscores keep.splitting",
      "это кириллица here",    // non-ASCII separates tokens
      "x " * 2000 + "y",       // long doc: buffer reuse across many tokens
      "supercalifragilisticexpialidocious antidisestablishmentarianism")
      .toDF("text"))
  }

  test("bit-identical on a seeded random unicode fuzz corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(882288)
    val alphabet = ("abz09" + " \t\n" + ".,-_" + "яз中" + "K" + "𝄞")
      .toCharArray
    def randStr(): String = {
      val n = rnd.nextInt(50)
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = alphabet(rnd.nextInt(alphabet.length))
        if (Character.isHighSurrogate(c)) { sb.append("𝄞"); () }
        else if (!Character.isLowSurrogate(c)) { sb.append(c); () }
        i += 1
      }
      sb.toString
    }
    assertSame((1 to 400).map(_ => randStr()).toDF("text"))
  }

  test("the walk evaluates once per row in the classifier query shape") {
    val q = SparkEntry.queries("text_quality_classifier")(spark, sfDir)
    val plan = q.queryExecution.optimizedPlan.toString
    val hits = "classifier_stats".r.findAllIn(plan).length
    assert(hits == 1, s"classifier_stats appears $hits times in:\n$plan")
  }
}
