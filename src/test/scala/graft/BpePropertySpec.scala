package graft

import org.apache.spark.sql.functions._

/** Model-based check of the distributed BPE train loop: a 15-line naive
  * Scala implementation of the published algorithm (count adjacent pairs
  * with overlaps, pick (count DESC, pair ASC), greedy left-to-right
  * non-overlapping rewrite, repeat) run on a seeded random corpus must
  * produce exactly the same per-round winners, counts and final token
  * stream as the windowed/gaps-and-islands Spark implementation. This is
  * the strongest guard on the run-parity selection algebra — any
  * disagreement between "greedy by parity within candidate islands" and
  * "greedy by left-to-right scan" shows up here before it could matter.
  */
class BpePropertySpec extends SparkSpec {

  private def naiveRound(docs: Map[Long, Vector[String]])
      : ((String, String, Long, Long), Map[Long, Vector[String]]) = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.values.filter(_.length >= 2).foreach { t =>
      t.zip(t.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
    }
    val (wa, wb) = counts.keys.minBy { case (a, b) =>
      (-counts((a, b)), a, b)
    }
    val cnt = counts((wa, wb))
    var merges = 0L
    val next = docs.map { case (id, t) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == wa && t(i + 1) == wb) {
          out += (wa + wb); merges += 1; i += 2
        } else { out += t(i); i += 1 }
      }
      id -> out.result()
    }
    ((wa, wb, cnt, merges), next)
  }

  test("3 rounds on a random seeded corpus equal the naive algorithm") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242)
    // small alphabet → dense pair collisions, A==A runs, ties; varying
    // doc lengths incl. empty and single-token docs
    val alphabet = Vector("a", "b", "c", "ab", "ba")
    val corpus = (1L to 40L).map { id =>
      val n = rnd.nextInt(30)
      id -> Vector.fill(n)(alphabet(rnd.nextInt(alphabet.size)))
    }.toMap
    val dir = java.nio.file.Files.createTempDirectory("bpe_prop").toString
    corpus.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // naive model: 3 rounds, tracking the stream size after each
    var model = corpus
    val expected = (1 to 3).map { _ =>
      val (row, next) = naiveRound(model); model = next
      (row, model.values.map(_.size.toLong).sum)
    }

    val got = graft.operators.TextAnalysis
      .queries("text_bpe_train")(spark, dir)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    expected.zip(got).zipWithIndex.foreach {
      case ((((wa, wb, cnt, merges), sizeAfter),
          (pair, gcnt, gmerges, after)), i) =>
        assert(pair === s"$wa $wb", s"round ${i + 1} winner diverged")
        assert(gcnt === cnt, s"round ${i + 1} count diverged")
        assert(gmerges === merges, s"round ${i + 1} merge count diverged")
        assert(after === sizeAfter, s"round ${i + 1} stream size diverged")
    }
    // the full final token stream, doc by doc, position order
    val streamGot = graft.operators.TextAnalysis
      .queries("text_bpe_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    corpus.keys.foreach { id =>
      assert(streamGot(id) === model(id).size.toLong,
        s"doc $id final token count diverged from the naive model")
    }
  }

  test("pairless corpus: tokens pass through unmerged, no report rows") {
    // ADVICE r10: every doc has < 2 tokens, so round 1 has ZERO adjacent
    // pairs and the winner relation is empty. Pre-guard, the rewrite's
    // cross join annihilated the whole token stream (tokens_bpe = 0
    // everywhere) — and the DuckDB oracle degraded identically, so only
    // a model-based spec can pin the pass-through.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe_empty").toString
    Seq((1L, "solo"), (2L, ""), (3L, "one"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val train = graft.operators.TextAnalysis
      .queries("text_bpe_train")(spark, dir).collect()
    assert(train.isEmpty, "a pairless corpus must emit no merge rows")
    val applied = graft.operators.TextAnalysis
      .queries("text_bpe_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(applied === Map(1L -> 1L, 2L -> 0L, 3L -> 1L),
      "tokens must pass through unmerged when no pair exists")
  }
}
