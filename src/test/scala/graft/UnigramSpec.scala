package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Unigram-LM tokenizer family: Viterbi-vs-greedy divergence (the reason
  * the family exists — likelihood-optimal segmentation beats longest
  * match), model-based parity of the distributed DP against a naive
  * Scala Viterbi with the same integer qlog weights and tie rules, and
  * the coverage/reconstruction invariants on the real pipeline.
  */
class UnigramSpec extends SparkSpec {

  // naive mirror of the qlog device (TextAnalysis.qlogSql)
  private def qlog(x: Long): Long = {
    val b = 63 - java.lang.Long.numberOfLeadingZeros(x)
    16L * b + (x - (1L << b)) * 16L / (1L << b)
  }

  // hand-scored model DF: (piece, plen, c, wq) with wq = qlog(c) - qlog(T)
  private def scored(model: Seq[(String, Long)]) = {
    import spark.implicits._
    val t = model.map(_._2).sum
    model.map { case (p, c) => (p, p.length.toLong, c, qlog(c) - qlog(t)) }
      .toDF("piece", "plen", "c", "wq")
  }

  private def wordsDf(words: Seq[(String, Long)]) = {
    import spark.implicits._
    words.map { case (w, f) => (w, f, w.length.toLong) }
      .toDF("word", "wf", "len")
  }

  test("Viterbi beats greedy longest-match where likelihood says so") {
    // greedy on 'abcd' takes the longest piece at the cursor: abc|d.
    // Viterbi sees that two HIGH-count pieces ab|cd carry more
    // likelihood than the rare abc plus the rare d.
    val model = Seq("ab" -> 100L, "cd" -> 100L, "abc" -> 2L,
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    val vit = TextAnalysis.unigramViterbi(
        wordsDf(Seq("abcd" -> 1L)), scored(model))
      .filter(col("pos") === col("len"))
      .select(col("seg")).collect().map(_.getString(0))
    assert(vit.toSeq == Seq("ab|cd"))
    // the greedy (WordPiece MaxMatch) walk over the SAME inventory
    val greedy = TextAnalysis.wordpieceLoop(wordsDf(Seq("abcd" -> 1L)),
        scored(model).select(col("piece"), col("plen")))
      .select(col("seg")).collect().map(_.getString(0))
    assert(greedy.toSeq == Seq("abc|d")) // divergence is real
  }

  /** Naive Viterbi with the distributed loop's exact tie rules:
    * maximize sc, then fewer pieces, then lexicographically smallest
    * seg. Returns (sc, np, seg) per word (None = len over horizon). */
  private def naiveViterbi(word: String, model: Map[String, Long])
      : Option[(Long, Long, String)] = {
    if (word.length > TextAnalysis.UnigramMaxPos) return None
    val t = model.values.sum
    val w = model.map { case (p, c) => p -> (qlog(c) - qlog(t)) }
    // best(pos): Option[(sc, np, seg)], pos = chars consumed
    val best = Array.fill[Option[(Long, Long, String)]](word.length + 1)(None)
    best(0) = Some((0L, 0L, ""))
    for (pos <- 1 to word.length) {
      val cands = for {
        plen <- 1 to 6
        start = pos - plen if start >= 0
        prev <- best(start).toSeq
        piece = word.substring(start, pos) if w.contains(piece)
      } yield {
        val seg = if (prev._3.isEmpty) piece else prev._3 + "|" + piece
        (prev._1 + w(piece), prev._2 + 1, seg)
      }
      if (cands.nonEmpty)
        best(pos) = Some(cands.minBy { case (sc, np, seg) => (-sc, np, seg) })
    }
    best(word.length)
  }

  test("distributed DP equals the naive Viterbi on a random corpus") {
    val rnd = new scala.util.Random(112211)
    // small alphabet → overlapping candidate pieces and real ties
    val words = (1 to 60).map { _ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    }.distinct.map(w => w -> (1L + rnd.nextInt(5)))
    val pieces = words.flatMap { case (w, _) =>
      for (i <- w.indices; l <- 1 to 6 if i + l <= w.length)
        yield w.substring(i, i + l)
    }
    val model = pieces.groupBy(identity).view
      .mapValues(g => g.size.toLong * (1 + rnd.nextInt(4))).toMap
      // thin out long pieces so segmentation choices are non-trivial,
      // but keep every single char (the coverage floor)
      .filter { case (p, c) => p.length == 1 || c % 3 != 0 }
    val got = TextAnalysis.unigramViterbi(wordsDf(words),
        scored(model.toSeq.sorted))
      .filter(col("pos") === col("len"))
      .select(col("word"), col("sc"), col("np"), col("seg"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    words.foreach { case (w, _) =>
      assert(got.get(w) == naiveViterbi(w, model),
        s"word $w: got ${got.get(w)}, naive ${naiveViterbi(w, model)}")
    }
  }

  test("trained segmentation covers and reconstructs every word") {
    val seg = SparkEntry.queries("text_unigram_segment")(spark, sfDir)
    val rows = seg.select(col("word"), col("seg"), col("covered"),
      col("n_pieces")).collect()
    val nWords = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.Text.tokenize(col("text"))).as("w"))
      .distinct().count()
    assert(rows.length.toLong == nWords) // every distinct word, exactly once
    rows.foreach { r =>
      val (w, s) = (r.getString(0), r.getString(1))
      assert(s.split("\\|").mkString == w, s"$w reconstructs")
      assert(r.getBoolean(2), s"$w covered") // fixture words are short
      assert(r.getLong(3) == s.split("\\|").length.toLong)
    }
  }

  test("train output: single-char floor present, counts rank the vocab") {
    val m = SparkEntry.queries("text_unigram_train")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // every observed character survives every prune round
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(regexp_replace(lower(col("text")),
        "[^a-z0-9]", ""), "")).as("ch"))
      .filter(col("ch") =!= "").distinct().collect().map(_.getString(0))
    chars.foreach(c => assert(m.contains(c), s"char $c floored in"))
    assert(m.size <= 256 + chars.length)
    assert(m.values.forall(_ >= 1L))
  }
}
