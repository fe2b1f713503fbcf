package graft

/** Pins the count-min-sketch guarantee for `text_heavy_hitters_cms`
  * beyond the DuckDB gate: a CMS NEVER underestimates (each probed cell
  * counts every occurrence of the token plus whatever collides into it),
  * and on a corpus with far more distinct tokens than the 256-bucket
  * width, collisions must actually occur — the overestimate column is
  * non-vacuous, not an always-zero decoration.
  */
class CmsSpec extends SparkSpec {

  test("CMS estimates dominate exact counts; collisions are real") {
    val rows = graft.operators.TextAnalysis
      .queries("text_heavy_hitters_cms")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length === 20, "exact top-20 heavy hitters")
    assert(rows.map(_._1).sorted.toSeq === (1 to 20),
      "ranks must be exactly 1..20")
    rows.foreach { case (rk, tok, exact, est, over) =>
      assert(est >= exact,
        s"rank $rk '$tok': CMS estimate $est underestimates exact $exact")
      assert(over === est - exact, s"rank $rk '$tok': overestimate column " +
        "must equal estimate − exact")
    }
  }

  test("collisions genuinely overestimate once vocabulary exceeds cells") {
    // the fixture vocabulary (~31 tokens) fits the 4×256 sketch without
    // loss, so the ≥ guarantee is exercised but never strict there; a
    // constructed 1500-token vocabulary forces every row of the sketch
    // to collide (1 − e^(−1500/256) ≈ 1 per row) and some singleton
    // winner to carry a strict overestimate. Deterministic: fixed data,
    // fixed md5 buckets.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cms_fix").toString
    val vocab = (0 until 1500).map { i =>
      s"${('a' + i / 676).toChar}${('a' + (i / 26) % 26).toChar}" +
        s"${('a' + i % 26).toChar}"
    }
    val text = (Seq.fill(50)("zzzz") ++ vocab).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis
      .queries("text_heavy_hitters_cms")(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.foreach { case (tok, exact, est, _) =>
      assert(est >= exact, s"'$tok': $est < $exact") }
    val zzz = rows.find(_._1 == "zzzz").get
    assert(zzz._2 === 50L, "the planted heavy hitter counts exactly")
    assert(rows.exists(_._4 > 0),
      "with 1500 tokens in 1024 cells some winner must strictly " +
        "overestimate")
  }
}
