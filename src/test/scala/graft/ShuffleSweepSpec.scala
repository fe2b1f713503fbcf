package graft

import org.apache.spark.sql.functions._

/** Pins the semantic invariants of the two round-10 planning ops beyond
  * their DuckDB gates.
  */
class ShuffleSweepSpec extends SparkSpec {

  test("sample_shuffle_epochs: each epoch is a dense permutation and " +
      "epochs genuinely differ") {
    val rows = graft.operators.TextAnalysis
      .queries("sample_shuffle_epochs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0L, 1L))
    byEpoch.foreach { case (e, rs) =>
      val pos = rs.map(_._3).sorted
      assert(pos.toSeq === (0L until rs.length.toLong),
        s"epoch $e positions must be exactly 0..N-1")
    }
    val order0 = byEpoch(0L).sortBy(_._3).map(_._2).toSeq
    val order1 = byEpoch(1L).sortBy(_._3).map(_._2).toSeq
    assert(order0 !== order1,
      "the two epochs must shuffle into different orders")
    assert(order0.toSet === order1.toSet,
      "both epochs must cover the same documents")
  }

  test("quality_threshold_sweep: keep counts are monotone in the " +
      "threshold and agree with the production gate at 0.0") {
    val rows = graft.operators.TextAnalysis
      .queries("quality_threshold_sweep")(spark, sfDir)
      .orderBy(col("threshold"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 7)
    rows.zip(rows.tail).foreach { case ((t1, k1, f1), (t2, k2, f2)) =>
      assert(k1 >= k2, s"raising the threshold $t1→$t2 must not keep " +
        s"MORE docs ($k1 → $k2)")
      assert(f1 >= f2, "kept token budget must shrink with the threshold")
    }
    val atZero = rows.find(_._1 == 0.0).get._2
    val gateKeeps = graft.operators.TextAnalysis
      .queries("text_quality_classifier")(spark, sfDir)
      .filter(col("keep") && col("doc_id") >= 0) // sweep has no fixture
      .count()
    assert(atZero === gateKeeps,
      "the 0.0 sweep row must equal the production keep rule's count")
  }
}
