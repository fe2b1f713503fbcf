package graft

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The r17 ingest-path internals: the session schema cache and the
  * scale-adaptive scan spread in `Tables.load` (OPTIMIZATION_r17.md #1/#2).
  * Both are METADATA-level — neither may ever change what a query returns,
  * and the spread may only fire when the per-task-economics conditions
  * hold. The conf knobs let the tests force both sides of every branch on
  * sf-sized fixtures.
  */
class TablesLoadSpec extends SparkSpec {

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def ingestExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "REPARTITION_BY_NUM".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("spread fires only past the per-split byte bar, never changes rows") {
    val plain = withConfValue("spark.graft.scanSpread", "false") {
      Tables.load(spark, sfDir, "documents")
    }
    // sf0.001 documents is far below 3 MiB/split: default conf must not fire
    val deflt = Tables.load(spark, sfDir, "documents")
    assert(ingestExchanges(deflt) === 0,
      "sub-bar table must not spread under the default MinSplitBytes")
    // force the bar down: the same table must now spread to cores ...
    withConf("spark.graft.scanSpreadMinSplitBytes" -> "1") {
      val forced = Tables.load(spark, sfDir, "documents")
      assert(ingestExchanges(forced) === 1, "forced spread must add " +
        "exactly the one REPARTITION_BY_NUM ingest exchange")
      // ... with identical content (order-independent): the spread is a
      // partitioning change only
      def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val cols = df.columns.map(c => col(c).cast("string"))
        val r = df.select(count(lit(1)),
          expr("bit_xor(" +
            s"xxhash64(concat_ws('|', ${df.columns.mkString(", ")})))"))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      assert(sig(forced) === sig(plain), "spread changed the relation")
      // the kill switch wins over everything
      withConf("spark.graft.scanSpread" -> "false") {
        assert(ingestExchanges(Tables.load(spark, sfDir, "documents")) === 0,
          "scanSpread=false must disable the spread")
      }
    }
    // a typo'd conf fails naming its key (the repo's conf discipline)
    withConf("spark.graft.scanSpreadMinSplitBytes" -> "3mb") {
      val e = intercept[RuntimeException] {
        Tables.load(spark, sfDir, "documents")
      }
      assert(e.getMessage.contains("scanSpreadMinSplitBytes"), e.getMessage)
    }
  }

  private def withConfValue[T](k: String, v: String)(body: => T): T = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old match {
      case Some(x) => spark.conf.set(k, x)
      case None    => spark.conf.unset(k)
    }
  }

  test("schema cache serves the inferred schema and re-infers on rewrite") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("tables_load_spec").toString
    // write a fixture-named table, load twice: same schema object semantics
    Seq((1L, "a", "en", "s", 1L), (2L, "b", "de", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val first = Tables.load(spark, dir, "documents")
    assert(first.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(first.count() === 2)
    // REWRITE the path with a different schema: the (path, bytes, mtime)
    // key must miss and the new schema must be served — a stale cache
    // here would silently project ghost columns
    Seq((7L, "x", "fr", "s2", 9L, true))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "extra")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val second = Tables.load(spark, dir, "documents")
    assert(second.schema.fieldNames.contains("extra"),
      "rewritten path must re-infer, not serve the cached schema")
    assert(second.count() === 1)
  }
}
