package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{Jobs, Sinks}

/** Whole-graph streaming soak: splitter → DWD facts → DWS windows →
  * bucketed serving stores as one chained multi-micro-batch run
  * (Jobs.runSoak), with every final store equal to the batch composition
  * of the same transforms. Closes the "each piece streams, the whole graph
  * never has" residual from round 2–4.
  */
class SoakSpec extends SparkSpec {

  test("chained streaming DAG final state equals the batch composition") {
    val work = Files.createTempDirectory("soak").toString
    Jobs.runSoak(spark, sfDir, work, srcFiles = 4)

    // stage 1 streamed DWD facts ≡ batch splitter outputs
    val batchSplits = graft.operators.LogSplit
      .splits(graft.core.Tables.load(spark, sfDir, "events"), Seq("ts"))
    Seq("page", "start", "err", "display", "action").foreach { name =>
      val streamed = spark.read.parquet(s"$work/dwd/$name")
      val batch = batchSplits(name)
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        s"streamed DWD fact $name differs from batch split")
    }

    // DWS page-view store ≡ batch aggregate over the batch splitter
    val pageTwin = batchSplits("page")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("cur_date"),
        pmod(col("k"), lit(3L)).as("ch"))
      .agg(count(lit(1)).as("pv"), sum(col("k")).as("k_sum"))
    val pageGot = Sinks.readStore(spark, s"$work/store_page")
      .select("cur_date", "ch", "pv", "k_sum")
    assert(pageGot.exceptAll(pageTwin).count() === 0 &&
      pageTwin.exceptAll(pageGot).count() === 0,
      "page DWS store differs from batch twin")
    assert(pageGot.count() > 0)

    // DWS error store ≡ batch aggregate
    val errTwin = batchSplits("err")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("cur_date"))
      .agg(count(lit(1)).as("err_ct"))
    val errGot = Sinks.readStore(spark, s"$work/store_err")
      .select("cur_date", "err_ct")
    assert(errGot.exceptAll(errTwin).count() === 0 &&
      errTwin.exceptAll(errGot).count() === 0,
      "err DWS store differs from batch twin")

    // the run was genuinely multi-micro-batch at every stage: the commit
    // log records one entry per micro-batch
    def commits(chk: String): Int =
      new java.io.File(s"$chk/commits").list().count(!_.startsWith("."))
    assert(commits(s"$work/_chk_dwd") >= 4, "splitter ran >=4 micro-batches")
    assert(commits(s"$work/_chk_page") >= 2, "page DWS ran >=2 micro-batches")
    assert(commits(s"$work/_chk_err") >= 2, "err DWS ran >=2 micro-batches")
  }
}
