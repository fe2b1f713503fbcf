package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates the soak's DWS window stage to find where its wall time goes
  * (r15: dws_page measured 74 s for 4 tiny triggers while the heavier
  * dws_kw took 23 s). Re-runs the exact dws_page job from an existing
  * soak work dir with fresh checkpoint/store and prints the engine's
  * per-trigger durationMs breakdown.
  * Usage: runMain graft.tools.DwsDiag <soakWorkDir>
  */
object DwsDiag {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse {
      // listFiles() is null on an unreadable dir, and maxBy throws on an
      // empty filter — both would crash an ad-hoc diagnostic unhelpfully
      val cands = Option(new java.io.File("/tmp").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.getName.startsWith("soak_scale"))
      require(cands.nonEmpty,
        "no /tmp/soak_scale* work dir found; pass one explicitly")
      cands.maxBy(_.lastModified()).getPath
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val factDir = s"$work/dwd/page/batch_*"
    val schema = spark.read.parquet(factDir).schema
    val tmp = java.nio.file.Files.createTempDirectory("dwsdiag").toString
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(factDir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("cur_date"),
        pmod(col("k"), lit(3L)).as("ch"))
      .agg(count(lit(1)).as("pv"), sum(col("k")).as("k_sum"))
      .withColumn("__k", concat(col("cur_date"), lit("|"), col("ch")))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val tb = System.nanoTime()
        val mode = sys.env.getOrElse("DWSDIAG_MODE", "plain")
        val src = if (mode == "barrier") {
          import graft.core.Barrier.BarrierOps
          val b = batch.toDF().withColumn("__seq", lit(id)).barrier()
          println(f"[dwsdiag] batch $id materialize ${(System.nanoTime() - tb) / 1e9}%.2fs")
          b
        } else batch.toDF().withColumn("__seq", lit(id))
        graft.streaming.Sinks.upsert(spark, src, "__k", "__seq", s"$tmp/store")
        if (mode == "barrier") graft.core.Barrier.releaseAll(spark)
        println(f"[dwsdiag] batch $id foreachBatch body ${(System.nanoTime() - tb) / 1e9}%.2fs")
        ()
      }
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    println(f"[dwsdiag] total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    q.recentProgress.foreach { p =>
      println(s"[dwsdiag] batch ${p.batchId} durationMs=${p.durationMs} " +
        s"rows=${p.numInputRows} state=${p.stateOperators.toSeq.map(s =>
          s"commit=${s.commitTimeMs}ms mem=${s.memoryUsedBytes}")}")
    }
    spark.stop()
  }
}
