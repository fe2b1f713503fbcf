package graft

import java.nio.file.Files
import graft.streaming.Sinks

/** Sink semantics: upsert latest-per-key, dim MERGE with deletes,
  * dynamic routing partitions, dim DDL ops.
  */
class SinksSpec extends SparkSpec {

  test("K5 upsert keeps the newest version per key and is idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    Sinks.upsert(spark, Seq((1L, "a", 1L), (2L, "b", 1L))
      .toDF("k", "v", "seq"), "k", "seq", dir)
    Sinks.upsert(spark, Seq((1L, "a2", 2L), (3L, "c", 2L))
      .toDF("k", "v", "seq"), "k", "seq", dir)
    // replay the same batch (micro-batch retry) — result must not change
    Sinks.upsert(spark, Seq((1L, "a2", 2L), (3L, "c", 2L))
      .toDF("k", "v", "seq"), "k", "seq", dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("K6 dim merge applies puts then deletes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dim").toString + "/d"
    Sinks.mergeDim(spark, Seq((1L, "x", 1L, "c"), (2L, "y", 1L, "c"))
      .toDF("k", "v", "seq", "op"), "k", "seq", "op", dir)
    Sinks.mergeDim(spark, Seq((1L, "x2", 2L, "u"), (2L, "y", 2L, "d"))
      .toDF("k", "v", "seq", "op"), "k", "seq", "op", dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "x2"))
  }

  test("K2 routed write partitions by sink_table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("route").toString + "/r"
    Sinks.writeRouted(Seq((1L, "dwd_page"), (2L, "dwd_err"))
      .toDF("id", "sink_table"), dir)
    val parts = new java.io.File(dir).list().filter(_.startsWith("sink_table="))
    assert(parts.toSet === Set("sink_table=dwd_page", "sink_table=dwd_err"))
  }

  test("K7 dim DDL: create / drop / update") {
    val base = Files.createTempDirectory("ddl").toString
    Sinks.applyDimDdl(spark, base, "dim_user", "c")
    assert(new java.io.File(base, "dim_user").exists())
    Sinks.applyDimDdl(spark, base, "dim_user", "u")
    assert(new java.io.File(base, "dim_user").exists())
    Sinks.applyDimDdl(spark, base, "dim_user", "d")
    assert(!new java.io.File(base, "dim_user").exists())
    intercept[IllegalArgumentException] {
      Sinks.applyDimDdl(spark, base, "dim_user", "zz")
    }
  }
}
