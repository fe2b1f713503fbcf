package graft

/** One ARM of the paired A/B/A bench comparison (`Bench compare`): a
  * long-lived JVM that owns one SparkSession and runs single timed query
  * executions on demand, driven line-by-line over stdin.
  *
  * Protocol (stdout lines are prefixed `GRAFTBENCH` so Spark's stderr
  * chatter and any stray stdout logging can't be mistaken for results):
  *   controller → server: `<query name>\n`      run it once, timed
  *                        `exit\n`              stop the session and quit
  *   server → controller: `GRAFTBENCH READY`    after warmup
  *                        `GRAFTBENCH OK <name> <seconds>`
  *                        `GRAFTBENCH ERR <name> <message>`
  *
  * The controller launches TWO of these — one on the head classpath, one
  * with the base commit's compiled classes PREPENDED (classpath order
  * resolves every `graft.*` query class from the base build, while this
  * server class itself, absent from the base build, loads from head) —
  * and strictly serializes commands between them, so at any instant
  * exactly one arm is executing and both arms see the same ambient host
  * load. This class deliberately touches only the API surface that has
  * been stable across rounds (`SparkEntry.queries`, `Sessions.local`,
  * `Barrier.releaseAll`), so a head-compiled server drives a base-commit
  * query map without binary-compatibility risk.
  */
object BenchServer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    val out = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    // same untimed warmup as Bench.main: JIT + codegen + parquet footers
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .queryExecution.toRdd.count()
    out.println("GRAFTBENCH READY")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line = in.readLine()
    while (line != null && line.trim != "exit") {
      val name = line.trim
      if (name.nonEmpty) {
        if (!SparkEntry.queries.contains(name)) {
          out.println(s"GRAFTBENCH ERR $name unknown query")
        } else {
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
            val t = (System.nanoTime() - t0) / 1e9
            // release AFTER the timer, same lifecycle as Bench.once
            graft.core.Barrier.releaseAll(spark)
            out.println(f"GRAFTBENCH OK $name $t%.4f")
          } catch {
            case e: Throwable =>
              graft.core.Barrier.releaseAll(spark)
              out.println(("GRAFTBENCH ERR " + name + " " +
                String.valueOf(e.getMessage)).replaceAll("[\\r\\n]", " "))
          }
        }
      }
      line = in.readLine()
    }
    spark.stop()
  }
}
