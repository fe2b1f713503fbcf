package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The boundary-adversarial j3 fixture (r15): the banded interval join
  * verifies with exact predicates, so its only failure class is CANDIDATE
  * COVERAGE — a true pair whose click bucket falls outside the purchase's
  * exploded bucket range. The risk sits exactly at the ±(15 min, 15 s)
  * window edges and at bucket boundaries of the 915 s band, so the fixture
  * plants pairs AT those edges (offset 0, ±1 µs around both window ends,
  * and purchases whose admissible range starts exactly on a bucket
  * boundary), plus a seeded random cloud. Shared by the batch
  * banded==naive pin (OperatorsSpec) and the stream==batch pin with every
  * boundary pair split across micro-batch boundaries (StreamingSpec,
  * VERDICT r15 #3).
  */
object J3Fixture {
  val W = 915000000L // microseconds: the 15 min + 15 s band span
  val base = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  /** Click offsets relative to pay: the exact −15 s and +15 min window
    * edges, ±1 µs around each, and offset 0/±1 µs. In-window offsets lie
    * in [−900000000, 15000000]; the overshoots must NOT match.
    */
  val edges: Seq[Long] = Seq(-900000001L, -900000000L, -899999999L,
    -1L, 0L, 1L, 14999999L, 15000000L, 15000001L)

  /** (event_id, epoch_micros, user_id, event_type). Edge-pair events take
    * ids 0 until 2*edges.size — pay 2i, click 2i+1 — followed by the
    * random cloud. Default cloud size matches the r15 batch fixture.
    */
  def rows(cloudUsers: Int = 40,
      perUser: Int = 50): Seq[(Long, Long, Long, String)] = {
    val rnd = new scala.util.Random(1915L)
    val buf =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    var id = 0L
    def add(user: Long, us: Long, tpe: String): Unit = {
      buf += ((id, us, user, tpe)); id += 1
    }
    // boundary pairs: pay_ts placed so its admissible range starts
    // exactly on a multiple of W (pay − 15 s on a bucket boundary)
    edges.zipWithIndex.foreach { case (off, i) =>
      val u = 100L + i
      val pay = base + (i + 3) * W + 15000000L
      add(u, pay, "purchase")
      add(u, pay - off, "click") // click_ts = pay − off
    }
    (0 until cloudUsers).foreach { u =>
      (0 until perUser).foreach { _ =>
        add(u.toLong, base + math.abs(rnd.nextLong() % (20L * W)),
          if (rnd.nextBoolean()) "purchase" else "click")
      }
    }
    buf.toSeq
  }

  /** The fixture as a full-schema events table (ts as timestamp_ntz,
    * matching the driver fixtures), ready to write as `events.parquet`.
    */
  def eventsDf(spark: SparkSession,
      rs: Seq[(Long, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rs.map { case (eid, us, uid, tpe) =>
      (eid, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
        ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC),
        uid, tpe, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }
}
