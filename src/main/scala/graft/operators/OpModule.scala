package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** One module per operator family. Each module contributes named queries
  * (driver contract: `(SparkSession, sfDir) => DataFrame`) plus matching
  * DuckDB oracle SQL; `SparkEntry` concatenates all modules.
  *
  * Output discipline (so the driver's hash compare is deterministic):
  *  - no raw timestamps in outputs — always `date_format(..)` strings
  *  - no floating-point *aggregation* — cast to decimal(18,2) before sum
  *  - no DECIMAL in *outputs* — the driver's hasher does not normalize
  *    decimals; keep decimal math internal and cast money/sum columns to
  *    string at the output boundary (Spark cast("string") ≡ DuckDB
  *    CAST(x AS VARCHAR) for DECIMAL — both print `123.45`)
  *  - every computed column aliased identically in Spark and oracle SQL.
  *  - integer columns: normalize BOTH sides to BIGINT — `lit(x.toLong)`
  *    / `.cast("long")` in Spark paired with `CAST(x AS BIGINT)` in the
  *    oracle. Observed driver behavior (r12 evidence): int32-vs-int64
  *    width differences hash EQUAL (24 rank-column queries were green
  *    with Spark int32 against DuckDB BIGINT), but an integer that
  *    escapes as DuckDB HUGEINT/DECIMAL (any uncast `sum()` arithmetic
  *    — sum(BIGINT) is HUGEINT, and HUGEINT survives `//`) breaks the
  *    hash even when values agree — that, not win_len's width, is what
  *    failed text_dup_profile in r12. The BIGINT-both-sides discipline
  *    makes the question moot, and tools/localcheck.py enforces strict
  *    arrow-schema dtype parity so ANY divergence fails pre-flight.
  */
trait OpModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracles: Map[String, String]
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact epoch microseconds (≡ DuckDB epoch_us) for a timestamp column
    * of EITHER flavor. Parquet fixtures surface `ts` as TIMESTAMP_LTZ via
    * the nanos-long conversion but as TIMESTAMP_NTZ when a file carries a
    * native isAdjustedToUTC=false timestamp, and `unix_micros` rejects
    * NTZ outright. The session timezone is pinned to UTC
    * (core/Sessions.scala), so the NTZ→LTZ cast is epoch-identity.
    */
  protected def epochMicros(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.unix_micros(c.cast("timestamp_ltz"))
}
