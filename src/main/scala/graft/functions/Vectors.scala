package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * native higher-order functions (`zip_with`/`aggregate`) — codegen-friendly,
  * no UDF serialization, distributes cleanly.
  *
  * Accumulation is in double precision (floats widened before multiply) so
  * results match DuckDB's `list_cosine_similarity`/`list_dot_product`
  * oracle semantics.
  */
object Vectors {

  /** Σ aᵢ·bᵢ in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** cos(a,b) = a·b / (‖a‖‖b‖); 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Deterministic ±1 hyperplane component for (dim, bit, table), derived
    * from md5 — NOT Spark's Murmur3 `hash` — so a SQL oracle (DuckDB md5)
    * can reproduce the hyperplanes exactly: +1 when the first hex nibble
    * of md5("<dim>_<bit*7919+table*104729>") is 0-7, else -1 (balanced).
    */
  private[graft] def mdSign(dim: Column, bit: Int, table: Int): Column = {
    val key = concat_ws("_", dim.cast("string"),
      lit(bit * 7919 + table * 104729).cast("string"))
    when(substring(md5(key), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1.0))
      .otherwise(lit(-1.0))
  }

  /** Same ±1 as `mdSign`, evaluated once on the driver: the hyperplane
    * matrix is a CONSTANT of (dim, bit, table) — computing md5 per corpus
    * row ran the signature pass 3× slower (24 md5 calls per exploded
    * element, measured at sf0.1). A literal sign row + `element_at` lookup
    * keeps the per-row work at one codegen'd array index while staying
    * bit-identical to the md5-derived oracle.
    */
  private[graft] def mdSignConst(dim: Int, bit: Int, table: Int): Double = {
    val key = s"${dim}_${bit * 7919 + table * 104729}"
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** Literal sign vector for (bit, table) over dims [0, nDims). */
  private[graft] def signRow(nDims: Int, bit: Int, table: Int): Column =
    array((0 until nDims).map(d => lit(mdSignConst(d, bit, table))): _*)

  /** Random-hyperplane (SimHash-style) LSH signature: `bits` sign bits, each
    * from a deterministic pseudo-random hyperplane derived from (bit, dim)
    * via md5 → ±1 component (`mdSign`, oracle-reproducible). Vectors with
    * equal signatures are ANN bucket candidates; bucket-join replaces the
    * O(n²) cross join at scale.
    *
    * `table` offsets the hyperplane family so multiple independent hash
    * tables can be built (multi-table LSH: candidate if ANY table matches —
    * the standard recall lever).
    */
  def hyperplaneSignature(vec: Column, bits: Int, table: Int = 0): Column = {
    val bitCols = (0 until bits).map { b =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * mdSign(i, b, table)),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bitCols: _*)
  }

  /** Data-derived hyperplane-signature width: the smallest b in
    * [minBits, maxBits] with n ≤ occupancy·2^b, i.e. the width that holds
    * EXPECTED per-table bucket occupancy (n/2^b) at or under `occupancy`
    * as the corpus grows — candidate volume in a bucket self-join is
    * Σ occupancy² per bucket, so keeping occupancy flat keeps the join
    * linear in n. Integer search, no floating log: both engines (and the
    * DuckDB oracle's generate_series twin) agree exactly at every n.
    * minBits (6) is the fixture width every oracle pins — at the
    * sf0.001/sf0.01 fixtures (n=500) the derivation lands there, so the
    * oracle gate IS the derived gate; a 64× corpus (n=32000) derives 12
    * with no knob. maxBits caps the bucket count at 2^24 per table —
    * beyond that occupancy growth is the recall lever, not a scan risk.
    */
  def occupancyBits(n: Long, occupancy: Long = 8L, minBits: Int = 6,
      maxBits: Int = 24): Int = {
    var b = minBits
    while (b < maxBits && n > occupancy * (1L << b)) b += 1
    b
  }

  /** Multi-table LSH signatures: `tables` independent `bits`-bit
    * signatures, each prefixed with its table id (so a bucket join on the
    * exploded (doc, signature) pairs never collides across tables).
    */
  def lshTables(vec: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      concat_ws(":", lit(t), hyperplaneSignature(vec, bits, t))): _*)

  /** Same signatures as `lshTables`, as ONE native per-row walk
    * (plans/LshSigs.scala, r12): no explode, NO EXCHANGE — the previous
    * aggregate form posexploded one row per dimension and shuffled the
    * exploded relation into a (tables × bits)-column HashAggregate,
    * which at 100 TB moves dims× the corpus; it is kept below as
    * [[lshSignaturesAggSpec]], bit-identity pinned in VectorsSpec.
    * Rows with null or empty vectors are dropped, exactly as the
    * explode form dropped them. Returns (idCol, sigs: Array[String]).
    * `nDims` is accepted for signature compatibility and ignored: the
    * native walk sizes the sign matrix to each row's own length (which
    * is also what the DuckDB oracle does).
    */
  def lshSignaturesAgg(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, bits: Int, tables: Int,
      nDims: Int = -1): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(col(idCol), ColumnBridge.column(graft.plans.LshSigs(
        ColumnBridge.expression(col(vecCol)), bits, tables)).as("sigs"))
  }

  /** The aggregate EXECUTABLE SPEC of [[lshSignaturesAgg]] — posexplode
    * + (tables × bits) sum-aggregates (map-side partial sums, one
    * shuffle on the id). Kept (not in any query path) so the parity
    * test pins the native walk against the exact accumulation the
    * oracle mirrors.
    */
  private[graft] def lshSignaturesAggSpec(df: org.apache.spark.sql.DataFrame,
      idCol: String, vecCol: String, bits: Int, tables: Int,
      nDims: Int = -1): org.apache.spark.sql.DataFrame = {
    // nDims <= 0 → infer from the data (one O(1) limit-1 probe job): a
    // sign matrix narrower than the vectors would silently drop the tail
    // dims from every signature and diverge from hyperplaneSignature/the
    // oracle. Empty input or null first vector → dims 1; the aggregate
    // emits no rows for those inputs anyway, the literal just has to be
    // a valid array.
    val dims = if (nDims > 0) nDims
      else df.select(size(col(vecCol)).as("n"))
        .filter(col("n") > 0).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(1)
    val expl = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
    val sums = (0 until tables).flatMap { t =>
      (0 until bits).map { b =>
        // constant sign matrix as a literal row (mdSignConst == mdSign):
        // one codegen'd array index per element, no per-row md5
        sum(col("x").cast("double") *
          element_at(signRow(dims, b, t), col("dim") + 1)).as(s"s_${t}_$b")
      }
    }
    val agg = expl.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val sigCols = (0 until tables).map { t =>
      val bitStr = (0 until bits).map(b =>
        when(col(s"s_${t}_$b") >= 0, lit("1")).otherwise(lit("0")))
      concat_ws(":", lit(t), concat(bitStr: _*))
    }
    agg.select(col(idCol), array(sigCols: _*).as("sigs"))
  }
}
