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

  /** Random-hyperplane (SimHash-style) LSH signature: `bits` sign bits, each
    * from a deterministic pseudo-random hyperplane derived from (bit, dim)
    * via a hash → ±1 component. Vectors with equal signatures are ANN
    * bucket candidates; bucket-join replaces the O(n²) cross join at scale.
    *
    * `table` offsets the hyperplane family so multiple independent hash
    * tables can be built (multi-table LSH: candidate if ANY table matches —
    * the standard recall lever).
    */
  def hyperplaneSignature(vec: Column, bits: Int, table: Int = 0): Column = {
    val bitCols = (0 until bits).map { b =>
      val s = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          // deterministic ±1 from (table, bit, dim): parity of an int mix
          val h = pmod(hash(i * lit(31) + lit(b * 7919 + table * 104729)), lit(2))
          x.cast("double") * (h.cast("double") * 2.0 - 1.0)
        }),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bitCols: _*)
  }

  /** Multi-table LSH signatures: `tables` independent `bits`-bit
    * signatures, each prefixed with its table id (so a bucket join on the
    * exploded (doc, signature) pairs never collides across tables).
    */
  def lshTables(vec: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      concat_ws(":", lit(t), hyperplaneSignature(vec, bits, t))): _*)

  /** Same signatures as `lshTables`, computed as ONE codegen'd
    * posexplode + (tables × bits) sum-aggregates pass instead of
    * interpreted array lambdas — the scalable form (map-side partial sums,
    * one shuffle on the id). Returns (idCol, sigs: Array[String]).
    */
  def lshSignaturesAgg(df: org.apache.spark.sql.DataFrame, idCol: String,
      vecCol: String, bits: Int, tables: Int): org.apache.spark.sql.DataFrame = {
    val expl = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
    val sums = (0 until tables).flatMap { t =>
      (0 until bits).map { b =>
        val sign = pmod(hash(col("dim") * lit(31) + lit(b * 7919 + t * 104729)),
          lit(2)).cast("double") * 2.0 - 1.0
        sum(col("x").cast("double") * sign).as(s"s_${t}_$b")
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
