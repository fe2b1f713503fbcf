package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `tables` multi-table hyperplane-LSH
  * signatures of an embedding in ONE per-row pass —
  * `array("<t>:<bits sign chars>")`, exactly `Vectors.lshTables` /
  * `lshSignaturesAgg` output.
  *
  * Replaces the signature pass the WHOLE ANN/graph family rides
  * (`sim_lsh_ann`, `dedup_embedding_lsh`, every `knnCandidates`
  * consumer, the streaming graph tier): the aggregate form posexplodes
  * one row PER DIMENSION and shuffles the exploded relation into a
  * (tables × bits)-column HashAggregate — at 100 TB that exchange moves
  * dims× the corpus. This expression computes the same dot products
  * per row with no explode and NO EXCHANGE:
  *
  *   - the ±1 hyperplane matrix is a CONSTANT of (dims, bit, table)
  *     (`Vectors.mdSignConst`, the md5 derivation the DuckDB oracle
  *     reproduces) — materialized once per (dims, bits, tables) into a
  *     flat double array and cached process-wide;
  *   - each row copies its vector into a thread-local double buffer
  *     once (null elements contribute 0.0, matching `sum`'s null-skip),
  *     then runs tables × bits sequential dot products over it —
  *     accumulation order d = 0..n−1 is exactly the aggregate form's
  *     single-partition partial-sum order, so signs are bit-identical
  *     (VectorsSpec pins native ≡ aggregate ≡ column forms);
  *   - per-row vectors SIZE THEIR OWN sign matrix (the aggregate form
  *     probed one global width and silently dropped tail dims of any
  *     longer row; the oracle — `generate_series(1, len(embedding))`
  *     per row — always agreed with the per-row semantics this
  *     expression restores; fixtures are uniform-width so both read
  *     the same).
  */
case class LshSigs(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_sigs requires array<float|double>, got ${dt.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = child.foldable
  override def prettyName: String = "lsh_sigs"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    LshSigs.compute(input.asInstanceOf[ArrayData], isFloat, bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LshSigs.compute($c, $isFloat, $bits, $tables);")

  override protected def withNewChildInternal(newChild: Expression): LshSigs =
    copy(child = newChild)
}

object LshSigs {

  // flat [t][b][d] sign matrices keyed by (dims, bits, tables) — a
  // process-wide constant (few distinct widths ever appear in a run).
  // BOUNDED: ragged per-row vector widths are supported, so a
  // pathological corpus could present many distinct dims; past
  // MaxCachedMatrices entries new widths compute uncached (correctness
  // identical — mdSignConst is pure — only the amortization is lost),
  // capping executor memory at ≤ cap × tables·bits·dims doubles.
  private[plans] val MaxCachedMatrices = 64
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]

  private def buildSigns(dims: Int, bits: Int, tables: Int): Array[Double] = {
    val a = new Array[Double](tables * bits * dims)
    var i = 0
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < bits) {
        var d = 0
        while (d < dims) {
          a(i) = graft.functions.Vectors.mdSignConst(d, b, t)
          i += 1; d += 1
        }
        b += 1
      }
      t += 1
    }
    a
  }

  private def signs(dims: Int, bits: Int, tables: Int): Array[Double] = {
    val k = (dims, bits, tables)
    val cached = signCache.get(k)
    if (cached != null) return cached
    // at the cap, evict an arbitrary resident before inserting (not
    // compute-uncached-forever: a >64-distinct-width corpus would
    // otherwise rebuild the matrix md5-per-element on EVERY row for
    // widths past the first 64 — review r13 finding #3). Races at the
    // boundary can momentarily overshoot by a few entries; the bound
    // stays O(cap), which is all the memory cap needs.
    if (signCache.size >= MaxCachedMatrices) {
      val it = signCache.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    signCache.computeIfAbsent(k, _ => buildSigns(dims, bits, tables))
  }

  private final class Scratch {
    var x: Array[Double] = new Array[Double](1 << 8)
  }
  private val local = ThreadLocal.withInitial[Scratch](() => new Scratch)

  def compute(arr: ArrayData, isFloat: Boolean, bits: Int,
      tables: Int): ArrayData = {
    val n = arr.numElements()
    val sc = local.get()
    if (sc.x.length < n) sc.x = new Array[Double](Integer.highestOneBit(n) * 2)
    val x = sc.x
    var d = 0
    while (d < n) {
      x(d) =
        if (arr.isNullAt(d)) 0.0 // sum() skips nulls; 0 contributes alike
        else if (isFloat) arr.getFloat(d).toDouble
        else arr.getDouble(d)
      d += 1
    }
    val sg = signs(n, bits, tables)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val prefix = String.valueOf(t)
      val bytes = new Array[Byte](prefix.length + 1 + bits)
      var p = 0
      while (p < prefix.length) { bytes(p) = prefix.charAt(p).toByte; p += 1 }
      bytes(p) = ':'.toByte
      var b = 0
      while (b < bits) {
        var s = 0.0
        val base = (t * bits + b) * n
        var i = 0
        while (i < n) { s += x(i) * sg(base + i); i += 1 }
        bytes(prefix.length + 1 + b) = if (s >= 0) '1'.toByte else '0'.toByte
        b += 1
      }
      out(t) = UTF8String.fromBytes(bytes)
      t += 1
    }
    new GenericArrayData(out)
  }
}
