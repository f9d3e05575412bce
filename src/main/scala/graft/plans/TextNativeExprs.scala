package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native (codegen'd) kernels for the dedup-family hot path.
  *
  * The Column-algebra formulations in graft.functions.TextFunctions are
  * correct and cross-checkable, but Spark evaluates higher-order functions
  * (transform/aggregate/zip_with) interpreted, one lambda invocation per
  * element with boxed arrays — measured ~26 s for MinHash over 5k docs at
  * sf0.1. These expressions do the same math in tight JVM loops inside
  * whole-stage codegen (same pattern as plans/UrlCanonExpression, which
  * bench justified at 10-40x).
  */
object TextNativeHelper {

  /** MinHash signature: per shingle ONE byte-scan hash (xxh64, Spark's seed
    * 42), then k cheap long-rehashes hash_i = xxh64(base, seed=i); output =
    * per-i minimum. */
  def minhash(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(base, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val tlBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }
  private def buf(len: Int): Array[Byte] = {
    var b = tlBuf.get()
    if (b.length < len) { b = new Array[Byte](Integer.highestOneBit(len) * 2); tlBuf.set(b) }
    b
  }

  /** Fused shingle+MinHash: k-token sliding windows hashed as
    * space-joined byte runs in a reusable thread-local buffer — the shingle
    * STRINGS are never materialized (the Column formulation allocates one
    * per window per doc). Hash identical to minhash() over
    * TextFunctions.shingles' "t0 t1 t2" strings. */
  def minhashShingled(tokens: ArrayData, numHashes: Int, shingle: Int): ArrayData = {
    import org.apache.spark.unsafe.Platform
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var start = 0
    while (start <= n - shingle) {
      var len = 0
      var j = 0
      var anyNull = false
      while (j < shingle) {
        if (tokens.isNullAt(start + j)) anyNull = true
        else len += tokens.getUTF8String(start + j).numBytes
        if (j > 0) len += 1
        j += 1
      }
      if (!anyNull) {
        val b = buf(len)
        var off = 0
        j = 0
        while (j < shingle) {
          if (j > 0) { b(off) = ' '.toByte; off += 1 }
          val s = tokens.getUTF8String(start + j)
          s.writeToMemory(b, Platform.BYTE_ARRAY_OFFSET + off)
          off += s.numBytes
          j += 1
        }
        val base = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, 42L)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashLong(base, h.toLong)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      start += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash — exactly TextFunctions.simhash64's formula (xxhash64
    * seed 42 votes, bit set iff vote sum positive), proven equal in
    * TextFunctionsSpec. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** minhash_native(tokens_or_shingles) -> array<long> of k per-hash minima. */
case class MinHashExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextNativeHelper.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNativeHelper.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_native"
}

object MinHashExpr {
  def minhashNative(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashExpr(GraftColumnBridge.expression(c), numHashes))
}

/** minhash_shingled(tokens) -> array<long>: fused k-token shingling +
  * MinHash, zero per-shingle allocation. */
case class MinHashShingledExpr(child: Expression, numHashes: Int, shingle: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextNativeHelper.minhashShingled(input.asInstanceOf[ArrayData], numHashes, shingle)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.TextNativeHelper.minhashShingled($c, $numHashes, $shingle)")
  override protected def withNewChildInternal(newChild: Expression): MinHashShingledExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_shingled"
}

object MinHashShingledExpr {
  def minhashShingled(c: Column, numHashes: Int, shingle: Int): Column =
    GraftColumnBridge.column(
      MinHashShingledExpr(GraftColumnBridge.expression(c), numHashes, shingle))
}

/** simhash64_native(tokens) -> long fingerprint. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    TextNativeHelper.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNativeHelper.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64_native"
}

object SimHash64Expr {
  def simhash64Native(c: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(c)))
}
