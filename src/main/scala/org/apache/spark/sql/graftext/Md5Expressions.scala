package org.apache.spark.sql.graftext

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the engine-portable (oracle-replayable)
  * hash expressions. md5 is the one hash family every engine computes
  * identically, so constructions built on it can be verified
  * hash-for-hash by an external SQL engine; these expressions exist to
  * make that affordable (one digest per element, tight loops) instead
  * of k interpreted md5 calls per element.
  */
private[graftext] object Md5Support {
  private val local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  def digest(u: UTF8String): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.digest(u.getBytes)
  }
  /** md5 of elements [start, end) joined with a single space — the
    * digest of `array_join(slice(...), " ")` WITHOUT materializing the
    * joined string: token bytes stream straight into the digest, nulls
    * skipped exactly as array_join skips them (no dangling space). */
  def digestWindow(arr: ArrayData, start: Int, end: Int): Array[Byte] = {
    val md = local.get()
    md.reset()
    var first = true
    var i = start
    while (i < end) {
      if (!arr.isNullAt(i)) {
        if (!first) md.update(' '.toByte)
        md.update(arr.getUTF8String(i).getBytes)
        first = false
      }
      i += 1
    }
    md.digest()
  }
  /** Unsigned big-endian value of 8 bytes starting at `off`, shifted to
    * the top 60 bits — numerically equal to parsing hex chars
    * [2·off+1 .. 2·off+15] of the digest's hex rendering (what
    * `('0x' || substr(md5(x), 2·off+1, 15))::BIGINT` yields in SQL). */
  def hex60(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 56-bit variant (14 hex chars): small enough that a + j·b stays
    * inside a signed 64-bit integer for j ≤ 127 — DuckDB raises on
    * BIGINT overflow, so the double-hashing arithmetic must not wrap. */
  def hex56(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v >>> 8
  }
}

/** Per-row md5-based MinHash signature over a shingle array:
  * signature[j] = min over shingles g of (a(g) + j·b(g)), where a/b are
  * the 56-bit halves of md5(g) (hex chars 1-14 and 17-30 — 56 bits so
  * the sum cannot overflow a signed 64-bit int for any j ≤ 127). One
  * digest per shingle; the k hashes are Carter-Wegman double-hashing —
  * and the whole construction is replayable in portable SQL.
  */
case class Md5MinHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // j ranges over [0, k); a + j·b with 56-bit a,b stays inside a signed
  // 64-bit integer only for j ≤ 127 — beyond that the sum silently
  // wraps and diverges from any overflow-checking engine's replay.
  require(k >= 1 && k <= 128, s"md5_minhash k must be in [1, 128], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash"
  // an EMPTY shingle array yields null even when the child can't
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GraftKernels.md5MinHash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftext.GraftKernels.md5MinHash($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Md5MinHash =
    copy(child = newChild)
}

/** Per-element 60-bit md5 hashes of a string array: element i →
  * hex60(md5(arr[i])) (hex chars 1-15), i.e. the same value SQL gets
  * from `('0x' || substr(md5(x), 1, 15))::BIGINT`. Null elements are
  * DROPPED (the output array is shorter than the input and keeps
  * containsNull = false) — fine for the order-insensitive consumers
  * here (simhash bit counts, min-folds), but positions do NOT line up
  * with the input when nulls are present.
  */
case class Md5Hashes60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_hashes60"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.md5Hashes60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.md5Hashes60($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hashes60 =
    copy(child = newChild)
}

/** 60-bit md5 hash of every w-element sliding window of a token array,
  * joined with a single space — hash-for-hash equal to the column form
  * `transform(sequence(1, greatest(size(t) − w + 1, 1)),
  *            i => md5Hash60(array_join(slice(t, i, w), " ")))`
  * including the boundary behavior (an input shorter than w yields ONE
  * clipped window) and array_join's null-skipping. The column form
  * digests k interpreted expression calls and a joined-string
  * allocation per window; this kernel streams each window's token
  * bytes straight into one MessageDigest — no joined string, no
  * per-window lambda frames. It is the shared hot step of the
  * duplicate-span family (detect/remove) and Winnowing fingerprints.
  */
case class Md5WindowHashes60(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 1, s"md5_window_hashes60: window must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_window_hashes60"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.md5WindowHashes60(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.md5WindowHashes60($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Md5WindowHashes60 =
    copy(child = newChild)
}

/** SimHash signature of a hash array: bit b of the result is set iff
  * more elements have bit b set than cleared (strict majority). The
  * tight-loop form of the aggregate/zip_with column chain in
  * graft.dedup.Dedup.simhashFrom.
  */
case class SimHashFrom(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_from"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.simhashFrom(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.simhashFrom($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashFrom =
    copy(child = newChild)
}

/** Minimum md5 (lowercase hex) over a string array — one digest per
  * element, unsigned byte-wise min (equal to the lexicographic min of
  * the hex renderings), hex-encoded once at the end.
  */
case class Md5Min(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_min"
  // an empty/all-null array yields null even when the child can't
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GraftKernels.md5Min(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = org.apache.spark.sql.graftext.GraftKernels.md5Min($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Md5Min =
    copy(child = newChild)
}

/** Per-row Poisson(1) bootstrap draws: one digest per BLOCK of two
  * reps — md5 of "key_blk" (blk = rep div 2) yields two independent
  * 52-bit uniforms, so rep 2·blk replays as
  * `('0x' || substr(md5(key || '_' || blk), 1, 13))::BIGINT` and rep
  * 2·blk+1 as `('0x' || substr(md5(key || '_' || blk), 17, 13))::BIGINT`
  * (the Md5MinHash a/b-halves precedent), each compared against the
  * ⌊CDF·2⁵²⌋ integer thresholds ([[GraftKernels.PoissonCdf52]]). One
  * kernel loop per row replaces b/2 interpreted
  * concat→md5→substr→conv chains (measured 5.4×-at-10× compute tax on
  * x_bootstrap_ci); the construction stays replayable hash-for-hash by
  * any engine with md5 — the x_bootstrap_ci oracle digests the same
  * per-block scheme.
  */
case class PoissonBootstrapDraws(child: Expression, b: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(b >= 1 && b <= 4096, s"poisson_bootstrap_draws b must be in [1, 4096], got $b")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poisson_bootstrap_draws"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.poissonBootstrapDraws(input.asInstanceOf[Long], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftext.GraftKernels.poissonBootstrapDraws($c, $b);")

  override protected def withNewChildInternal(newChild: Expression): PoissonBootstrapDraws =
    copy(child = newChild)
}
