package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as ONE per-row expression — no shingle
  * explode, no distinct, no aggregation, no shuffle.
  *
  * Reproduces the `shingleHashes → MinHashAgg` pipeline bit-exactly
  * (property-tested in MinHashSigSpec):
  *   - shingles = k consecutive `split(text, ' ')` tokens. Because every
  *     separator is a single space, the joined shingle string IS the
  *     original byte span from token i's first byte to token i+k-1's
  *     last — so the base hash (Spark's `xxhash64(shingle)`, XXH64 seed
  *     42) is computed in place over the document bytes, zero copies;
  *   - family member i = the same splitmix finalizer [[MinHashAgg]]
  *     uses, min'd per family. Min over the shingle MULTISET equals min
  *     over the distinct set, so skipping the `.distinct()` changes
  *     nothing.
  *
  * Returns NULL for docs with fewer than k tokens (the aggregation path
  * drops them at the shingle filter; callers filter nulls), and for null
  * text. At 100 TB this turns signature generation — the widest shuffle
  * in the near-dup pipeline (all shingle hashes) — into a scan-side
  * projection; only the 16-row-per-doc LSH bands ever shuffle.
  */
case class MinHashSig(child: Expression, k: Int = 3, numHashes: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSigImpl.compute(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $arr =
         |  graft.functions.MinHashSigImpl.compute($c, $k, $numHashes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `minhash_sig(text)`. */
  def apply(c: Column): Column = apply(c, 3, 64)
  def apply(c: Column, k: Int, numHashes: Int): Column =
    bridge.toColumn(MinHashSig(bridge.toExpression(c), k, numHashes))
}

/** Static kernel (callable from generated code). */
object MinHashSigImpl {
  final val Seed = 42L // Spark's xxhash64 seed

  /** [[MinHashAgg]]'s splitmix-style family finalizer — must stay
    * bit-identical to it. */
  @inline private def mix(seed: Int, h: Long): Long = {
    var x = h ^ (seed.toLong * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  /** Null when the doc has fewer than k tokens. */
  def compute(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // token boundaries: starts(i) .. ends(i) are byte offsets of token i
    var nTokens = 1
    var i = 0
    while (i < n) {
      if (Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < k) return null
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0
    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || Platform.getByte(base, off + i) == 0x20) {
        starts(tok) = start; ends(tok) = i
        tok += 1; start = i + 1
      }
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var w = 0
    while (w <= nTokens - k) {
      val from = starts(w)
      val len = ends(w + k - 1) - from
      val hbase = XXH64.hashUnsafeBytes(base, off + from, len, Seed)
      var f = 0
      while (f < numHashes) {
        val h = mix(f, hbase)
        if (h < sig(f)) sig(f) = h
        f += 1
      }
      w += 1
    }
    new GenericArrayData(sig)
  }
}
