package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of the single most frequent adjacent token pair in a
  * document — the Gopher-style repetition signal — as ONE per-row
  * expression: no bigram explode, no per-(doc, bigram) aggregate, no
  * doc_id shuffle.
  *
  * EXACT, not sketched: bigram identity is decided by byte comparison
  * (an open-addressed table over the document's bigram byte spans;
  * hashes are only the probe order, and a colliding hash falls through
  * to the next slot after the bytes fail to match). A bigram span is the
  * original bytes from token i's start to token i+1's end — tokens split
  * on single spaces, empty tokens included, matching `split(text, ' ')`.
  *
  * NULL for null text and for docs with fewer than 2 tokens (no
  * bigrams), mirroring the declarative formulation's `size >= 2`
  * filter.
  *
  * Poison rows DEGRADE instead of failing the stage: a document over
  * [[TopBigramCountImpl.MaxBigrams]] bigrams returns the
  * [[TopBigramCountImpl.Oversized]] sentinel (-2) so a curation pipeline
  * can route it to chunking/quarantine — at 100 TB one pathological row
  * must not kill the job. `strict = true` restores the loud
  * IllegalArgumentException for callers that prefer fail-fast.
  */
case class TopBigramCount(child: Expression, strict: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "top_bigram_count"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = TopBigramCountImpl.compute(input.asInstanceOf[UTF8String])
    if (r == TopBigramCountImpl.NoBigrams) null
    else if (r == TopBigramCountImpl.Oversized && strict)
      throw TopBigramCountImpl.oversizedError
    else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("top")
      val onOversized =
        if (strict) "throw graft.functions.TopBigramCountImpl.oversizedError();"
        else s"${ev.value} = $r;"
      s"""
         |final int $r = graft.functions.TopBigramCountImpl.compute($c);
         |if ($r == graft.functions.TopBigramCountImpl.NoBigrams()) { ${ev.isNull} = true; }
         |else if ($r == graft.functions.TopBigramCountImpl.Oversized()) { $onOversized }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TopBigramCount =
    copy(child = newChild)
}

object TopBigramCount {
  import org.apache.spark.sql.graftbridge.bridge
  /** Column API: `top_bigram_count(text)`. */
  def apply(c: Column): Column =
    bridge.toColumn(TopBigramCount(bridge.toExpression(c)))
  /** Fail-fast variant: oversized rows throw instead of returning -2. */
  def strict(c: Column): Column =
    bridge.toColumn(TopBigramCount(bridge.toExpression(c), strict = true))
}

/** Static kernel (callable from generated code). Returns
  * [[TopBigramCountImpl.NoBigrams]] (-1) when the doc has fewer than 2
  * tokens and [[TopBigramCountImpl.Oversized]] (-2) when it exceeds
  * [[TopBigramCountImpl.MaxBigrams]]. */
object TopBigramCountImpl {
  final val Seed = 42L
  /** Effective limit is executor heap, not Int overflow: the open table
    * doubles to ≥2n slots × 20 B/slot, so 2^24 bigrams (≈100+ MB of text
    * in ONE cell) already allocates ~670 MB of scratch for that single
    * row. Past this the kernel reports [[Oversized]] — such a row
    * belongs in chunking, not a per-row kernel. */
  final val MaxBigrams = 1 << 24
  /** Sentinel: < 2 tokens, mapped to NULL by the expression. */
  final val NoBigrams = -1
  /** Sentinel: > MaxBigrams bigrams — surfaced as -2 (lenient) or an
    * IllegalArgumentException (strict) so the caller routes the row. */
  final val Oversized = -2

  def oversizedError: IllegalArgumentException =
    new IllegalArgumentException(
      s"top_bigram_count: document exceeds $MaxBigrams bigrams; route " +
        "oversized rows to chunking or use the lenient (-2 sentinel) mode")

  def compute(s: UTF8String): Int = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    var nTokens = 1
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < 2) return NoBigrams
    if (nTokens - 1 > MaxBigrams) return Oversized
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var tok = 0
    var start = 0
    i = 0
    while (i <= nb) {
      if (i == nb || Platform.getByte(base, off + i) == 0x20) {
        starts(tok) = start; ends(tok) = i
        tok += 1; start = i + 1
      }
      i += 1
    }
    val n = nTokens - 1 // bigram occurrences
    var cap = 4
    while (cap < n * 2) cap <<= 1
    val hashes = new Array[Long](cap)
    val offs = new Array[Int](cap)
    val lens = new Array[Int](cap)
    val counts = new Array[Int](cap)
    var best = 0
    var w = 0
    while (w < n) {
      val from = starts(w)
      val len = ends(w + 1) - from
      val h = XXH64.hashUnsafeBytes(base, off + from, len, Seed)
      var slot = (h & (cap - 1)).toInt
      var placed = false
      while (!placed) {
        if (counts(slot) == 0) {
          hashes(slot) = h; offs(slot) = from; lens(slot) = len; counts(slot) = 1
          if (best == 0) best = 1
          placed = true
        } else if (hashes(slot) == h && lens(slot) == len &&
            org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
              base, off + offs(slot), base, off + from, len)) {
          counts(slot) += 1
          if (counts(slot) > best) best = counts(slot)
          placed = true
        } else {
          slot = (slot + 1) & (cap - 1) // occupied by a different bigram
        }
      }
      w += 1
    }
    best
  }
}
