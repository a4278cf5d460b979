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
  */
case class TopBigramCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = IntegerType
  override def inputTypes = Seq(StringType)
  override def prettyName: String = "top_bigram_count"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = TopBigramCountImpl.compute(input.asInstanceOf[UTF8String])
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("top")
      s"""
         |final int $r = graft.functions.TopBigramCountImpl.compute($c);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
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
}

/** Static kernel (callable from generated code). Returns -1 when the doc
  * has fewer than 2 tokens. */
object TopBigramCountImpl {
  final val Seed = 42L
  final val MaxBigrams = 1 << 28

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
    if (nTokens < 2) return -1
    // 2^28 bigrams ≈ >0.5 GB of text in ONE row — beyond that the pow2
    // capacity doubling would overflow Int and the probe loop could spin
    // forever; fail loudly instead (such a row belongs in chunking, not
    // a per-row kernel)
    if (nTokens - 1 > MaxBigrams)
      throw new IllegalArgumentException(
        s"top_bigram_count: document has ${nTokens - 1} bigrams (max $MaxBigrams)")
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
