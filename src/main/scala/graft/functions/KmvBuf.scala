package graft.functions

/** Mutable sorted bottom-k long buffer behind the KMV aggregators
  * ([[KmvEstimateAgg]], [[KmvDistinctAgg]]).
  *
  * r16 (optimization round): the old buffers were immutable Vectors
  * rebuilt per arriving distinct value — `(buf.take(at) :+ h) ++
  * buf.drop(at)` is O(k) structural allocation + pointer churn per row,
  * and the fill phase of a 2^14 sketch dominated the whole
  * b05_approx_stats_exact aggregation (measured 2.3–3.5 s of a 4.5 s
  * query). This class keeps the identical SET-of-k-smallest semantics
  * but mutates one flat long array in place: binary search + one
  * System.arraycopy memmove per insert, O(1) reject once full.
  *
  * It extends immutable.Seq[Long] so the aggregator BUFFER TYPE — and
  * therefore the encoded shuffle partial (ArrayType(LongType), ≤ k
  * entries, the "mergeable ≤k-long partials" contract) — is unchanged;
  * in-partition the TypedImperativeAggregate object-buffer contract
  * lets reduce mutate and return the same instance. Deserialized
  * partials arrive as plain Seq[Long] (sorted ascending, distinct — the
  * invariant every producer maintains and encoding preserves); [[from]]
  * re-wraps them and [[mergeSorted]] two-pointer-merges two sorted
  * distinct buffers in O(k). Iteration order is ascending, exactly the
  * old Vector's order, so encoded bytes are bit-identical.
  */
final class KmvBuf private (
    private var arr: Array[Long],
    private var len: Int,
    private val k: Int)
    extends scala.collection.immutable.AbstractSeq[Long] {

  override def apply(i: Int): Long = {
    if (i < 0 || i >= len) throw new IndexOutOfBoundsException(s"$i of $len")
    arr(i)
  }
  override def length: Int = len
  override def isEmpty: Boolean = len == 0
  override def last: Long =
    if (len == 0) throw new NoSuchElementException("last of empty KmvBuf")
    else arr(len - 1)
  override def iterator: Iterator[Long] = new scala.collection.AbstractIterator[Long] {
    private var i = 0
    override def hasNext: Boolean = i < len
    override def next(): Long = { val v = arr(i); i += 1; v }
  }

  /** First index in [0, len) whose value is >= h. */
  private def insertionPoint(h: Long): Int = {
    var lo = 0
    var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Insert h into the sorted distinct bottom-k set; mutates in place and
    * returns this. Semantics identical to the old immutable insert:
    * no-op when full and h >= max, no-op on duplicates, drops the
    * largest when a smaller value arrives into a full buffer. */
  def insert(h: Long): KmvBuf = {
    if (len >= k && h >= arr(len - 1)) return this
    val at = insertionPoint(h)
    if (at < len && arr(at) == h) return this
    if (len < k) {
      if (len == arr.length) {
        val grown = new Array[Long](math.min(k, math.max(16, arr.length * 2)))
        System.arraycopy(arr, 0, grown, 0, len)
        arr = grown
      }
      System.arraycopy(arr, at, arr, at + 1, len - at)
      arr(at) = h
      len += 1
    } else {
      // full: shift [at, len-2] right, overwriting the (dropped) max
      System.arraycopy(arr, at, arr, at + 1, len - 1 - at)
      arr(at) = h
    }
    this
  }
}

object KmvBuf {
  def empty(k: Int): KmvBuf = new KmvBuf(new Array[Long](math.min(k, 16)), 0, k)

  /** Wrap a sorted-ascending distinct Seq (a deserialized partial, or an
    * existing KmvBuf passed through). */
  def from(s: Seq[Long], k: Int): KmvBuf = s match {
    case kb: KmvBuf => kb
    case other =>
      val a = other.toArray
      new KmvBuf(a, a.length, k)
  }

  /** Two-pointer merge of two sorted-ascending distinct buffers into a
    * fresh bottom-k buffer — same result as the old
    * `(a ++ b).distinct.sorted.take(k)`, without the intermediate
    * collections. */
  def mergeSorted(a: Seq[Long], b: Seq[Long], k: Int): KmvBuf = {
    val xa = a match { case kb: KmvBuf => kb.toArray; case o => o.toArray }
    val xb = b match { case kb: KmvBuf => kb.toArray; case o => o.toArray }
    val out = new Array[Long](math.min(k, xa.length + xb.length))
    var i = 0; var j = 0; var c = 0
    while (c < out.length && (i < xa.length || j < xb.length)) {
      val takeA = j >= xb.length || (i < xa.length && xa(i) <= xb(j))
      val v = if (takeA) { val t = xa(i); i += 1; t } else { val t = xb(j); j += 1; t }
      if (c == 0 || out(c - 1) != v) { out(c) = v; c += 1 }
    }
    new KmvBuf(out, c, k)
  }
}
