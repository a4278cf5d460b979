package graft

/** Per-query PHASE wall-clock attribution for the heavyweight
  * streaming-lifecycle gates (r15, VERDICT r14 #5): r14 settled the
  * b10_stream_band_index operating-point scare only by hand-splitting
  * its trigger/compact/recover wall in a worktree A/B — this registry
  * makes that split a committed artifact instead of a one-off. The five
  * instrumented gates wrap their EAGER stages (trigger loops, ledger
  * recovery, snapshot builds) in [[time]]; [[graft.Bench]] drains the
  * accumulator around each timed run and emits a `phases` field in the
  * bench JSON, so the next warm-vs-cold question is answerable from the
  * committed data. Phases cover the eager stages only — the remainder
  * against the query's total is the lazy output materialization (the
  * final orderBy + noop write), which has no seam to wrap.
  *
  * Zero-cost when nobody drains: two nanoTime calls and a CHM merge per
  * phase. Thread-safe (foreachBatch bodies run on stream execution
  * threads). */
object PhaseTimer {
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]]()

  def time[T](query: String, phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      acc.computeIfAbsent(query,
          _ => new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]())
        .merge(phase, dt, (a, b) => a + b)
    }
  }

  /** Remove and return the accumulated phases of one query (empty map
    * when it recorded none). Callers drain BEFORE a run to reset and
    * AFTER it to read — accumulation across runs is never meaningful. */
  def drain(query: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    Option(acc.remove(query))
      .map(_.asScala.map { case (k, v) => k -> v.doubleValue }.toMap)
      .getOrElse(Map.empty)
  }
}
