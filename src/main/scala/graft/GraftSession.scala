package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession configuration so Verify / Bench / tests / CLI all
  * run with identical semantics.
  *
  * - UTC + TIMESTAMP_NTZ parity with the DuckDB oracle.
  * - `nanosAsLong`: the driver-generated `events.parquet` stores
  *   TIMESTAMP(NANOS) which Spark's parquet reader rejects by default;
  *   reading as long + explicit conversion in [[Tables.events]] keeps the
  *   scan vectorized.
  * - AQE on: at cluster scale this gives runtime shuffle-partition
  *   coalescing and skew-join splitting for free.
  * - codegen cache sized to the library (r10): Spark's compiled-class
  *   cache holds 100 entries by default — a ~300-query workload churns
  *   it completely, so every re-run of a plan pays full janino
  *   recompilation of all its stages. This was the r9 "e02 regressed
  *   +50%" mystery: queries run LATE in a long session had their
  *   classes evicted between passes (e02: 1.9 s isolated vs 4.2-4.3 s
  *   at position ~280; reproduced at both 512m and 1g code cache,
  *   which exonerated code-cache pressure). 8192 entries keeps every
  *   stage of the full suite resident — mini-bench total dropped 21%
  *   and e02 returned to family norm. Class memory lands in metaspace/
  *   code cache, both sized for it here.
  */
object GraftSession {
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // r16: 8192 (sized in r10 for a ~285-query suite) was marginal again
    // — the full 297-suite bench showed the r10 signature on the e*
    // flagships (e01 ~8 s in-context vs ~4 s isolated or in any ≤130-
    // query subset, flat across host-speed passes) while no subset
    // reproduced it; the r16 optimization round added new codegen'd
    // shapes (array-verify, carried-cosine descent). Entries are class
    // references (metaspace-resident either way); double the headroom.
    .config("spark.sql.codegen.cache.maxEntries", "16384")
    .config("spark.ui.enabled", "false")

  /** Local session for tests/dev. */
  def local(threads: Int = 8): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
