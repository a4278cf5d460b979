package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r13 (VERDICT r12 #6): the non-total-ORDER-BY class, ENFORCED in the
  * driver-visible gate instead of merely scannable by
  * `tools/sort_totality.py` (whose r12 sweep found five real defects).
  *
  * A query whose final ORDER BY admits DISTINCT rows under one sort key
  * emits a plan-dependent tie order — the driver's hash compare then
  * flickers with partition count, and under a LIMIT the row SELECTION
  * itself is nondeterministic. [[check]] runs over the Verify dump: for
  * every query whose oracle's final (paren-depth-0) ORDER BY parses to
  * plain output columns or positions, group the dumped rows by those
  * keys and count groups containing distinct rows. Verify fails its exit
  * code on any hit — a red build, after the dump and oracle_sql.json are
  * already complete so the driver's compare still sees the full
  * artifact. Expression sort keys fall back to the python tool's
  * hand-check list (same contract); single-row outputs are exempt.
  */
object SortTotality {

  /** Final depth-0 ORDER BY of `sql` as output-column names/positions —
    * None when the query has no final sort or its keys are expressions
    * (hand-check territory, mirroring tools/sort_totality.py). Qualified
    * names (`i.a`) resolve to their last segment; quoted identifiers are
    * unquoted; a numeric item is a 1-based output position. */
  private[graft] def finalOrderCols(sql: String): Option[Seq[String]] = {
    val s = sql.replaceAll("'(?:[^']|'')*'", "''") // blind string literals
    val up = s.toUpperCase(java.util.Locale.ROOT)
    // whitespace-tolerant "ORDER <ws+> BY" at depth 0, word-boundary
    // guarded (r13 review: the literal single-space match silently
    // EXEMPTED an `ORDER  BY` / `ORDER\n BY` final sort from the gate)
    def wordAt(i: Int, w: String): Boolean =
      up.regionMatches(i, w, 0, w.length) &&
        (i == 0 || (!up(i - 1).isLetterOrDigit && up(i - 1) != '_')) &&
        (i + w.length == up.length ||
          (!up(i + w.length).isLetterOrDigit && up(i + w.length) != '_'))
    var depth = 0; var pos = -1; var i = 0
    while (i < s.length) {
      s(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && wordAt(i, "ORDER")) {
            var j = i + 5
            while (j < s.length && s(j).isWhitespace) j += 1
            if (j > i + 5 && wordAt(j, "BY")) pos = j + 2
          }
      }
      i += 1
    }
    if (pos < 0) None
    else {
      val clause = s.substring(pos)
        .replaceAll("(?is)(\\s+LIMIT\\s+\\d+)?(\\s+OFFSET\\s+\\d+)?\\s*;?\\s*$", "")
        .trim
      // split on top-level commas only
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      var d = 0; val cur = new StringBuilder
      clause.foreach {
        case '(' => d += 1; cur += '('
        case ')' => d -= 1; cur += ')'
        case ',' if d == 0 => items += cur.result(); cur.clear()
        case c => cur += c
      }
      items += cur.result()
      val stripped = items.map(_.trim
        .replaceAll("(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
        .replaceAll("(?is)\\s+(ASC|DESC)\\s*$", "")
        .replaceAll("(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
        .trim)
      val ident = "^(?:[A-Za-z_][A-Za-z0-9_]*\\.)?(?:[A-Za-z_][A-Za-z0-9_]*|\"[^\"]+\"|\\d+)$".r
      if (stripped.forall(it => ident.pattern.matcher(it).matches()))
        Some(stripped.map { it =>
          val last = it.substring(it.lastIndexOf('.') + 1)
          last.stripPrefix("\"").stripSuffix("\"")
        }.toSeq)
      else None // expression sort key — the python tool's hand-check list
    }
  }

  /** (query, offending-group-count) for every dumped query whose parsed
    * final sort admits distinct tied rows. `oracles` filters which dumps
    * are examined (Verify passes its SPARK_GRAFT_ONLY-filtered map).
    * Per-query jobs run from a small thread pool — Spark schedules
    * concurrent driver-side jobs fine, and the ~290 small group-counts
    * were adding ~70 s of serialized wall to the driver's gate. */
  def check(spark: SparkSession, outDir: String,
      oracles: Map[String, String]): Seq[(String, Long)] = {
    def one(name: String, sql: String): Option[(String, Long)] = {
      val dir = new java.io.File(outDir, name)
      // an existing-but-unreadable dump (a query whose write job failed
      // mid-dump — the dump loop tolerates and reports that per query)
      // must not crash the gate (r13 review); the failure is already
      // visible in the dump loop's stderr and the driver's compare
      if (!dir.exists() ||
          scala.util.Try(spark.read.parquet(dir.toString).schema).isFailure) None
      else finalOrderCols(sql).flatMap { raw =>
        val df = spark.read.parquet(dir.toString)
        val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
        // positions are 1-based into the output schema; names resolve
        // case-insensitively — an alias not in the output (pruned or
        // renamed) falls back to the hand-check list like an expression
        val resolved = raw.map { k =>
          if (k.forall(_.isDigit)) {
            val idx = k.toInt - 1
            if (idx >= 0 && idx < df.columns.length) Some(df.columns(idx)) else None
          } else byLower.get(k.toLowerCase)
        }
        if (resolved.exists(_.isEmpty)) None
        else {
          val keys = resolved.flatten.map(col)
          val allAsJson = to_json(struct(df.columns.map(col): _*))
          val bad = df.groupBy(keys: _*)
            .agg(countDistinct(allAsJson).as("d"))
            .filter(col("d") > 1)
            .count()
          if (bad > 0 && df.count() > 1) Some(name -> bad) else None
        }
      }
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = oracles.toSeq.sortBy(_._1).map { case (name, sql) =>
        pool.submit(new java.util.concurrent.Callable[Option[(String, Long)]] {
          def call(): Option[(String, Long)] = one(name, sql)
        })
      }
      futures.flatMap(_.get())
    } finally pool.shutdown()
  }
}
