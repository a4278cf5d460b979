package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** r13 (VERDICT r12 #6): the non-total-ORDER-BY class, ENFORCED in the
  * driver-visible gate instead of merely scannable by
  * `tools/sort_totality.py` (whose r12 sweep found five real defects).
  *
  * A query whose final ORDER BY admits DISTINCT rows under one sort key
  * emits a plan-dependent tie order — the driver's hash compare then
  * flickers with partition count, and under a LIMIT the row SELECTION
  * itself is nondeterministic. [[check]] runs over the Verify dump: for
  * every query with a final (paren-depth-0) ORDER BY, group the dumped
  * rows by the sort keys and count groups containing distinct rows.
  * Verify fails its exit code on any hit — a red build, after the dump
  * and oracle_sql.json are already complete so the driver's compare
  * still sees the full artifact.
  *
  * r14 (VERDICT r13 #4 + ADVICE): two fail-open holes closed. (a) SQL
  * comments are blanked before the depth-0 scan — a `--` or slash-star
  * comment containing 'ORDER BY' or an unbalanced paren used to corrupt
  * the scan and silently exempt a genuinely tie-ambiguous query. (b)
  * EXPRESSION sort keys (`ORDER BY a + b`, `abs(a)`) are now
  * machine-checked too: the item text is parsed with `expr()` and
  * evaluated against the dumped output, so the class the r12 incident
  * was about no longer falls to a hand-check list. Only an expression
  * that references non-output (pruned) columns or uses syntax Spark
  * cannot parse remains exempt — and those are WARNED per query, not
  * silently dropped.
  */
object SortTotality {

  /** Length-preserving noise removal, single left-to-right scan:
    * `--` line comments and (nesting-tolerant) slash-star block comments
    * become spaces; single-quoted literal BODIES ('' escape aware)
    * become spaces too when `blindLiterals`, keeping the enclosing
    * quotes. Length preservation means every depth-0 position found in
    * the scan copy indexes the same character in the original, so item
    * text can be sliced from a literals-intact copy. */
  private[graft] def stripNoise(sql: String, blindLiterals: Boolean): String = {
    val out = sql.toCharArray
    var i = 0
    while (i < out.length) {
      val c = out(i)
      if (c == '\'') {
        // literal: scan to closing quote, '' is an escaped quote
        var j = i + 1
        var open = true
        while (j < out.length && open) {
          if (out(j) == '\'') {
            if (j + 1 < out.length && out(j + 1) == '\'') j += 2
            else open = false
          } else j += 1
        }
        if (blindLiterals) { var k = i + 1; while (k < j) { out(k) = ' '; k += 1 } }
        i = j + 1
      } else if (c == '"') {
        // double-quoted IDENTIFIER (ANSI/DuckDB), "" escape aware: an
        // atomic span, blinded like a literal when `blindLiterals` —
        // r15 ADVICE: a '--', '(', ')' or ',' INSIDE an identifier is
        // name text, not structure; it used to start a fake comment or
        // corrupt the depth-0/comma scan (the fail-open class r14
        // closed for comments). The clean copy keeps the name intact
        // for item extraction.
        var j = i + 1
        var open = true
        while (j < out.length && open) {
          if (out(j) == '"') {
            if (j + 1 < out.length && out(j + 1) == '"') j += 2
            else open = false
          } else j += 1
        }
        if (blindLiterals) { var k = i + 1; while (k < j) { out(k) = ' '; k += 1 } }
        i = j + 1
      } else if (c == '-' && i + 1 < out.length && out(i + 1) == '-') {
        var j = i
        while (j < out.length && out(j) != '\n') { out(j) = ' '; j += 1 }
        i = j
      } else if (c == '/' && i + 1 < out.length && out(i + 1) == '*') {
        var j = i + 2
        var depth = 1
        out(i) = ' '; out(i + 1) = ' '
        while (j < out.length && depth > 0) {
          if (out(j) == '/' && j + 1 < out.length && out(j + 1) == '*') {
            depth += 1; out(j) = ' '; out(j + 1) = ' '; j += 2
          } else if (out(j) == '*' && j + 1 < out.length && out(j + 1) == '/') {
            depth -= 1; out(j) = ' '; out(j + 1) = ' '; j += 2
          } else { out(j) = ' '; j += 1 }
        }
        i = j
      } else i += 1
    }
    new String(out)
  }

  /** One final-sort item: Left(name-or-position) for a plain output
    * column / 1-based position, Right(expression SQL text, double-quoted
    * identifiers rewritten to backticks for Spark's parser) otherwise. */
  private[graft] def finalOrderItems(sql: String): Option[Seq[Either[String, String]]] = {
    val scan = stripNoise(sql, blindLiterals = true)  // for structure
    val clean = stripNoise(sql, blindLiterals = false) // for item text
    val up = scan.toUpperCase(java.util.Locale.ROOT)
    // whitespace-tolerant "ORDER <ws+> BY" at depth 0, word-boundary
    // guarded (r13 review: the literal single-space match silently
    // EXEMPTED an `ORDER  BY` / `ORDER\n BY` final sort from the gate)
    def wordAt(i: Int, w: String): Boolean =
      up.regionMatches(i, w, 0, w.length) &&
        (i == 0 || (!up(i - 1).isLetterOrDigit && up(i - 1) != '_')) &&
        (i + w.length == up.length ||
          (!up(i + w.length).isLetterOrDigit && up(i + w.length) != '_'))
    var depth = 0; var pos = -1; var i = 0
    while (i < scan.length) {
      scan(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && wordAt(i, "ORDER")) {
            var j = i + 5
            while (j < scan.length && scan(j).isWhitespace) j += 1
            if (j > i + 5 && wordAt(j, "BY")) pos = j + 2
          }
      }
      i += 1
    }
    if (pos < 0) None
    else {
      val tailRe = "(?is)(\\s+LIMIT\\s+\\d+)?(\\s+OFFSET\\s+\\d+)?\\s*;?\\s*$".r
      // measure the LIMIT/OFFSET/; tail on the scan copy (literals
      // blinded — a literal containing " LIMIT 3" can't fake a tail),
      // then cut BOTH copies at the same offset
      val scanClause = scan.substring(pos)
      val tailStart = tailRe.findFirstMatchIn(scanClause).map(_.start)
        .getOrElse(scanClause.length)
      val cleanClause = clean.substring(pos, pos + tailStart)
      val scanOnly = scanClause.substring(0, tailStart)
      // split on top-level commas only, positions from the scan copy
      val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var d = 0; var ci = 0
      while (ci < scanOnly.length) {
        scanOnly(ci) match {
          case '(' => d += 1
          case ')' => d -= 1
          case ',' if d == 0 => cuts += ci
          case _ => ()
        }
        ci += 1
      }
      val bounds = (-1 +: cuts.toSeq) :+ scanOnly.length
      val items = bounds.sliding(2).map { case Seq(a, b) =>
        cleanClause.substring(a + 1, b)
      }.toSeq
      val stripped = items.map(_.trim
        .replaceAll("(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
        .replaceAll("(?is)\\s+(ASC|DESC)\\s*$", "")
        .replaceAll("(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
        .trim)
      if (stripped.exists(_.isEmpty)) None // malformed clause — don't guess
      else {
        val ident = "^(?:[A-Za-z_][A-Za-z0-9_]*\\.)?(?:[A-Za-z_][A-Za-z0-9_]*|\"[^\"]+\"|\\d+)$".r
        Some(stripped.map { it =>
          if (ident.pattern.matcher(it).matches()) {
            // quoted trailing part first (r15 review): "a.b" is ONE
            // identifier whose name contains a dot — lastIndexOf('.')
            // before quote-stripping split inside the quotes and
            // checked ties on the wrong column
            val last =
              if (it.endsWith("\"")) {
                val open = it.lastIndexOf('"', it.length - 2)
                it.substring(open + 1, it.length - 1)
              } else it.substring(it.lastIndexOf('.') + 1)
            Left(last)
          } else
            // DuckDB double-quotes identifiers; Spark's expr() wants
            // backticks (its double quote is a string literal — a
            // MISPARSE, not an error, so rewrite rather than let it).
            // Positional, literal-aware (r14 review): a " INSIDE a
            // single-quoted literal is data, not an identifier quote —
            // a blind regex would rewrite the literal's content.
            Right(rewriteQuotedIdents(it))
        })
      }
    }
  }

  /** `"ident"` → `` `ident` `` OUTSIDE single-quoted literals only;
    * literal bodies (including any `"` they contain) pass through
    * verbatim. */
  private[graft] def rewriteQuotedIdents(it: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < it.length) {
      it(i) match {
        case '\'' =>
          var j = i + 1
          var open = true
          while (j < it.length && open) {
            if (it(j) == '\'') {
              if (j + 1 < it.length && it(j + 1) == '\'') j += 2 else open = false
            } else j += 1
          }
          sb.append(it.substring(i, math.min(j + 1, it.length)))
          i = j + 1
        case '"' =>
          val j = it.indexOf('"', i + 1)
          if (j < 0) { sb.append(it.substring(i)); i = it.length }
          else { sb.append('`').append(it.substring(i + 1, j)).append('`'); i = j + 1 }
        case c => sb.append(c); i += 1
      }
    }
    sb.result()
  }

  /** Cross-engine portability gate for EXPRESSION sort keys (r15
    * ADVICE): `expr()` evaluates the key with SPARK semantics, but the
    * oracle ran it under DuckDB — a function that parses in both
    * engines yet computes differently (the canonical case:
    * `CAST(x AS INT)` truncates in Spark, rounds-half-even in DuckDB)
    * would silently mis-group and turn the tie check into a false red
    * or false green. Only nodes on this bit-identical whitelist may
    * appear in a machine-checked key; anything else routes to the same
    * loud WARN-and-exempt path as an unresolvable key. Casts are
    * allowed only between numeric types, never fractional→integral
    * (the rounding divergence) and never INTO a decimal (Spark-side
    * HALF_UP rescale) — which still admits the implicit widening casts
    * Spark's analyzer inserts for mixed-type arithmetic. Decimal
    * ARITHMETIC is excluded wholesale: the engines derive different
    * result types (Spark DECIMAL with HALF_UP rounding vs DuckDB's
    * DOUBLE promotion for division).
    * Returns the offending node names (empty = portable). */
  private[graft] def nonPortableNodes(
      root: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types._
    val allowed = Set("AttributeReference", "Literal", "Alias",
      "Abs", "UnaryMinus", "Add", "Subtract", "Multiply", "Divide",
      "Coalesce", "Upper", "Lower", "Length", "Concat")
    val arith = Set("Abs", "UnaryMinus", "Add", "Subtract", "Multiply", "Divide")
    def numeric(t: DataType) = t.isInstanceOf[NumericType]
    def decimal(t: DataType) = t.isInstanceOf[DecimalType]
    def fractional(t: DataType) = t match {
      case DoubleType | FloatType | _: DecimalType => true
      case _ => false
    }
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    root.collect {
      case c: Cast =>
        // a decimal TARGET rescales with Spark's HALF_UP — not portable
        val ok = numeric(c.child.dataType) && numeric(c.dataType) &&
          !(fractional(c.child.dataType) && integral(c.dataType)) &&
          !decimal(c.dataType)
        if (ok) None
        else Some(s"cast(${c.child.dataType.simpleString} as ${c.dataType.simpleString})")
      // r16 (ADVICE r15): Concat is only bit-identical when no child is
      // nullable — Spark's Concat NULL-propagates while DuckDB's
      // concat() skips NULL arguments, so a nullable operand silently
      // mis-groups. Route nullable concats to WARN.
      case e if e.getClass.getSimpleName == "Concat" &&
          e.children.exists(_.nullable) =>
        Some("concat-nullable-child")
      // r16 (ADVICE r15): Divide diverges on a zero divisor — Spark
      // (non-ANSI) returns NULL, DuckDB IEEE double division yields
      // ±Infinity. Admit it only when the divisor is a provably nonzero
      // literal; anything else WARNs. (Decimal divides are already
      // caught by the decimal-arithmetic case below.)
      case e if e.getClass.getSimpleName == "Divide" =>
        e.children.lastOption match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, _))
            if v != null &&
              scala.util.Try(v.toString.toDouble).toOption.exists(_ != 0.0) => None
          case _ => Some("divide-unprovable-nonzero-divisor")
        }
      // DECIMAL arithmetic (r15 review): Spark derives precision/scale
      // and rounds HALF_UP (CheckOverflow), DuckDB promotes decimal
      // division to DOUBLE — same parse, different values. Integer and
      // IEEE-double arithmetic are bit-identical in both engines;
      // decimal operands route to WARN. (CheckOverflow itself is no
      // longer whitelisted — it only ever wraps decimal arithmetic.)
      case e if arith.contains(e.getClass.getSimpleName) &&
          (decimal(e.dataType) || e.children.exists(ch => decimal(ch.dataType))) =>
        Some(s"decimal-${e.prettyName}")
      case e if !allowed.contains(e.getClass.getSimpleName) => Some(e.prettyName)
    }.flatten
  }

  /** Back-compat shape used by older specs/tools: the all-plain-columns
    * view — None when any key is an expression. */
  private[graft] def finalOrderCols(sql: String): Option[Seq[String]] =
    finalOrderItems(sql).flatMap { items =>
      if (items.forall(_.isLeft)) Some(items.collect { case Left(n) => n })
      else None
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
      else finalOrderItems(sql).flatMap { raw =>
        val df = spark.read.parquet(dir.toString)
        val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
        // positions are 1-based into the output schema; names resolve
        // case-insensitively; expression keys evaluate over the dump via
        // expr() (r14 — previously hand-check-exempt). A key that can't
        // resolve against the OUTPUT (pruned column, non-Spark syntax)
        // is loudly warned, not silently exempted.
        val resolved: Seq[Option[Column]] = raw.map {
          case Left(k) if k.forall(_.isDigit) =>
            val idx = k.toInt - 1
            if (idx >= 0 && idx < df.columns.length) Some(col(df.columns(idx)))
            else None
          case Left(k) => byLower.get(k.toLowerCase).map(col)
          case Right(e) =>
            scala.util.Try {
              val c = expr(e)
              // resolve against the dump's schema, then verify every
              // node is on the cross-engine bit-identical whitelist —
              // a Spark-evaluated key whose semantics differ from the
              // DuckDB oracle's must WARN, not silently mis-group
              val analyzed = df.select(c).queryExecution.analyzed
              val bad = analyzed.expressions.flatMap(nonPortableNodes)
              require(bad.isEmpty,
                s"non-portable sort-key node(s): ${bad.mkString(", ")}")
              c
            }.toOption
        }
        if (resolved.exists(_.isEmpty)) {
          System.err.println(s"[verify][sort-totality] WARN $name: sort key " +
            s"not checkable against the dump (pruned column, unparseable " +
            s"expression, or a function outside the cross-engine-portable " +
            s"whitelist) — hand-check: ${raw.zip(resolved).collect {
              case (k, None) => k.merge }.mkString(", ")}")
          None
        } else {
          val keys = resolved.flatten
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
