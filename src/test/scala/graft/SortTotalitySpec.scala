package graft

import org.apache.spark.sql.functions._

/** r13 (VERDICT r12 #6): the sort-totality gate that Verify now enforces
  * — parser unit pins (the depth-0 final-ORDER-BY extraction mirrors
  * tools/sort_totality.py) and an end-to-end check over planted dumps. */
class SortTotalitySpec extends SparkSpec {
  import spark.implicits._

  test("finalOrderCols: plain, qualified, positional, quoted, decorated") {
    assert(SortTotality.finalOrderCols("SELECT a, b FROM t ORDER BY a, b DESC")
      === Some(Seq("a", "b")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY i.a, i.b")
      === Some(Seq("a", "b")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY 1, 2 LIMIT 5")
      === Some(Seq("1", "2")))
    assert(SortTotality.finalOrderCols("""SELECT * FROM t ORDER BY "rank" DESC NULLS LAST""")
      === Some(Seq("rank")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY a NULLS FIRST, b ASC")
      === Some(Seq("a", "b")))
  }

  test("finalOrderCols: window/CTE sorts at depth > 0 are not the final sort") {
    assert(SortTotality.finalOrderCols(
      "SELECT ROW_NUMBER() OVER (ORDER BY x) AS rn FROM t") === None)
    assert(SortTotality.finalOrderCols(
      "WITH c AS (SELECT * FROM t ORDER BY x) SELECT * FROM c ORDER BY y")
      === Some(Seq("y")))
    // a literal containing 'ORDER BY' is blinded
    assert(SortTotality.finalOrderCols(
      "SELECT * FROM t WHERE s = 'ORDER BY z' ORDER BY w") === Some(Seq("w")))
  }

  test("finalOrderCols: whitespace variants, OFFSET-only and semicolon tails (r13 review)") {
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER  BY a")
      === Some(Seq("a")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER\n  BY a, b")
      === Some(Seq("a", "b")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY a OFFSET 2")
      === Some(Seq("a")))
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY a LIMIT 3 OFFSET 2;")
      === Some(Seq("a")))
    // word-boundary guard: an identifier ending in ORDER is not a sort
    assert(SortTotality.finalOrderCols("SELECT xorder BY_ FROM t") === None)
  }

  test("check: an existing-but-unreadable dump dir is skipped, not a crash (r13 review)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorttot_empty").toString
    try {
      new java.io.File(out, "q_empty").mkdirs() // failed mid-dump: dir, no parquet
      Seq((1L, "x"), (1L, "y")).toDF("k", "v").coalesce(1).write.parquet(s"$out/q_bad2")
      val got = SortTotality.check(spark, out, Map(
        "q_empty" -> "SELECT k FROM t ORDER BY k",
        "q_bad2" -> "SELECT k, v FROM t ORDER BY k"))
      assert(got === Seq("q_bad2" -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("finalOrderItems: expression sort keys are parsed, not exempted (r14)") {
    assert(SortTotality.finalOrderCols("SELECT * FROM t ORDER BY a + b") === None)
    assert(SortTotality.finalOrderItems("SELECT * FROM t ORDER BY a + b")
      === Some(Seq(Right("a + b"))))
    assert(SortTotality.finalOrderItems("SELECT * FROM t ORDER BY abs(a) DESC, b")
      === Some(Seq(Right("abs(a)"), Left("b"))))
    // DuckDB double-quoted identifiers inside expressions become backticks
    // (Spark's expr() would otherwise MISPARSE them as string literals)
    assert(SortTotality.finalOrderItems("""SELECT * FROM t ORDER BY abs("k")""")
      === Some(Seq(Right("abs(`k`)"))))
    // literals inside expression keys survive intact
    assert(SortTotality.finalOrderItems("SELECT * FROM t ORDER BY coalesce(a, 'zz')")
      === Some(Seq(Right("coalesce(a, 'zz')"))))
    // a double quote INSIDE a single-quoted literal is data, not an
    // identifier quote (r14 review): it must NOT become a backtick
    assert(SortTotality.finalOrderItems(
      """SELECT * FROM t ORDER BY strpos(v, '"a"')""")
      === Some(Seq(Right("""strpos(v, '"a"')"""))))
    assert(SortTotality.rewriteQuotedIdents(
      """replace(v, '"', 'x') || abs("k")""") === """replace(v, '"', 'x') || abs(`k`)""")
    assert(SortTotality.finalOrderCols("SELECT a FROM t") === None)
    assert(SortTotality.finalOrderItems("SELECT a FROM t") === None)
  }

  test("stripNoise: comments cannot corrupt the depth scan (r14 ADVICE)") {
    // a '--' comment containing ORDER BY used to register a fake final sort
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t -- ORDER BY b\n") === None)
    // an unbalanced paren in a block comment used to corrupt depth-0
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t /* ( */ ORDER BY a") === Some(Seq("a")))
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t /* outer /* nested */ ( */ ORDER BY a") === Some(Seq("a")))
    // a comment between ORDER BY and its keys, and '--' inside a literal
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t WHERE s <> '--x' ORDER BY a") === Some(Seq("a")))
    // length preservation: item text after a stripped comment still slices
    assert(SortTotality.finalOrderItems(
      "SELECT a, b FROM t /* c */ ORDER BY a + b") === Some(Seq(Right("a + b"))))
  }

  test("check: expression sort keys evaluate over the dump (r14)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorttot_expr").toString
    try {
      // abs(k) collides -1 and 1: distinct rows share the expression key
      Seq((-1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_exprbad")
      // k + 0 is injective over k, and (k) is a unique key here
      Seq((1L, "x"), (2L, "y")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_exprgood")
      // references a pruned column: warned + exempt, never a false FAIL
      Seq((1L, "x"), (1L, "y")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_pruned")
      val got = SortTotality.check(spark, out, Map(
        "q_exprbad" -> "SELECT k, v FROM t ORDER BY abs(k)",
        "q_exprgood" -> "SELECT k, v FROM t ORDER BY k + 0",
        "q_pruned" -> "SELECT k, v FROM t ORDER BY missing_col + 1"))
      assert(got === Seq("q_exprbad" -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("stripNoise: double-quoted identifiers are atomic spans (r15 ADVICE)") {
    // '--' inside a quoted identifier is name text, not a comment start
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t ORDER BY \"a--b\"") === Some(Seq("a--b")))
    // parens/commas inside a quoted identifier must not corrupt the
    // depth-0/comma scan: one key, not two, and depth stays balanced
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t ORDER BY \"a,b\"") === Some(Seq("a,b")))
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t ORDER BY \"a(b\", c") === Some(Seq("a(b", "c")))
    // an identifier containing 'ORDER BY' is a name, not a final sort
    assert(SortTotality.finalOrderCols(
      "SELECT \"ORDER BY\" FROM t") === None)
    // a DOT inside a quoted identifier is name text, not a qualifier
    // split (r15 review: lastIndexOf('.') used to cut inside the
    // quotes and resolve the wrong column)
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t ORDER BY \"a.b\"") === Some(Seq("a.b")))
    assert(SortTotality.finalOrderCols(
      "SELECT a FROM t ORDER BY t1.\"a.b\"") === Some(Seq("a.b")))
  }

  test("check: a non-portable function in an expression key WARNs and " +
    "exempts instead of evaluating with Spark-only semantics (r15 ADVICE)") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorttot_port").toString
    try {
      // CAST(double AS INT): truncates in Spark, rounds in DuckDB — the
      // dump HAS ties under Spark's truncation (1.4, 1.6 → 1), but the
      // key must be exempted (WARN), not machine-flagged with the wrong
      // engine's semantics
      Seq((1.4, "x"), (1.6, "y")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_cast")
      // a non-whitelisted function that exists in both engines
      Seq((1L, "x"), (2L, "y")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_fn")
      // the whitelisted shape the real surface uses (b04_delta_drivers)
      Seq((-1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_absdiff")
      // DECIMAL arithmetic: Spark rounds HALF_UP at derived scale,
      // DuckDB promotes division to DOUBLE — must WARN, not evaluate.
      // The dump TIES under k/3 (distinct rows, same k), so a silent
      // Spark-side evaluation would flag it; only the WARN path keeps
      // it out of the result
      Seq((BigDecimal("1.10"), "x"), (BigDecimal("1.10"), "y")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_decdiv")
      val got = SortTotality.check(spark, out, Map(
        "q_cast" -> "SELECT k, v FROM t ORDER BY CAST(k AS INT)",
        "q_fn" -> "SELECT k, v FROM t ORDER BY sin(k)",
        "q_decdiv" -> "SELECT k, v FROM t ORDER BY k / 3",
        "q_absdiff" -> "SELECT k, v FROM t ORDER BY abs(k - 0)"))
      // q_cast/q_fn/q_decdiv exempted via WARN; abs(k-0) collides -1/1
      // → flagged by the PORTABLE whitelist evaluation, proving the
      // machine check still runs
      assert(got === Seq("q_absdiff" -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }

  test("check: flags a tie-ambiguous dump, passes a total one") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorttot").toString
    try {
      // ambiguous: two DISTINCT rows share sort key k=1
      Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_bad")
      // total: (k, v) is a unique key
      Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_good")
      // duplicate FULL rows under one key are NOT ambiguity (same row
      // emitted twice sorts identically)
      Seq((1L, "x"), (1L, "x"), (2L, "z")).toDF("k", "v")
        .coalesce(1).write.parquet(s"$out/q_dupe")
      val got = SortTotality.check(spark, out, Map(
        "q_bad" -> "SELECT k, v FROM t ORDER BY k",
        "q_good" -> "SELECT k, v FROM t ORDER BY k, v",
        "q_dupe" -> "SELECT k, v FROM t ORDER BY k",
        "q_missing_dump" -> "SELECT 1 ORDER BY x"))
      assert(got === Seq("q_bad" -> 1L))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
