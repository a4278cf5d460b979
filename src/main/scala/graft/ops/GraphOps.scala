package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B16 — graph analytics over a data-derived co-occurrence graph.
  *
  * The graph: parts are vertices; an undirected edge (u, v) exists iff
  * parts u and v appear in the same order (the classic co-purchase /
  * co-occurrence projection of the order–part bipartite graph). The
  * reference has no graph operators; these extend the w06 (BFS closure)
  * and w07 (PageRank) iterative family with the two one-shot primitives
  * every production graph pipeline starts from: the degree profile and
  * triangle counting.
  *
  * Scale design (100 TB):
  * - Edge build shuffles on the order key (bounded fan-out: an order has
  *   a handful of parts), then dedups on (u, v) — both standard
  *   map-side-combinable shuffles, never a vertex×vertex product.
  * - Triangle counting uses DEGREE-ORIENTED wedge closure (Cohen's
  *   MapReduce formulation; also the GraphX/Trino approach): each edge is
  *   directed from its (degree, id)-smaller endpoint to the larger, so a
  *   hub's wedge set is generated from its LOW-degree neighbors rather
  *   than from the hub itself — candidate wedges drop from
  *   Σ deg(v)² to Σ outdeg(v)² with outdeg bounded by O(√m) on any
  *   graph (arboricity bound). A star vertex (the LSH-hot-bucket of
  *   graphs) therefore produces zero wedges from its own adjacency: its
  *   spokes orient INTO it.
  * - The closing probe is an equi-join of wedge (b, c) pairs against the
  *   oriented edge set — shuffle-partitioned on (b, c), no broadcast of
  *   anything vertex-scale, no driver-side state.
  */
object GraphOps {

  /** Distinct co-purchase edges with u < v. No pre-distinct on the
    * (order, part) pairs: the final (u, v) distinct subsumes it (a part
    * listed twice in an order only duplicates edge rows that dedup
    * anyway), saving one full-table shuffle. */
  private[ops] def buildCopurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    li.select($"ok", $"pk".as("u"))
      .join(li.select($"ok", $"pk".as("v")), Seq("ok"))
      .where($"u" < $"v")
      .select($"u", $"v").distinct()
  }

  /** Materialize-once co-purchase edge table shared by every B16 query
    * (r6-verdict #3): the lineitem self-join + distinct dominated both
    * graph queries when rebuilt from cold per query. At 100 TB you'd
    * bucket-write the edge set by `u` once ([[ScaleOps.writeBucketed]])
    * and point every graph job at it; locally the same move is a parquet
    * snapshot under the JVM tmpdir, keyed by the source dir plus the
    * lineitem table's (bytes, mtime) signature so a regenerated testdata
    * dir invalidates the snapshot instead of serving stale edges. The
    * write stages to a unique temp dir and renames in — a concurrent
    * builder loses the race harmlessly and reads the winner's snapshot.
    * Layout: repartitioned by `u` (the downstream group/join key) so
    * consumers start from a sane distribution. Content is IDENTICAL to
    * [[buildCopurchaseEdges]] — oracle hashes are unaffected. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.{Path => HPath}
    val conf = s.sparkContext.hadoopConfiguration
    val li = new HPath(s"$dir/lineitem.parquet")
    val fs = li.getFileSystem(conf)
    val st = fs.getFileStatus(li)
    val sig = s"${fs.getContentSummary(li).getLength}-${st.getModificationTime}"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir|$sig".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val cacheDir = new HPath(
      s"${sys.props("java.io.tmpdir")}/graft_scratch/copurchase_edges_$key")
    val success = new HPath(cacheDir, "_SUCCESS")
    if (!fs.exists(success)) {
      val staged = new HPath(s"$cacheDir-staged-${java.util.UUID.randomUUID().toString.take(8)}")
      buildCopurchaseEdges(s, dir)
        .repartition(col("u"))
        .write.mode("overwrite").parquet(staged.toString)
      fs.mkdirs(cacheDir.getParent)
      if (!fs.rename(staged, cacheDir)) {
        // lost the race to a concurrent builder — use theirs
        fs.delete(staged, true)
        if (!fs.exists(success)) sys.error(s"copurchaseEdges: cannot materialize $cacheDir")
      }
    }
    s.read.parquet(cacheDir.toString)
  }

  /** B16: degree profile of the co-purchase graph — the first sanity
    * report on any production graph (skew tells you whether hub
    * mitigation is needed downstream). One union + two
    * map-side-combinable counts. */
  def degreeHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = copurchaseEdges(s, dir)
    edges.select($"u".as("p")).unionAll(edges.select($"v".as("p")))
      .groupBy($"p").agg(count(lit(1)).as("degree"))
      .groupBy($"degree").agg(count(lit(1)).as("n_parts"))
      .orderBy($"degree")
  }

  /** B16: top-k parts by triangle participation (number of co-purchase
    * triangles a part belongs to — the local-clustering signal used for
    * community/bot detection and recommendation diversity). Degree-
    * oriented wedge closure; see object doc for the scale argument. */
  def triangleParticipation(s: SparkSession, dir: String, k: Int = 20): DataFrame =
    trianglesOf(s, copurchaseEdges(s, dir), k)

  /** Degree-oriented triangle participation over any undirected edge set
    * (columns `u`, `v`, u < v, no duplicates). Factored out so specs can
    * drive planted graphs through the exact production plan.
    *
    * EDGE-CENTRIC counting (the r6 perf pass): a wedge-join formulation
    * materializes Σ C(outdeg, 2) rows through a shuffle — 41M at sf0.1
    * on this graph (flat degree profile), ~10 s. Instead: build each
    * vertex's sorted out-adjacency array (bounded by the orientation's
    * O(√m) arboricity outdegree, so a hub's array stays small — the
    * array-size twin of the hot-bucket cap), then for every oriented
    * edge (a, b) intersect N⁺(a) with N⁺(b). Each triangle
    * {a→b, a→c, b→c} is found exactly once, at its (a, b) edge. The
    * wedge set is never materialized: the intersection runs inside the
    * row, and only actual triangles (1 row each) are exploded for the
    * per-vertex attribution — edge (a,b) contributes |I| to a and b and
    * 1 to every c ∈ I. */
  /** Degree-oriented sorted out-adjacency: each edge directed from its
    * (degree, id)-smaller endpoint, so a hub's spokes all point INTO it
    * and its own out-array stays arboricity-bounded (O(√m)) — the
    * planted-hub spec asserts this directly on a 10k-spoke star. */
  private[ops] def orientedAdjacency(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("p")).unionAll(edges.select(col("v").as("p")))
      .groupBy(col("p")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("p").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("p").as("v"), col("deg").as("dv")), "v")
    val fwd = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    withDeg.select(
        when(fwd, col("u")).otherwise(col("v")).as("src"),
        when(fwd, col("v")).otherwise(col("u")).as("dst"))
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
  }

  def trianglesOf(s: SparkSession, edgeSet: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    // edges feed degree + orientation (two consumers); `adj` below feeds
    // its own explode + the probe join through one aggregation, so the
    // oriented frame needs no cache of its own. Both caches are released
    // before returning (r6-ADVICE): the top-k result is eagerly
    // checkpointed (≤k rows), so callers that never clearCache — a
    // long-running query loop — do not accumulate cached partitions.
    val edges = edgeSet.cache()
    val adj = orientedAdjacency(edges).cache()
    // re-derive the oriented edges by EXPLODING the adjacency — each edge
    // arrives already carrying its source's array, so the closing probe
    // is ONE join (on dst) instead of two
    // sorted_intersect: fused two-pointer codegen kernel — array_intersect
    // builds a hash set per edge (millions of allocations per stage);
    // both arrays are sorted by construction (sort_array above)
    val tri = adj.select($"src", explode($"nbrs").as("dst"), $"nbrs".as("na"))
      .join(adj.select($"src".as("dst"), $"nbrs".as("nb")), Seq("dst"))
      .withColumn("common", graft.functions.SortedIntersect($"na", $"nb"))
      .withColumn("nt", size($"common").cast("long"))
      .where($"nt" > 0)
    val top = tri.select(explode(concat(
        array(struct($"src".as("p"), $"nt".as("c")),
              struct($"dst".as("p"), $"nt".as("c"))),
        expr("transform(common, x -> named_struct('p', x, 'c', CAST(1 AS BIGINT)))")))
        .as("pc"))
      .select($"pc.p".as("part_key"), $"pc.c".as("c"))
      .groupBy($"part_key").agg(sum($"c").as("n_triangles"))
      .orderBy($"n_triangles".desc, $"part_key")
      .limit(k)
      .localCheckpoint(true)
    edges.unpersist()
    adj.unpersist()
    top
  }

  /** B16 (r7): k-core via iterative peel (r6-verdict #6) — the classic
    * subgraph-density primitive (community cores, spam/bot filtering,
    * graph sparsification before expensive kernels). Round t removes
    * every vertex whose degree within the round-(t−1) survivor subgraph
    * is below `k`; removals cascade. Semantics are the BOUNDED peel —
    * exactly `rounds` rounds, with a monotonicity early-exit (the alive
    * set only shrinks, so an unchanged count means fixpoint and every
    * later round is a no-op) — which keeps the operator deterministic
    * and oracle-replayable at ANY scale even where the fixpoint needs
    * more rounds; at gate scale `rounds` = observed fixpoint + 2
    * (KCore spec proves fixpoint on planted graphs and pins bounded ==
    * unbounded there). Returns survivors with their core-subgraph
    * degrees.
    *
    * Scale shape: each round is two semi-joins of the edge set against
    * the (shrinking, AQE-broadcastable) alive set plus one map-side-
    * combinable degree count — O(rounds) shuffles, never a vertex×vertex
    * product; per-round lineage cut via eager checkpoint of the
    * (vertex-sized) alive set, the w07/w08 iterative-family discipline.
    * At 100 TB the same loop runs peel-to-fixpoint with the count as the
    * convergence probe, alive checkpointed to a bucketed table. */
  def kCore(s: SparkSession, edgeSet: DataFrame, k: Int, rounds: Int): DataFrame = {
    val edges = edgeSet.cache()
    def inducedEndpoints(alive: DataFrame): DataFrame = {
      val induced = edges
        .join(alive.select(col("p").as("u")), Seq("u"), "left_semi")
        .join(alive.select(col("p").as("v")), Seq("v"), "left_semi")
      induced.select(col("u").as("p")).unionAll(induced.select(col("v").as("p")))
    }
    var alive = edges.select(col("u").as("p")).unionAll(edges.select(col("v").as("p")))
      .distinct().localCheckpoint(true)
    var aliveCount = alive.count()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val next = inducedEndpoints(alive)
        .groupBy(col("p")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("p"))
        .localCheckpoint(true)
      val nextCount = next.count()
      // next ⊆ alive (membership requires surviving the induced-degree
      // test), so equal counts mean equal sets: fixpoint
      converged = nextCount == aliveCount
      alive = next
      aliveCount = nextCount
      r += 1
    }
    val out = inducedEndpoints(alive)
      .groupBy(col("p")).agg(count(lit(1)).as("core_degree"))
      .select(col("p").as("part_key"), col("core_degree"))
      .orderBy(col("part_key"))
      .localCheckpoint(true)
    edges.unpersist()
    out
  }

  /** Gate constants: k=80 peels 143 of the 2000 sf0.01 co-purchase
    * vertices through a 6-round cascade (neither ~all nor empty — the
    * robust regime the near-regular graph admits); rounds=8 = fixpoint+2. */
  private val KCoreK = 80
  private val KCoreRounds = 8

  def kCoreQuery(s: SparkSession, dir: String): DataFrame =
    kCore(s, copurchaseEdges(s, dir), KCoreK, KCoreRounds)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b16_degree_hist" -> ((s, dir) => degreeHistogram(s, dir)),
    "b16_triangles" -> ((s, dir) => triangleParticipation(s, dir)),
    "b16_kcore" -> (kCoreQuery _),
  )

  /** Oracle uses the naive u<v orientation — the triangle SET is
    * orientation-invariant, so the per-part counts hash-match while the
    * Spark plan keeps the degree-oriented shape that survives hubs. */
  val oracles: Map[String, String] = Map(
    "b16_degree_hist" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT DISTINCT a.pk AS u, b.pk AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      degs AS (SELECT p, COUNT(*) AS degree FROM (
                 SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges)
               GROUP BY p)
      SELECT degree, COUNT(*) AS n_parts FROM degs GROUP BY degree ORDER BY degree
    """,
    "b16_triangles" -> """
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT DISTINCT a.pk AS u, b.pk AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM edges e1 JOIN edges e2 ON e1.v = e2.u
              JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      parts AS (SELECT unnest([a, b, c]) AS part_key FROM tri)
      SELECT part_key, COUNT(*) AS n_triangles FROM parts
      GROUP BY part_key ORDER BY n_triangles DESC, part_key LIMIT 20
    """,
    "b16_kcore" -> kCoreOracleSql,
  )

  /** Unrolled-CTE replay of the bounded peel (the w07_pagerank oracle
    * pattern): a0 = all vertices; a_t = vertices with induced degree ≥ k
    * among a_{t−1}. The early-exit in [[kCore]] is invisible to the
    * result — after the fixpoint every unrolled round is an identity. */
  private def kCoreOracleSql: String = {
    // AS MATERIALIZED (DuckDB + Postgres syntax): each a_t references
    // a_{t-1} four times, so default CTE inlining would expand 4^rounds
    // copies of the lineitem scan — materialization keeps the replay
    // linear in rounds, exactly like the engine's per-round checkpoint
    val peel = (1 to KCoreRounds).map { r =>
      s"""a$r AS MATERIALIZED (SELECT p FROM (
           SELECT p, COUNT(*) AS deg FROM (
             SELECT e.u AS p FROM edges e
               JOIN a${r - 1} x ON e.u = x.p JOIN a${r - 1} y ON e.v = y.p
             UNION ALL
             SELECT e.v AS p FROM edges e
               JOIN a${r - 1} x ON e.u = x.p JOIN a${r - 1} y ON e.v = y.p)
           GROUP BY p) WHERE deg >= $KCoreK)"""
    }.mkString(",\n      ")
    s"""
      WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v
                FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      a0 AS (SELECT u AS p FROM edges UNION SELECT v AS p FROM edges),
      $peel
      SELECT p AS part_key, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
        SELECT e.u AS p FROM edges e
          JOIN a$KCoreRounds x ON e.u = x.p JOIN a$KCoreRounds y ON e.v = y.p
        UNION ALL
        SELECT e.v AS p FROM edges e
          JOIN a$KCoreRounds x ON e.u = x.p JOIN a$KCoreRounds y ON e.v = y.p)
      GROUP BY p ORDER BY part_key"""
  }
}
