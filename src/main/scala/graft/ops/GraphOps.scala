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

  /** Distinct co-purchase edges with u < v. */
  private def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    li.select($"ok", $"pk".as("u"))
      .join(li.select($"ok", $"pk".as("v")), Seq("ok"))
      .where($"u" < $"v")
      .select($"u", $"v").distinct()
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
    * drive planted graphs through the exact production plan. */
  def trianglesOf(s: SparkSession, edgeSet: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    // edges feed degree + orientation; oriented feeds wedge gen (twice)
    // + the closing probe — cache each once, released by the caller's
    // between-query clearCache like the other self-joining pipelines
    val edges = edgeSet.cache()
    val deg = edges.select($"u".as("p")).unionAll(edges.select($"v".as("p")))
      .groupBy($"p").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select($"p".as("u"), $"deg".as("du")), "u")
      .join(deg.select($"p".as("v"), $"deg".as("dv")), "v")
    val fwd = ($"du" < $"dv") || ($"du" === $"dv" && $"u" < $"v")
    val oriented = withDeg.select(
      when(fwd, $"u").otherwise($"v").as("src"),
      when(fwd, $"v").otherwise($"u").as("dst"),
      when(fwd, $"dv").otherwise($"du").as("ddeg")).cache()
    // wedges from each source, dst pair ordered by the SAME (deg, id)
    // total order the orientation uses — so the closing edge, if present,
    // is oriented exactly (b -> c) and one equi-join finds it
    val e1 = oriented.select($"src", $"dst".as("b"), $"ddeg".as("db"))
    val e2 = oriented.select($"src", $"dst".as("c"), $"ddeg".as("dc"))
    val triangles = e1.join(e2, Seq("src"))
      .where(($"db" < $"dc") || ($"db" === $"dc" && $"b" < $"c"))
      .join(oriented.select($"src".as("b"), $"dst".as("c")), Seq("b", "c"))
      .select($"src".as("a"), $"b", $"c")
    triangles.select(explode(array($"a", $"b", $"c")).as("part_key"))
      .groupBy($"part_key").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"n_triangles".desc, $"part_key")
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b16_degree_hist" -> ((s, dir) => degreeHistogram(s, dir)),
    "b16_triangles" -> ((s, dir) => triangleParticipation(s, dir)),
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
  )
}
