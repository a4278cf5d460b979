package graft.similarity

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2 B12/B14 extension surface).
  *
  * Numeric determinism: embeddings are quantized to integer milliunits
  * (`round(x*1000)`) so dot products and norms are EXACT integer sums —
  * order-independent and bit-identical across engines; the final cosine is
  * a single deterministic double expression. This is what makes top-k
  * hash-comparable against the DuckDB oracle.
  *
  * Scale shape: queries are broadcast; the corpus is scanned
  * partition-parallel; per-query top-k runs as one window over
  * (query_id) partitions. An LSH sign-bucket variant bounds the
  * candidate set for corpus×corpus workloads.
  */
object Similarity {

  /** Quantize a float array column to long milliunits. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[graft.functions.DotProductQ]] expression (one fused loop,
    * no intermediate zipped array; see its scaladoc). */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.DotProductQ(a, b)

  /** Higher-order-function formulation of [[dotQ]] — identical semantics
    * (property-tested in DotProductQSpec), kept as the measurement
    * baseline for the native expression. */
  def dotQHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Deterministic cosine similarity of two quantized vectors. */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Quantized vectors with precomputed norms: every pairwise cosine then
    * costs ONE dot product instead of three (norms are per-vector, not
    * per-pair). `sqrt(exact-int)` stored once is bit-identical to
    * recomputing it per pair, so results don't change. */
  def quantizedWithNorm(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), quantize(col("embedding")).as("q"))
      .withColumn("norm", sqrt(dotQ(col("q"), col("q")).cast("double")))

  /** Cosine from a pair's dot product and the two precomputed norms —
    * the identical double expression as [[cosineQ]]. */
  def cosinePre(qa: Column, qb: Column, normA: Column, normB: Column): Column =
    dotQ(qa, qb).cast("double") / (normA * normB)

  /** B12: cosine between consecutive vec pairs — the exact kernel,
    * oracle-checkable. */
  def cosinePairs(s: SparkSession, dir: String): DataFrame = {
    val e = quantizedWithNorm(Tables.embeddings(s, dir))
    val a = e.toDF("a", "qa", "na")
    val b = e.toDF("b", "qb", "nb")
    a.join(b, col("b") === col("a") + 1)
      .select(col("a"), col("b"),
        dotQ(col("qa"), col("qb")).as("dot"),
        cosinePre(col("qa"), col("qb"), col("na"), col("nb")).as("cosine"))
      .orderBy(col("a"))
  }

  /** Hard ceiling on the broadcast query-set size for [[bruteForceTopK]].
    * At ~(4 + 8·dims) bytes per quantized vector, 100k 64-dim queries is
    * ≈52 MB — the most a forced broadcast should ever carry. */
  val MaxBroadcastQueries = 100000L

  /** B12: brute-force top-k neighbors for a query subset — broadcast the
    * queries, scan the corpus once, window for top-k. The exact baseline
    * every ANN variant is measured against — a recall yardstick, NOT the
    * scale path (cost is |corpus|×|queries|): use [[lshNearNeighbors]] or
    * [[ivfTopK]] for large query sets. The broadcast is size-guarded so a
    * misuse fails fast instead of OOMing the driver. */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int = 10): DataFrame = {
    val e = quantizedWithNorm(embeddings).cache()
    val queries = e.filter(queryPred).toDF("query_id", "qq", "qnorm")
    val nQueries = queries.count()
    require(nQueries <= MaxBroadcastQueries,
      s"bruteForceTopK: $nQueries query vectors exceed the broadcast ceiling " +
        s"($MaxBroadcastQueries); use ivfTopK/lshNearNeighbors for corpus-scale query sets")
    val joined = e.toDF("vec_id", "qv", "vnorm")
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("qq"), col("qv"), col("qnorm"), col("vnorm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    // checkpoint the (|queries|×k)-row result and release the corpus
    // cache this function registered — per-call hygiene, same pattern as
    // minHashNearDup
    val top = joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .localCheckpoint(true)
    e.unpersist()
    top.orderBy(col("query_id"), col("rn"))
  }

  def annTopKQuery(s: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(s, dir), col("vec_id") % 100 === 0)

  /** Deterministic pseudo-random hyperplane component for LSH: a hash of
    * (plane, dim) mapped to [-0.5, 0.5). No RNG state — reproducible on
    * any cluster. */
  private def planeComponent(plane: Int, d: Column): Column =
    (pmod(xxhash64(lit(plane), d), lit(1000)).cast("double") / 1000.0) - 0.5

  /** Sign-bit LSH bucket id from `numPlanes` deterministic hyperplanes. */
  def lshBucket(vec: Column, numPlanes: Int = 8): Column = {
    val dims = sequence(lit(0), size(vec) - 1)
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(vec, dims, (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1), p)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** B12 scale path: LSH-bucketed ANN — corpus×corpus near-neighbor pairs
    * restricted to same-bucket candidates (an equi-join on bucket, never an
    * all-pairs product). Approximate by construction; recall is tested
    * against [[bruteForceTopK]]. */
  def lshNearNeighbors(embeddings: DataFrame, numPlanes: Int = 8,
                       minCosine: Double = 0.3): DataFrame = {
    // bucket assignment is the expensive expression and feeds a self-join:
    // materialize it once instead of evaluating per join side
    val e = embeddings
      .select(col("vec_id"), quantize(col("embedding")).as("q"),
        lshBucket(col("embedding"), numPlanes).as("bucket"))
      .withColumn("norm", sqrt(dotQ(col("q"), col("q")).cast("double")))
      .cache()
    val a = e.toDF("a", "qa", "bucket", "na")
    val b = e.toDF("b", "qb", "bucket", "nb")
    // post-threshold pair set is the (small) output — checkpoint it and
    // release the bucketed-corpus cache (per-call hygiene)
    val pairs = a.join(b, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosinePre(col("qa"), col("qb"), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .localCheckpoint(true)
    e.unpersist()
    pairs.orderBy(col("a"), col("b"))
  }

  def lshQuery(s: SparkSession, dir: String): DataFrame =
    lshNearNeighbors(Tables.embeddings(s, dir))

  /** B12 scale path #2 — IVF (inverted-file) ANN: partition the corpus
    * into cells around deterministic hash-chosen centroid vectors, then
    * search only the query's `nprobe` closest cells. Assignment and probe
    * are broadcast joins against the (tiny) centroid set; the corpus is
    * scanned once — the classic trade of recall for a 1/cells scan
    * fraction.
    */
  def ivfTopK(embeddings: DataFrame, queryPred: Column, numCells: Int = 16,
              nprobe: Int = 4, k: Int = 10): DataFrame = {
    val e = quantizedWithNorm(embeddings).cache()
    // deterministic centroids: the numCells vectors whose id hash is
    // smallest — a reproducible pseudo-random sample of the corpus
    val centroids = e
      .withColumn("__h", xxhash64(col("vec_id")))
      .orderBy(col("__h")).limit(numCells)
      .select(col("vec_id").as("cell_id"), col("q").as("cq"), col("norm").as("cnorm"))
    val bc = broadcast(centroids)
    // invert: each corpus vector → its single closest cell. A max_by
    // aggregate (one partial-combining hash agg) instead of a
    // row_number window saves a full sort exchange over the corpus;
    // the (sim, -cell_id) struct key reproduces the window's
    // (sim DESC, cell_id ASC) tie-break exactly.
    val assigned = e.crossJoin(bc)
      .select(col("vec_id"), col("q"), col("norm"), col("cell_id"),
        cosinePre(col("q"), col("cq"), col("norm"), col("cnorm")).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cell_id"), col("q"), col("norm")),
        struct(col("sim"), (-col("cell_id")).as("neg"))).as("best"))
      .select(col("vec_id"), col("best.q").as("q"), col("best.norm").as("norm"),
        col("best.cell_id").as("cell_id"))
    // queries probe their nprobe closest cells
    val qw = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell_id"))
    val probes = e.filter(queryPred).toDF("query_id", "qq", "qnorm").crossJoin(bc)
      .select(col("query_id"), col("qq"), col("qnorm"), col("cell_id"),
        cosinePre(col("qq"), col("cq"), col("qnorm"), col("cnorm")).as("sim"))
      .withColumn("rn", row_number().over(qw)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qq"), col("qnorm"), col("cell_id"))
    // search only within probed cells (equi-join on cell_id)
    val cand = probes.join(assigned, Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("qq"), col("q"), col("qnorm"), col("norm")).as("cosine"))
    val tw = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    // (|queries|×k)-row result: checkpoint, then release the corpus cache
    val top = cand.withColumn("rn", row_number().over(tw)).filter(col("rn") <= k)
      .localCheckpoint(true)
    e.unpersist()
    top.orderBy(col("query_id"), col("rn"))
  }

  def ivfQuery(s: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.embeddings(s, dir), col("vec_id") % 100 === 0)

  /** B12: embedding-cosine near-dup CLUSTERS — the embedding-space
    * counterpart of `Dedup.dedupClustersAtScale`, completing the near-dup
    * family across both representations (token shingles AND embeddings):
    * candidate pairs from sign-LSH buckets ([[lshNearNeighbors]]), exact
    * quantized-cosine verification at `minCosine`, min-label connected
    * components over the verified edges, component-minimum as the
    * canonical representative. Cost is LSH-candidate-bounded — never an
    * all-pairs product — and recall is bucket-collision-bounded exactly
    * like the MinHash path; every emitted edge is exact-verified.
    * Production threshold ≈0.9-0.95 (semantic duplicates); the driver
    * query runs 0.35 because the synthetic embeddings corpus has no
    * planted near-dups (max pairwise cosine ≈0.51 at sf0.01).
    * Rows-only under the driver gate (sign-LSH planes are engine
    * hashes); clustering semantics pinned in SimilaritySpec. */
  def embedNearDupClusters(embeddings: DataFrame, numPlanes: Int = 8,
                           minCosine: Double = 0.95): DataFrame = {
    val edges = lshNearNeighbors(embeddings, numPlanes, minCosine)
      .select(col("a"), col("b"))
    graft.dedup.Dedup.connectedComponents(edges)
      .select(col("u").as("vec_id"), col("label").as("cluster_rep"))
      .orderBy(col("vec_id"))
  }

  def embedNearDupQuery(s: SparkSession, dir: String): DataFrame =
    embedNearDupClusters(Tables.embeddings(s, dir), minCosine = 0.35)

  /** B12: per-label embedding centroids — the aggregate behind k-means
    * assignment refresh, cluster summarization, and class prototypes.
    * posexplode turns each vector into (pos, component) rows, then ONE
    * partial-combining hash aggregate per (label, pos) computes the mean —
    * fully map-side combinable, shuffle volume = |labels|·dims rows
    * regardless of corpus size. Components are quantized to integer
    * milliunits first so the sums are exact (float summation order would
    * differ between engines); the mean is one final double division. */
  def labelCentroidsOn(embeddings: DataFrame): DataFrame = {
    val e = embeddings
      .select(col("label"), posexplode(quantize(col("embedding"))))
      .toDF("label", "pos", "qv")
    e.groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("sum_q"))
      .withColumn("centroid_milli", col("sum_q").cast("double") / col("n"))
      .orderBy(col("label"), col("pos"))
  }

  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    labelCentroidsOn(Tables.embeddings(s, dir))

  /** B12: deterministic k-means corpus clustering (Lloyd) — the mixture/
    * domain-balancing step of a training-data pipeline. Everything stays
    * in quantized integer space: init = the k vectors with the smallest
    * id hash (reproducible pseudo-random sample, as in [[ivfTopK]]); each
    * iteration is ONE broadcast cosine assignment (`max_by` with the
    * (sim, -cid) tie-break — no window shuffle) and ONE centroid rebuild
    * (posexplode → exact integer mean per (cid, pos) → re-quantize to
    * milliunits), so an iteration costs two map-side-combinable shuffles
    * regardless of corpus size and the centroid set is always broadcast.
    * Cells that lose all members drop out (k can shrink); no RNG, no
    * driver-side vectors. Iterative float-free ⇒ bit-stable across runs,
    * but not ANSI-SQL-expressible → rows-only driver check + spec. */
  def kMeans(embeddings: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val e = quantizedWithNorm(embeddings).cache()
    // seeds: the k DISTINCT vectors with the smallest content hash —
    // distinct first, or duplicate-heavy corpora could seed identical
    // centroids that immediately collapse into one cell. The content
    // hash doubles as the stable cluster id.
    var centroids = e.select(col("q")).distinct()
      .withColumn("cid", xxhash64(col("q")))
      .orderBy(col("cid")).limit(k)
      .select(col("cid"), col("q").as("cq"),
        sqrt(dotQ(col("q"), col("q")).cast("double")).as("cnorm"))
    // zero-norm vectors (all components quantize to 0) have no cosine —
    // under ANSI mode the division even THROWS. Guard the denominator:
    // sim = -1 deterministically lands them in the smallest-cid cell
    // (max_by tie-break) instead of failing the whole clustering
    def assign(cs: DataFrame): DataFrame = e.crossJoin(broadcast(cs))
      .select(col("vec_id"), col("q"), col("norm"), col("cid"),
        when(col("norm") * col("cnorm") === 0.0d, lit(-1.0d))
          .otherwise(cosinePre(col("q"), col("cq"), col("norm"), col("cnorm")))
          .as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("sim")),
        struct(col("sim"), (-col("cid")).as("neg"))).as("best"),
        first(col("q")).as("q"), first(col("norm")).as("norm"))
      .select(col("vec_id"), col("q"), col("norm"),
        col("best.cid").as("cid"), col("best.sim").as("sim"))
    // centroid recompute = ONE map-side-combinable shuffle: the
    // single-buffer VecSumAgg sums vectors element-wise per cell (vs
    // posexplode + per-(cid,pos) agg + array reassembly = dims x rows
    // through two shuffles)
    val vsum = udaf(new graft.functions.VecSumAgg)
    for (_ <- 1 to iters) {
      val recomputed = assign(centroids)
        .groupBy(col("cid"))
        .agg(vsum(col("q")).as("s"), count(lit(1)).as("n"))
        .select(col("cid"),
          transform(col("s"), v =>
            round(v.cast("double") / col("n")).cast("long")).as("cq"))
        .withColumn("cnorm", sqrt(dotQ(col("cq"), col("cq")).cast("double")))
      // eager lineage cut: without it every iteration re-analyzes the
      // whole preceding chain and planning cost grows superlinearly in
      // iters; the checkpoint materializes only k centroid rows
      centroids = recomputed.localCheckpoint(true)
    }
    // release the corpus cache this function registered: the loop (the
    // cache's heavy consumer — iters+1 assignment passes) has fully
    // materialized via the per-iteration checkpoints; the final lazy
    // assignment recomputes the scan-side quantize projection exactly
    // once. A per-batch caller must not accumulate one cached corpus per
    // kMeans call.
    val out = assign(centroids)
      .select(col("vec_id"), col("cid").as("cluster_id"), col("sim"))
      .orderBy(col("vec_id"))
    e.unpersist()
    out
  }

  def kMeansQuery(s: SparkSession, dir: String): DataFrame =
    kMeans(Tables.embeddings(s, dir))

  // ---------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b12_embed_neardup" -> (embedNearDupQuery _),
    "b12_kmeans" -> (kMeansQuery _),
    "b12_centroids" -> (labelCentroids _),
    "b12_cosine_pairs" -> (cosinePairs _),
    "b12_ann_topk" -> (annTopKQuery _),
    "b12_ann_lsh" -> (lshQuery _),
    "b12_ann_ivf" -> (ivfQuery _),
  )

  private val Q = "list_transform(CAST(%s AS DOUBLE[]), x -> CAST(round(x*1000) AS BIGINT))"
  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]))"

  val oracles: Map[String, String] = Map(
    "b12_centroids" -> """
      WITH q AS (
        SELECT label,
          CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
          CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
        FROM embeddings)
      SELECT label, pos, COUNT(*) AS n, CAST(SUM(qv) AS BIGINT) AS sum_q,
        CAST(SUM(qv) AS DOUBLE) / COUNT(*) AS centroid_milli
      FROM q GROUP BY label, pos ORDER BY label, pos""",
    "b12_cosine_pairs" -> s"""
      WITH e AS (SELECT vec_id, ${Q.format("embedding")} AS q FROM embeddings),
      p AS (SELECT a.vec_id AS a, b.vec_id AS b, a.q AS qa, b.q AS qb
            FROM e a JOIN e b ON b.vec_id = a.vec_id + 1)
      SELECT a, b,
        CAST(${dotSql("qa", "qb")} AS BIGINT) AS dot,
        CAST(${dotSql("qa", "qb")} AS DOUBLE)
          / (sqrt(CAST(${dotSql("qa", "qa")} AS DOUBLE)) * sqrt(CAST(${dotSql("qb", "qb")} AS DOUBLE))) AS cosine
      FROM p ORDER BY a""",
    "b12_ann_topk" -> s"""
      WITH e AS (SELECT vec_id, ${Q.format("embedding")} AS q FROM embeddings),
      qs AS (SELECT vec_id AS query_id, q AS qq FROM e WHERE vec_id % 100 = 0),
      sims AS (SELECT query_id, e.vec_id,
        CAST(${dotSql("qq", "q")} AS DOUBLE)
          / (sqrt(CAST(${dotSql("qq", "qq")} AS DOUBLE)) * sqrt(CAST(${dotSql("q", "q")} AS DOUBLE))) AS cosine
        FROM e JOIN qs ON e.vec_id <> qs.query_id)
      SELECT query_id, vec_id, cosine, rn FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, vec_id) AS INT) AS rn FROM sims)
      WHERE rn <= 10 ORDER BY query_id, rn""",
  )
}
