package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, RLike}

/** Library entry point for `spark.sql.extensions=graft.GraftExtensions`:
  * injects graft's expression-backed SQL functions into every session the
  * cluster creates — no driver-side `Register.registerAll` call needed, so
  * pure-SQL users (thrift server, SQL gateway, notebooks) get the function
  * surface from config alone.
  *
  * Scope notes: the DSv2 source registers separately via the
  * `DataSourceRegister` service file (`spark.read.format("graft-bindings")`),
  * and the two demo UDF/UDAFs stay in [[graft.functions.Register]] —
  * runtime-registered UDFs are session-state objects, not Catalyst function
  * builders, so `injectFunction` is not their path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // O(n²) hamming-distance joins re-plan to pigeonhole equi-joins
    ext.injectOptimizerRule(plans.HammingJoinRewrite)
    // pure interval joins re-plan to binned equi-joins (opt-in bin width)
    ext.injectOptimizerRule(plans.RangeBinJoinRewrite)
    // plans the custom AsOfJoinPlan node into its sorted-merge exec
    ext.injectPlannerStrategy(plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  /** `(identifier, info, builder)` triples — the same builders back
    * [[graft.functions.Register]] so SQL-config and programmatic
    * registration cannot drift. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[graft.functions.RollingHash].getName, "rolling_hash"),
      exprs => graft.functions.RollingHash(exprs.head)),
    // same pattern constant as the Column-API gate Validate.uriValid; the
    // builder must be a resolved Catalyst expression (a Column→Expression
    // bridge would inject an Unevaluable ColumnNodeExpression)
    (FunctionIdentifier("uri_valid"),
      new ExpressionInfo(harvest.Validate.getClass.getName, "uri_valid"),
      exprs => RLike(exprs.head, Literal(harvest.Validate.UriPattern))),
    // exact integer dot product of quantized vectors (the ANN kernel)
    (FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[graft.functions.DotProductQ].getName, "dot_q"),
      exprs => { arity("dot_q", exprs, 2)
        graft.functions.DotProductQ(exprs(0), exprs(1)) }),
    // merge-intersection of two SORTED long arrays (the triangle kernel;
    // caller contract: ascending, non-null elements)
    (FunctionIdentifier("sorted_intersect"),
      new ExpressionInfo(classOf[graft.functions.SortedIntersect].getName, "sorted_intersect"),
      exprs => { arity("sorted_intersect", exprs, 2)
        graft.functions.SortedIntersect(exprs(0), exprs(1)) }),
    // per-row document sketches (shuffle-free dedup kernels)
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      exprs => { arity("simhash64", exprs, 1)
        graft.functions.SimHash64(exprs.head) }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      exprs => { arity("minhash_sig", exprs, 1)
        graft.functions.MinHashSig(exprs.head) }),
    (FunctionIdentifier("top_bigram_count"),
      new ExpressionInfo(classOf[graft.functions.TopBigramCount].getName, "top_bigram_count"),
      exprs => { arity("top_bigram_count", exprs, 1)
        graft.functions.TopBigramCount(exprs.head) }),
    // engine-portable md5-prefix integer hash (fused conv∘substring∘md5);
    // the prefix width must be a literal int — it is part of the hash
    // CONTRACT (which oracle formulation the value matches), not data
    (FunctionIdentifier("md5_prefix"),
      new ExpressionInfo(classOf[graft.functions.Md5Prefix].getName, "md5_prefix"),
      exprs => { arity("md5_prefix", exprs, 2)
        exprs(1) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
            graft.functions.Md5Prefix(exprs(0), v)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "md5_prefix (hexDigits must be an INT literal)",
              "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
              "docroot" -> ""))
        } }),
    // gcd of two longs (Euclid) — the reduced-fraction canonicalizer
    // behind exact-rational ordering (Theil-Sen median slope)
    (FunctionIdentifier("long_gcd"),
      new ExpressionInfo(classOf[graft.functions.LongGcd].getName, "long_gcd"),
      exprs => { arity("long_gcd", exprs, 2)
        graft.functions.LongGcd(exprs(0), exprs(1)) }),
  )

  /** Wrong-arity SQL calls must surface as analysis errors, not
    * IndexOutOfBounds from the builder (and extra args must not be
    * silently dropped). */
  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> exprs.length.toString, "docroot" -> ""))
}
