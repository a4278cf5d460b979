package graft.ops

import graft.{SparkSpec, Tables}

/** Structural pins for the TPC-H compositional battery (exactness is
  * oracle-gated; these cross-check the correlated/gated shapes against
  * independent brute-force recomputations on the sf0.001 tables). */
class TpchQueriesSpec extends SparkSpec {

  private def lineitems = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_suppkey", "l_partkey", "l_quantity", "l_shipdate")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getAs[java.time.LocalDateTime](4)))

  private def orderDates = Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_orderdate").collect()
    .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap

  test("q4: per-priority counts sum to the brute-force late-order count") {
    val od = orderDates
    val lateOrders = lineitems.iterator
      .filter { case (ok, _, _, _, ship) =>
        od.contains(ok) && ship.isAfter(od(ok).plusDays(300)) }
      .map(_._1).toSet
    val total = TpchQueries.q4LatePriority(spark, sfDir).collect()
      .map(_.getLong(1)).sum
    assert(total === lateOrders.size)
  }

  test("q13: histogram weights sum to the customer count (zero bucket kept)") {
    val rows = TpchQueries.q13OrderDistribution(spark, sfDir).collect()
    val custs = Tables.customer(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === custs)
    // the non-'5-LOW' orders all land in some bucket
    val orders = Tables.orders(spark, sfDir)
      .filter("o_orderpriority <> '5-LOW'").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === orders)
  }

  test("q15: winners carry the global max revenue and ties are kept") {
    val sr = Tables.lineitem(spark, sfDir)
      .filter("l_shipdate >= TIMESTAMP_NTZ '1997-01-01' AND l_shipdate < TIMESTAMP_NTZ '1997-07-01'")
      .selectExpr("l_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(28,4)) AS rev")
      .groupBy("l_suppkey").sum("rev").collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val mx = sr.values.max
    val winners = TpchQueries.q15TopSupplier(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(winners === sr.filter(_._2 == mx).keySet)
  }

  test("q21: numwait matches the brute-force sole-late-supplier count") {
    val od = orderDates
    val perSupp = lineitems.groupBy(t => (t._1, t._2)).view.mapValues(_.exists {
      case (ok, _, _, _, ship) => ship.isAfter(od(ok).plusDays(120))
    }).toMap
    val byOrder = perSupp.groupBy(_._1._1)
    val brute = byOrder.valuesIterator
      .filter(m => m.size > 1 && m.count(_._2) == 1)
      .map(m => m.find(_._2).get._1._2)
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = TpchQueries.q21SoleLateSupplier(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val names = Tables.supplier(spark, sfDir).select("s_suppkey", "s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bruteTop = brute.toSeq.map { case (k, v) => names(k) -> v }
      .sortBy { case (n, w) => (-w, n) }.take(25).toMap
    assert(got === bruteTop)
  }

  test("q11: the value gate is exact — every kept part clears 1.5x the mean part value, no excluded part does") {
    val prices = Tables.lineitem(spark, sfDir)
      .selectExpr("l_partkey", "CAST(l_extendedprice AS DECIMAL(12,2)) AS p").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
    val byPart = prices.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = byPart.values.sum
    val kept = TpchQueries.q11ImportantParts(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val expect = byPart.filter { case (_, v) =>
      v * byPart.size * 2 > total * 3 }.keySet
    assert(kept === expect)
  }

  test("q16: excluded suppliers never count; q20: the promo gate matches brute force") {
    val excluded = Tables.supplier(spark, sfDir)
      .filter("s_acctbal < 0").collect().map(_.getLong(0)).toSet
    val sized = Tables.part(spark, sfDir)
      .filter("p_size IN (5, 15, 25, 35, 45)")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute16 = li.filter(t => sized.contains(t._1) && !excluded(t._2))
      .groupBy(t => sized(t._1)).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got16 = TpchQueries.q16SupplierCount(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got16 === brute16)

    val promo = Tables.part(spark, sfDir).filter("p_type = 'PROMO'")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val sp = li.filter(t => promo(t._1)).groupBy(_._2)
      .view.mapValues(_.map(_._3.toLong).sum).toMap
    val (tq, ns) = (sp.values.sum, sp.size)
    val brute20 = sp.filter { case (_, q) => q * ns * 10 > tq * 11 }
    val got20 = TpchQueries.q20PromoSuppliers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got20 === brute20)
  }

  test("q22: every dormant customer has no recent order and an above-average balance") {
    val recent = Tables.orders(spark, sfDir)
      .filter("o_orderdate >= TIMESTAMP_NTZ '2000-01-01'")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val bals = Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_nationkey", "CAST(c_acctbal AS DECIMAL(12,2)) AS b")
      .collect().map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
    val pos = bals.map(_._3).filter(_ > 0)
    val (sbal, cbal) = (pos.sum, pos.size)
    val expect = bals.filter { case (ck, _, b) => b * cbal > sbal && !recent(ck) }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = TpchQueries.q22DormantCustomers(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
