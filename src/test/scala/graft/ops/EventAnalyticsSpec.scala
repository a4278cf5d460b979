package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  // u1 completes the funnel in order; u2 performs all steps but the
  // purchase precedes the click (must stop at click); u3 only signs up.
  private def ev = Seq(
    (1L, ts(0), 1L, "signup"), (2L, ts(1), 1L, "view"),
    (3L, ts(2), 1L, "click"), (4L, ts(3), 1L, "purchase"),
    (5L, ts(0), 2L, "signup"), (6L, ts(1), 2L, "view"),
    (7L, ts(2), 2L, "purchase"), (8L, ts(3), 2L, "click"),
    (9L, ts(0), 3L, "signup"),
  ).toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: earliest-qualifying chain, out-of-order steps stop the user (B10)") {
    val rows = EventAnalytics.funnel(ev).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq === Seq(
      (1, "signup", 3L), (2, "view", 2L), (3, "click", 2L), (4, "purchase", 1L)))
    assert(rows.last._4 === 1.0 / 3.0) // pct_of_first is vs step 1
  }

  test("funnel: a purchase at the exact click timestamp does not count (strict after)") {
    val d = Seq(
      (1L, ts(0), 1L, "signup"), (2L, ts(1), 1L, "view"),
      (3L, ts(2), 1L, "click"), (4L, ts(2), 1L, "purchase"),
    ).toDF("event_id", "ts", "user_id", "event_type")
    val byStep = EventAnalytics.funnel(d).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(byStep("click") === 1L && byStep("purchase") === 0L)
  }

  test("transitions: per-user lag pairs, cross-user boundaries excluded (B10)") {
    val t = EventAnalytics.transitions(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(t(("signup", "view")) === 2L)     // u1, u2
    assert(t(("view", "click")) === 1L)      // u1
    assert(t(("view", "purchase")) === 1L)   // u2
    assert(t(("purchase", "click")) === 1L)  // u2
    // u3's lone signup and cross-user adjacencies contribute nothing
    assert(t.values.sum === 6L)
  }

  test("resample+ffill: daily grid spans first..last, gaps carry the last observation (B06)") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "view", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "view", 20.0), // later same day wins
      (3L, Timestamp.valueOf("2024-01-04 09:00:00"), 1L, "view", 40.0), // 2-day gap filled with 20.0
      (4L, Timestamp.valueOf("2024-01-02 09:00:00"), 2L, "view", 7.0),  // single-day user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.resampleFfill(d).collect()
      .map(x => ((x.getLong(0), x.getAs[java.time.LocalDateTime](1).toLocalDate.toString), x.getDouble(2)))
    assert(r.toSeq === Seq(
      (1L, "2024-01-01") -> 20.0, (1L, "2024-01-02") -> 20.0,
      (1L, "2024-01-03") -> 20.0, (1L, "2024-01-04") -> 40.0,
      (2L, "2024-01-02") -> 7.0))
  }

  test("interpolation: gap cells take the exact milli-cent line between neighbors (B06, r7)") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "view", 1.00),
      (2L, Timestamp.valueOf("2024-01-05 09:00:00"), 1L, "view", 3.00), // 3-day gap: 1.50/2.00/2.50
      (3L, Timestamp.valueOf("2024-01-02 09:00:00"), 2L, "view", 7.00), // single-day user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.resampleInterp(d).collect()
      .map(x => ((x.getLong(0), x.getAs[java.time.LocalDateTime](1).toLocalDate.toString),
        (x.getLong(2), x.getInt(3))))
    assert(r.toSeq === Seq(
      (1L, "2024-01-01") -> ((100000L, 1)),
      (1L, "2024-01-02") -> ((150000L, 0)),
      (1L, "2024-01-03") -> ((200000L, 0)),
      (1L, "2024-01-04") -> ((250000L, 0)),
      (1L, "2024-01-05") -> ((300000L, 1)),
      (2L, "2024-01-02") -> ((700000L, 1))))
  }

  test("weighted median: the pick is the smallest value whose cumulative weight reaches half (B04, r7)") {
    // brute-force the same contract over the sf0.001 table
    val got = Relational.weightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c",
        "CAST(l_quantity AS BIGINT) AS q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val brute = rows.groupBy(_._1).map { case (flag, xs) =>
      val total = xs.map(_._3).sum
      val byPrice = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val cum = byPrice.scanLeft(0L)(_ + _._2).tail
      val idx = cum.indexWhere(_ * 2 >= total)
      flag -> ((byPrice(idx)._1, total))
    }
    assert(got === brute)
  }

  test("OHLC: open/close picked by event order, high/low/volume exact (B06, r7)") {
    val d = Seq(
      (3L, Timestamp.valueOf("2024-01-01 15:00:00"), 1L, "view", 2.50), // close
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "view", 1.00), // open
      (2L, Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "view", 9.00), // high
      (4L, Timestamp.valueOf("2024-01-02 09:00:00"), 1L, "view", 7.00), // next day
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.ohlcResample(d).collect()
      .map(x => (x.getLong(0), x.getAs[java.time.LocalDateTime](1).toLocalDate.toString,
        x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(r.toSeq === Seq(
      (1L, "2024-01-01", 100L, 900L, 100L, 250L, 3L, 1250L),
      (1L, "2024-01-02", 700L, 700L, 700L, 700L, 1L, 700L)))
  }

  test("mode: highest count wins, smallest value on ties — brute-forced (B04, r7)") {
    val got = Relational.modeQuantity(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = graft.Tables.lineitem(spark, sfDir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS BIGINT) AS q").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val brute = rows.groupBy(_._1).map { case (f, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.sortBy { case (q, c) => (-c, q) }.head
      f -> ((best._1, best._2))
    }
    assert(got === brute)
  }

  test("A/B readout: variant counts, exact ppb rates, hand-computed z on a planted fixture (B10, r7)") {
    // users 1..20 assigned by the Knuth hash; plant conversions (value
    // 250 purchase) for a chosen subset and verify against brute force
    val ts0 = Timestamp.valueOf("2024-01-01 09:00:00")
    val converters = Set(1L, 2L, 3L, 4L, 5L)
    val rows = (1L to 20L).flatMap { u =>
      Seq((u * 10, ts0, u, "view", 10.0)) ++
        (if (converters(u)) Seq((u * 10 + 1, ts0, u, "purchase", 250.0))
         else Seq((u * 10 + 1, ts0, u, "purchase", 50.0)))
    }
    val d = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.abTest(d).collect()(0)
    val isA = (u: Long) => (u * 2654435761L) % 100 < 50
    val (na, nb) = ((1L to 20L).count(isA), (1L to 20L).count(!isA(_)))
    val (ca, cb) = (converters.count(isA), converters.count(!isA(_)))
    assert((r.getLong(0), r.getLong(3)) === ((na.toLong, nb.toLong)))
    assert((r.getLong(1), r.getLong(4)) === ((ca.toLong, cb.toLong)))
    assert(r.getLong(2) === 1000000000L * ca / na)
    assert(r.getLong(5) === 1000000000L * cb / nb)
    val p = (ca + cb).toDouble / (na + nb)
    val z = (ca.toDouble / na - cb.toDouble / nb) /
      math.sqrt(p * (1.0 - p) * (1.0 / na + 1.0 / nb))
    assert(r.getDouble(6) === z)
  }

  test("resample+ffill: same-timestamp tie breaks by event_id via the string key (B06)") {
    val ts0 = Timestamp.valueOf("2024-01-01 09:00:00")
    val d = Seq(
      (5L, ts0, 1L, "view", 1.0), (9L, ts0, 1L, "view", 2.0), (7L, ts0, 1L, "view", 3.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.resampleFfill(d).collect().map(_.getDouble(2))
    assert(r.toSeq === Seq(2.0)) // event_id 9 is the max key
  }

  test("retention: users cohorted by first-activity day, distinct per day (B10)") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1L, "view"),
      (2L, Timestamp.valueOf("2024-01-01 23:00:00"), 1L, "click"), // same day: one hit
      (3L, Timestamp.valueOf("2024-01-03 09:00:00"), 1L, "view"),  // day_offset 2
      (4L, Timestamp.valueOf("2024-01-02 09:00:00"), 2L, "view"),  // later cohort
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = EventAnalytics.retention(d).collect()
      .map(x => ((x.getAs[java.time.LocalDateTime](0).toString, x.getInt(1)), x.getLong(2))).toMap
    assert(r === Map(
      ("2024-01-01T00:00", 0) -> 1L,
      ("2024-01-01T00:00", 2) -> 1L,
      ("2024-01-02T00:00", 0) -> 1L))
  }

  test("ewma: hand-computed 8-tap fixture (B6)") {
    // one user, values 1..9 dollars at minute intervals. First emission at
    // the 8th event: num = 64·800 + 32·700 + 16·600 + 8·500 + 4·400 +
    // 2·300 + 1·200 + 1·100 = 89700 → 89700/12800 = 7.0078125
    val d = (1 to 9).map(i => (i.toLong,
      Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"), 1L, "view", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.ewmaTrunc(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out.keySet === Set(8L, 9L))
    assert(out(8L) === 89700.0 / 12800)
    // at event 9 the window slides one step: 64·900+32·800+16·700+8·600+
    // 4·500+2·400+1·300+1·200 = 102500
    assert(out(9L) === 102500.0 / 12800)
  }

  test("time-weighted average: hand-computed interval weighting (B6)") {
    // user 1: $1 held 1 min, $3 held 3 min, $10 tail (no successor, no
    // weight) → TWA = (100·60e6 + 300·180e6)/(240e6 us) = 250 cents
    // user 2: single event — no interval, excluded
    // user 3: two events at the SAME instant — held_us 0, excluded
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Int) = new Timestamp(t0.getTime + sec * 1000L)
    val d = Seq(
      (1L, at(0), 1L, "v", 1.0), (2L, at(60), 1L, "v", 3.0),
      (3L, at(240), 1L, "v", 10.0),
      (4L, at(0), 2L, "v", 5.0),
      (5L, at(7), 3L, "v", 2.0), (6L, at(7), 3L, "v", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.timeWeightedAvg(d).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L))
    assert(out(1L) === ((2L, 240000000L, 250000L)))
    // a plain average would say (1+3+10)/3 ≈ 4.67 — interval weighting
    // must NOT equal it
    assert(out(1L)._3 !== 4667L * 100)
  }

  test("rfm: quintiles rank 10 planted users deterministically (B10)") {
    // users 1..10: user i purchases i times, $i each, last at minute i —
    // all three metrics rank users in id order, so ntile(5) puts
    // {1,2}->1, {3,4}->2, …, {9,10}->5 on every axis
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val d = (1 to 10).flatMap { u =>
      (1 to u).map { k =>
        ((u * 100 + k).toLong, new Timestamp(t0.getTime + (u * 60 + k) * 1000L),
          u.toLong, "purchase", u.toDouble)
      }
    } :+ ((9999L, t0, 3L, "view", 500.0)) // non-purchase: ignored entirely
    val out = EventAnalytics.rfm(d.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(7)))).toMap
    assert(out.keySet === (1L to 10L).toSet)
    (1 to 10).foreach { u =>
      val q = (u + 1) / 2
      assert(out(u.toLong) === ((u.toLong, u.toLong * u * 100, q * 111L)),
        s"user $u")
    }
  }

  test("attribution conserves money: shares sum to purchase cents exactly (B10)") {
    // real corpus: every attributed purchase's integer shares must sum to
    // its exact cents — the no-float-splits contract — and the U-shape
    // must hold where n >= 3 (first == last == 40% floor)
    val ev = graft.Tables.events(spark, sfDir)
    val out = EventAnalytics.attribution(ev).collect()
    assert(out.nonEmpty)
    val cents = ev.filter($"event_type" === "purchase")
      .select($"event_id", ($"value".cast("decimal(12,2)") * 100).cast("long"))
      .as[(Long, Long)].collect().toMap
    for ((pid, rows) <- out.groupBy(_.getLong(0))) {
      assert(rows.map(_.getLong(4)).sum === cents(pid), s"purchase $pid shares != cents")
      val n = rows.head.getLong(3)
      if (n >= 3) {
        val byRank = rows.map(r => r.getInt(1) -> r.getLong(4)).toMap
        assert(byRank(1) === cents(pid) * 40 / 100 && byRank(n.toInt) === cents(pid) * 40 / 100)
      }
    }
  }

  test("mad outliers: hand fixture — robust to the whale that breaks z-scores (B10)") {
    // type A: a 9.80..10.60 ladder plus one 500.00 whale. Cents
    // [980,990,...,1060, 50000]: lower median = 1020 (cum 5 ≥ 10/2);
    // deviations [40,30,20,10,0,10,20,30,40,48980] → distinct-dev cum
    // hits 5 at dev 20 → MAD = 20. Whale dev 48980 > 8·20 → flagged;
    // the ladder (dev ≤ 40 ≤ 160) is not. A stddev gate would put
    // σ ≈ 14700 and flag NOTHING (48980 < 8σ).
    val rows = (1 to 9).map(i => (i.toLong, "A", 9.70 + 0.10 * i)) :+ (10L, "A", 500.00)
    val df = rows.toDF("event_id", "event_type", "value")
    val out = EventAnalytics.madOutliers(df).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 10L && r.getLong(2) === 50000L &&
      r.getLong(3) === 1020L && r.getLong(4) === 20L && r.getLong(5) === 48980L)
    // MAD = 0 regime (constant bulk): only deviators flagged
    val const = ((1 to 8).map(i => (i.toLong, "B", 5.00)) :+ (9L, "B", 5.01))
      .toDF("event_id", "event_type", "value")
    val outB = EventAnalytics.madOutliers(const).collect()
    assert(outB.map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("whales: top slice ordered, shares exact, cumulative consistent (B10)") {
    // u1 spends 60%, u2 30%, u3 10% (600/300/100 cents)
    val df = Seq((1L, 1L, "purchase", 6.00), (2L, 2L, "purchase", 3.00),
      (3L, 3L, "purchase", 1.00), (4L, 1L, "view", 99.0))
      .toDF("event_id", "user_id", "event_type", "value")
    val out = EventAnalytics.whales(df, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // view events never count; k=2 keeps u1, u2
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    assert(out(0) === ((1L, 600L, 600000000L, 600000000L)))
    assert(out(1) === ((2L, 300L, 300000000L, 900000000L)))
  }

  test("z-scores: exact moments fixture — symmetric values, unit spread (B6)") {
    // type A cents [100, 200, 300]: μ = 200, σ = sqrt((140000/3) - 40000)
    // = sqrt(20000/3); z of 300 = 100/σ — recompute the identical tree
    val df = Seq((1L, "A", 1.00), (2L, "A", 2.00), (3L, "A", 3.00))
      .toDF("event_id", "event_type", "value")
    val out = EventAnalytics.zScores(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val mu = 600.0 / 3
    val sigma = math.sqrt(140000.0 / 3 - mu * mu)
    assert(out(1L) === (100.0 - mu) / sigma)
    assert(out(2L) === 0.0)
    assert(out(3L) === (300.0 - mu) / sigma)
    assert(out(1L) === -out(3L))
    // σ = 0 regime: a constant-valued type pins z to 0.0, never NaN
    val const = Seq((1L, "B", 9.99), (2L, "B", 9.99), (3L, "B", 9.99))
      .toDF("event_id", "event_type", "value")
    val zs = EventAnalytics.zScores(const).collect().map(_.getDouble(3))
    assert(zs.toSeq === Seq(0.0, 0.0, 0.0))
  }

  test("active users: DAU counts a user once per day, WAU spans exactly 7 trailing days (B10)") {
    def day(d: Int, u: Long) = (Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), u)
    // u1 on days 1 and 2 (twice on day 1), u2 on day 1 only, u3 on day 9
    val rows = Seq(day(1, 1L), day(1, 1L), day(1, 2L), day(2, 1L), day(9, 3L))
      .zipWithIndex.map { case ((t, u), i) => (i.toLong, t, u) }
      .toDF("event_id", "ts", "user_id")
    val out = EventAnalytics.activeUsers(rows).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).getDayOfMonth ->
        (r.getLong(1), r.getLong(2))).toMap
    // day 1: u1+u2 active; trailing week = day 1 only
    assert(out(1) === ((2L, 2L)))
    // day 2: u1 active; trailing week covers day 1 too → u1, u2
    assert(out(2) === ((1L, 2L)))
    // day 9: u3; day 2 (u1) is 7 days back — OUTSIDE the 7-day window
    // (window = days 3..9), day 1 even further → wau = 1
    assert(out(9) === ((1L, 1L)))
    // days with no events never appear
    assert(out.keySet === Set(1, 2, 9))
  }

  test("time to convert: strictly-after purchase, exact lower-median latency per cohort (B10)") {
    def e(id: Long, t: String, u: Long, typ: String) =
      (id, Timestamp.valueOf(t), u, typ)
    val rows = Seq(
      // u1: signs up 10:00, purchases 10:10 → 600 s
      e(1, "2024-01-01 10:00:00", 1, "signup"), e(2, "2024-01-01 10:10:00", 1, "purchase"),
      // u2: purchase BEFORE signup, then 30 s after → 30 s (pre-signup ignored)
      e(3, "2024-01-01 09:00:00", 2, "purchase"), e(4, "2024-01-01 10:00:00", 2, "signup"),
      e(5, "2024-01-01 10:00:30", 2, "purchase"),
      // u3: signs up, never purchases → not converted
      e(6, "2024-01-01 11:00:00", 3, "signup"),
      // u4: day-2 cohort, converts in 90 s
      e(7, "2024-01-02 08:00:00", 4, "signup"), e(8, "2024-01-02 08:01:30", 4, "purchase"),
      // u5: purchase at the EXACT signup instant does not count; later one does
      e(9, "2024-01-02 09:00:00", 5, "signup"), e(10, "2024-01-02 09:00:00", 5, "purchase"),
      e(11, "2024-01-02 09:00:10", 5, "purchase"),
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.timeToConvert(rows).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0).getDayOfMonth ->
        (r.getLong(1), r.getLong(2))).toMap
    // day 1: u1 (600 s), u2 (30 s) → lower median 30
    assert(out(1) === ((2L, 30L)))
    // day 2: u4 (90 s), u5 (10 s) → lower median 10
    assert(out(2) === ((2L, 10L)))
    assert(out.size === 2)
  }

  test("survival: censoring, dense week axis, exact hazards on a hand fixture (B10)") {
    def e(id: Long, d: Int, u: Long) =
      (id, Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), u, "view")
    val rows = Seq(
      e(1, 1, 1), e(2, 11, 1),   // lifetime 10d → week 1, churned (30-11 ≥ 7)
      e(3, 1, 2), e(4, 29, 2),   // lifetime 28d → week 4, CENSORED (30-29 < 7)
      e(5, 30, 3),               // week 0, CENSORED — also sets horizon=30
      e(6, 5, 4),                // week 0, churned
      e(7, 2, 5), e(8, 16, 5),   // lifetime 14d → week 2, churned
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.survival(rows).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // dense axis 0..4 even though week 3 has no exits
    assert(out.map(_._1).toSeq === (0 to 4))
    val m = out.toMap
    assert(m(0) === ((5L, 1L, 1L, 200000000L)))   // u4 churned, u3 censored
    assert(m(1) === ((3L, 1L, 0L, 333333333L)))   // u1
    assert(m(2) === ((2L, 1L, 0L, 500000000L)))   // u5
    assert(m(3) === ((1L, 0L, 0L, 0L)))           // nobody exits
    assert(m(4) === ((1L, 0L, 1L, 0L)))           // u2 censored, hazard 0
    // at-risk conservation: each week's pool = previous minus exits
    out.sliding(2).foreach { case Array((_, p), (_, c)) =>
      assert(c._1 === p._1 - p._2 - p._3)
    }
  }

  test("seasonal outliers: per-cell median baseline, strict 4x flag boundary (B10)") {
    // hours 09 and 10 of one day are distinct hour-of-week cells
    def e(id: Long, h: Int, m: Int, v: Double) =
      (id, Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"), 1L, "purchase", v)
    val rows = (
      (1 to 5).map(i => e(i, 9, i, 1.00)) ++ Seq(   // five 100c: median 100
        e(6, 9, 30, 4.00),                          // exactly 4×median: NOT flagged
        e(7, 9, 40, 4.01),                          // strictly above: flagged
        e(8, 10, 0, 100.00), e(9, 10, 30, 100.00))  // own cell, own baseline
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.seasonalOutliers(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 2)
    val (cell9, cell10) = (out.keys.min, out.keys.max)
    assert(cell10 === cell9 + 1)
    // lower median of {100×5, 400, 401} = 100; only 401 > 4·100
    assert(out(cell9) === ((7L, 100L, 1L)))
    // the 10:00 cell never inherits the 09:00 baseline
    assert(out(cell10) === ((2L, 10000L, 0L)))
  }

  test("seasonal outliers: pre-1970 instants land in calendar-true hour-of-week " +
    "cells (r12 — floor division, not truncation; matches the sign-safe oracle)") {
    // hand-derived calendar truth (Monday = 0):
    //   1969-12-31 23:30 UTC — Wednesday 23h → cell 2·24+23 = 71
    //     (the OLD trunc form gave 95: day trunc'd to 0 = "Thursday")
    //   1969-12-28 00:30 UTC — Sunday 0h → cell 6·24+0 = 144
    //     (OLD: sec div 86400 = −3 → "Monday", hour pmod drifted to 1 → 1)
    //   2024-01-01 09:05 UTC — Monday 9h → cell 9 (post-1970 unchanged)
    val rows = Seq(
      (1L, Timestamp.valueOf("1969-12-31 23:30:00"), 1L, "purchase", 1.00),
      (2L, Timestamp.valueOf("1969-12-28 00:30:00"), 1L, "purchase", 1.00),
      (3L, Timestamp.valueOf("2024-01-01 09:05:00"), 1L, "purchase", 1.00),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val cells = EventAnalytics.seasonalOutliers(rows).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(cells === Seq(9L, 71L, 144L))
  }

  test("streaks: gaps-and-islands longest runs on a hand fixture (B10)") {
    def e(id: Long, d: Int, u: Long) =
      (id, Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), u, "view")
    val rows = Seq(
      e(1, 1, 1), e(2, 2, 1), e(3, 3, 1), e(4, 5, 1), // u1: 3-run then 1-run → 3
      e(5, 1, 2), e(6, 1, 2), e(7, 2, 2),             // u2: dup same day → 2
      e(8, 4, 3),                                     // u3: singleton → 1
      e(9, 10, 4), e(10, 11, 4), e(11, 12, 4), e(12, 13, 4), // u4 → 4
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.streaks(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("growth accounting: new/retained/resurrected/churned on a hand fixture (B10)") {
    // epoch-day div 7 weeks: Jan 1 / 8 / 15 2024 fall in consecutive
    // distinct index weeks A / B / C (boundaries at Jan 4 and Jan 11)
    def e(id: Long, d: Int, u: Long) =
      (id, Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), u, "view")
    val rows = Seq(
      e(1, 1, 1), e(2, 8, 1), e(3, 15, 1),  // u1: A, B, C — retained twice
      e(4, 1, 2), e(5, 15, 2),              // u2: A, gap, C — resurrected in C
      e(6, 1, 3),                           // u3: A only — churned in B
      e(7, 8, 4),                           // u4: new in B, churned in C
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.growthAccounting(rows).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 3) // dense A..C axis
    assert(out(0) === ((3L, 0L, 0L, 0L)))  // A: all new
    assert(out(1) === ((1L, 1L, 0L, 2L)))  // B: u4 new, u1 retained; u2+u3 churn
    assert(out(2) === ((0L, 1L, 1L, 1L)))  // C: u1 retained, u2 back, u4 churns
    // self-audit identities on the declared gate's real data
    val real = EventAnalytics.growthAccountingQuery(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val active = real.map(t => t._1 + t._2 + t._3)
    real.indices.drop(1).foreach { i =>
      assert(real(i)._4 === active(i - 1) - real(i)._2,
        s"churned(w) != active(w-1) - retained(w) at $i")
    }
  }

  test("autocorr: period-2 series pins lag-2 r to exactly 1.0, lag-1 negative (B06)") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00")
    // 14 days alternating 1.00 / 2.00 revenue — exact weekly-style cycle of 2
    val rows = (0 until 14).map { d =>
      (d.toLong, day(d), 1L, "purchase", if (d % 2 == 0) 1.0 else 2.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.autocorr(rows).collect()
      .map(x => x.getInt(0) -> x.getDouble(5)).toMap
    assert(r(2) === 1.0) // identical subseries; moments small → IEEE-exact 1.0
    assert(r(4) === 1.0 && r(6) === 1.0)
    assert(r(1) < -0.8 && r(3) < -0.8)
  }

  test("autocorr: missing days count as zero revenue; constant series pins r=0") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00")
    // observations only on even days → dense grid alternates v,0 → period 2
    val gappy = (0 until 14 by 2).map { d =>
      (d.toLong, day(d), 1L, "purchase", 3.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val g = EventAnalytics.autocorr(gappy).collect()
      .map(x => x.getInt(0) -> x.getDouble(5)).toMap
    assert(g(2) === 1.0 && g(1) < -0.8)
    // constant series: zero variance → r pinned to 0.0, not NaN
    val const = (0 until 10).map { d =>
      (d.toLong, day(d), 1L, "purchase", 5.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.autocorr(const).collect().forall(_.getDouble(5) === 0.0))
  }

  test("trend: exact-line fixture recovers slope/intercept; gaps count as zero (B06)") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00")
    // y = 100 + 50x cents over 5 days — a perfect line
    val line = (0 until 5).map { d =>
      (d.toLong, day(d), 1L, "buy", (100 + 50 * d) / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.trend(line).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Double]("slope_cents_per_day") === 50.0)
    assert(r.getAs[Double]("intercept_cents") === 100.0)
    // observations on days 0 and 2 only → grid day 1 is zero revenue:
    // x=(0,1,2), y=(300,0,300) → slope 0, intercept 200
    val gappy = Seq((0L, day(0), 1L, "buy", 3.0), (1L, day(2), 1L, "buy", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val g = EventAnalytics.trend(gappy).collect().head
    assert(g.getAs[Long]("n_days") === 3L)
    assert(g.getAs[Double]("slope_cents_per_day") === 0.0)
    assert(g.getAs[Double]("intercept_cents") === 200.0)
    // single-day series: zero x-variance pins slope 0, intercept = value
    val one = Seq((0L, day(0), 1L, "buy", 7.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val o = EventAnalytics.trend(one).collect().head
    assert(o.getAs[Double]("slope_cents_per_day") === 0.0)
    assert(o.getAs[Double]("intercept_cents") === 750.0)
  }

  test("changepoint: step series peaks CUSUM exactly at the break (B06)") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00")
    // level 1.00 for days 0..4, then 3.00 for days 5..9: n=10, Σy=2000,
    // |cusum| is maximal at the last low day (day index 4)
    val step = (0 until 10).map { d =>
      (d.toLong, day(d), 1L, "buy", if (d < 5) 1.0 else 3.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.changepoint(step).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    val epoch0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(r.getAs[Int]("cp_day") === (epoch0 + 4).toInt)
    // hand value: n*prefix(4) - 5*Σy = 10*500 - 5*2000 = -5000
    assert(r.getAs[Long]("cusum_n") === -5000L)
    assert(r.getAs[Long]("cusum_abs_n") === 5000L)
    // constant series: cusum identically 0, argmax tie-breaks to day 0
    val const = (0 until 6).map { d =>
      (d.toLong, day(d), 1L, "buy", 2.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val c = EventAnalytics.changepoint(const).collect().head
    assert(c.getAs[Long]("cusum_abs_n") === 0L)
    assert(c.getAs[Int]("cp_day") === epoch0.toInt)
  }

  test("theil-sen: robust to the outlier day that drags OLS (B06)") {
    def day(d: Int) = Timestamp.valueOf(f"2024-01-${d + 1}%02d 09:00:00")
    // perfect 50-cents/day line for 9 days plus one absurd spike at the
    // end: OLS slope inflates, Theil-Sen's median slope stays 50
    val rows = (0 until 9).map { d =>
      (d.toLong, day(d), 1L, "buy", (100 + 50 * d) / 100.0)
    } :+ ((9L, day(9), 1L, "buy", 10000.0))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val ts9 = EventAnalytics.theilSen(df).collect().head
    assert(ts9.getAs[Long]("n_pairs") === 45L) // C(10,2)
    assert(ts9.getAs[Long]("slope_py") === 50L) // exactly 50 c/day
    assert(ts9.getAs[Long]("slope_px") === 1L)
    assert(ts9.getAs[Double]("slope_cents_per_day") === 50.0)
    val ols = EventAnalytics.trend(df).collect().head
    assert(ols.getAs[Double]("slope_cents_per_day") > 1000.0) // dragged
    // pure line: both agree exactly
    val clean = (0 until 6).map { d =>
      (d.toLong, day(d), 1L, "buy", (200 + 25 * d) / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.theilSen(clean).collect().head
      .getAs[Double]("slope_cents_per_day") === 25.0)
  }

  test("theil-sen: EVEN pair count still yields a median row (r7 float-div bug)") {
    // span 4 → C(4,2) = 6 pairs: the r7 rank filter compared row_number
    // against float (6+1)/2 = 3.5 and matched NOTHING; the integer-div
    // rank (6+1) div 2 = 3 must pick the 3rd-smallest slope.
    // y (cents) over days 0..3: 0, 100, 300, 300 → reduced slopes
    // 100/1, 150/1, 100/1, 200/1, 100/1, 0/1 → sorted 0, 100, 100, 100,
    // 150, 200 → lower median (rank 3) = 100/1.
    def day(d: Int) = Timestamp.valueOf(f"2024-03-${d + 1}%02d 09:00:00")
    val rows = Seq(0, 100, 300, 300).zipWithIndex.map { case (c, d) =>
      (d.toLong, day(d), 1L, "buy", c / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.theilSen(rows).collect()
    assert(out.length === 1) // the r7 code returned ZERO rows here
    assert(out.head.getAs[Long]("n_pairs") === 6L)
    assert(out.head.getAs[Long]("slope_py") === 100L)
    assert(out.head.getAs[Long]("slope_px") === 1L)
  }

  test("theil-sen: sub-micro slope pairs ordered exactly (r8 exact rationals)") {
    // Dense 1500-day grid: y = 1000x + floor(829x/10⁶) + hash-noise. The
    // micro-drift (829 µcents/day, denominator 10⁶ > span so it forms no
    // small-fraction atom) steers the median slope-offset into the crowded
    // 1/q Farey band (q ≈ 1200), where adjacent DISTINCT rationals differ
    // by 1/q² ≈ 6.7·10⁻⁷ — BELOW r7's 10⁻⁶ quantization grain; the ±50
    // hash noise makes those fractions actually occur as pair slopes.
    // Ground truth is an in-test EXACT oracle: all C(1500,2) slopes
    // ordered by BigInt cross-multiplication, lower median at rank
    // (n+1) div 2. Also asserts the discrimination MATTERED: the
    // median's micro-bucket must contain ≥ 2 distinct rationals
    // (verified offline: 1223999/1224 and 1224999/1225 share it).
    val span = 1500
    def pert(x: Int): Long =
      ((x.toLong * x * 3266489917L + x * 40503L) % 1000003L) % 50L
    val ys = (0 until span).map(x => 1000L * x + (x * 829L) / 1000000L + pert(x))
    val points = (0 until span).map(x => ("buy", 20000L + x, ys(x)))
      .toDF("event_type", "day", "cents")
    val out = EventAnalytics.theilSenOf(points).collect().head

    // exact in-test oracle (BigInt comparator — no floating point)
    val slopes = for {
      x1 <- 0 until span; x2 <- (x1 + 1) until span
    } yield {
      val dy = ys(x2) - ys(x1); val dx = (x2 - x1).toLong
      val g = BigInt(dy).gcd(BigInt(dx)).toLong max 1L
      (dy / g, dx / g)
    }
    val sorted = slopes.sortWith { case ((py1, px1), (py2, px2)) =>
      BigInt(py1) * px2 < BigInt(py2) * px1
    }
    val n = sorted.length
    assert(n === span * (span - 1) / 2)
    assert(n % 2 === 0) // even: the rank filter must use integer div
    val median = sorted((n + 1) / 2 - 1) // (n+1) div 2, 1-indexed

    assert(out.getAs[Long]("n_pairs") === n.toLong)
    assert((out.getAs[Long]("slope_py"), out.getAs[Long]("slope_px")) === median)
    // the old 1e-6 grain could not have told these apart: distinct
    // rationals sharing the median's floor(1e6·slope) bucket
    val microOf = (f: (Long, Long)) =>
      math.floor(f._1.toDouble * 1e6 / f._2.toDouble).toLong
    val bucket = slopes.filter(f => microOf(f) === microOf(median)).distinct
    assert(bucket.size >= 2,
      s"fixture too coarse: median micro-bucket had only $bucket")
  }

  test("theil-sen: out-of-domain day span fails loudly at the grid stage (r9 guard)") {
    // the (kq, kf) order key is injective only for reduced denominators
    // px ≤ 10⁶, and px ≤ span by construction — so theilSenOf guards
    // the SPAN on the types-sized grid aggregate (r8 ADVICE): a planted
    // span past 10⁶ must THROW there, BEFORE the day-axis explode and
    // the O(span²) pair stage ever run (this test finishes in seconds
    // precisely because the guard fires pre-explode — an in-pair-table
    // guard would grind through ~5·10¹¹ pairs first).
    def two(dx: Long): org.apache.spark.sql.DataFrame =
      Seq(("buy", 0L, 0L), ("buy", dx, 1L)).toDF("event_type", "day", "cents")
    val ex = intercept[Exception] {
      EventAnalytics.theilSenOf(two(1000001L)).collect()
    }
    assert(ex.getMessage != null)
    // in-domain spans keep working (tiny span; exact slope over the
    // zero-filled grid is pinned by the neighboring exact-oracle test)
    assert(EventAnalytics.theilSenOf(two(10L)).collect().length === 1)
  }

  test("power analysis: hand p=0.2 baseline, monotone in lift, zero-conv guard (B10)") {
    // 10 users, 2 converters (value>=200 purchases) → p1 = 0.2
    val rows = (1 to 10).flatMap { u =>
      val v = if (u <= 2) 250.0 else 50.0
      Seq((u.toLong * 10, ts(u % 60), u.toLong, "purchase", v))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventAnalytics.powerAnalysis(rows).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(5, 10, 20, 50))
    val r20 = out(20)
    assert(r20.getAs[Long]("n_users") === 10L && r20.getAs[Long]("n_converted") === 2L)
    val p1 = 0.2; val p2 = 0.2 * 1.2
    val exp = math.ceil(2.8 * 2.8 * (p1 * (1 - p1) + p2 * (1 - p2))
      / ((p2 - p1) * (p2 - p1))).toLong
    assert(r20.getAs[Long]("n_per_arm") === exp)
    // bigger detectable lift needs fewer users
    val ns = Seq(5, 10, 20, 50).map(out(_).getAs[Long]("n_per_arm"))
    assert(ns === ns.sorted.reverse)
    // zero conversions → NULL plan, not a division error
    val none = Seq((1L, ts(0), 1L, "view", 10.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.powerAnalysis(none).collect()
      .forall(_.isNullAt(5)))
  }
}
