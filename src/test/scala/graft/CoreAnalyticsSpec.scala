package graft

import org.apache.spark.sql.functions._
import graft.queries.CoreAnalytics

/** Per-operator sanity on sf0.001 (the DuckDB hash-match at sf0.01 is the
  * full correctness gate; these specs pin invariants + shapes cheaply).
  */
class CoreAnalyticsSpec extends SparkSuite {

  private def run(name: String) = CoreAnalytics.queries(name)(spark, sf)

  test("every declared query has a distinct name and runs non-empty") {
    // q05/q07-style lookups can legitimately be small but never error.
    CoreAnalytics.queries.keys.foreach { name =>
      val df = run(name)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q43's rank-walk form equals the percentile aggregate bit for " +
    "bit (both value columns, all three percentiles)") {
    // r21 replaced the sort-based `percentile` aggregate with a
    // counts/row_number rank walk; this law pins the replication of
    // Percentile.getPercentile — position arithmetic, bracketing keys,
    // both short-circuits, interpolation — against the aggregate
    // itself on the same data.
    val ref = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5D)").as("med_qty"),
        expr("percentile(l_quantity, 0.9D)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.5D)").as("med_price"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val got = run("q43_percentiles")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet === ref.keySet)
    for (k <- ref.keys; i <- 0 until 3) {
      val e = ref(k).productElement(i).asInstanceOf[Double]
      val g = got(k).productElement(i).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(e) ===
        java.lang.Double.doubleToLongBits(g),
        s"$k percentile #$i: got $g want $e")
    }
  }

  test("q68 approx percentiles track the exact q43 answers") {
    // The sketch flank must stay within its rank-error budget of the
    // exact sort-based aggregate; at accuracy 10000 over sf0.001 the
    // answers are near-identical — gate at 2% relative value error.
    def byFlag(name: String) = CoreAnalytics.queries(name)(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag("q43_percentiles")
    val approx = byFlag("q68_approx_percentiles")
    assert(approx.keySet === exact.keySet)
    for (k <- exact.keys) {
      val (e1, e2, e3) = exact(k)
      val (a1, a2, a3) = approx(k)
      for ((e, a) <- Seq((e1, a1), (e2, a2), (e3, a3)))
        assert(math.abs(a - e) <= 0.02 * math.abs(e),
          s"$k: approx $a vs exact $e")
    }
  }

  test("every oracle key matches a query key") {
    val qs = CoreAnalytics.queries.keySet
    assert(CoreAnalytics.oracles.keySet.subsetOf(qs))
  }

  test("q01 pricing summary: group count and positive sums") {
    val rows = run("q01_pricing_summary").collect()
    assert(rows.length === 6) // 3 returnflags × 2 linestatus
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_disc_price") <=
        r.getAs[Double]("sum_base_price"))
    }
  }

  test("q03 top-k is sorted desc by revenue with key tiebreak") {
    val rev = run("q03_topk_customers").collect()
      .map(_.getAs[Double]("revenue"))
    assert(rev.length === 10)
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q07 orphan check: testdata has no orphan orders") {
    assert(run("q07_orphan_check").collect().head.getAs[Long]("n_orphans")
      === 0L)
  }

  test("q08 window rank emits exactly <=3 rows per segment") {
    val bySeg = run("q08_window_rank").groupBy("c_mktsegment").count()
      .collect()
    bySeg.foreach(r => assert(r.getAs[Long]("count") <= 3))
  }

  test("q09 latest-event-per-user is one row per user") {
    val df = run("q09_latest_event_per_user")
    assert(df.count() === df.select("user_id").distinct().count())
  }

  test("q10 rollup contains grand-total row") {
    val rows = run("q10_rollup_region_nation").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val totalCustomers = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Long]("n_customers")).sum
    assert(grand.head.getAs[Long]("n_customers") === totalCustomers)
  }

  test("q12 intersect returns distinct keys") {
    val df = run("q12_setop_intersect")
    assert(df.count() === df.distinct().count())
  }

  test("q22 sessionize: session count never exceeds event count") {
    run("q22_sessionize").collect().foreach { r =>
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_sessions") >= 1L)
    }
  }

  test("q57 binned range join equals the brute-force range join") {
    // The bin quantization is pure optimization — the result must be
    // IDENTICAL to the unbinned cross-join form. This specifically
    // guards bin-coverage: under IEEE rounding an interval's endpoint
    // bins can differ by 2, and emitting only the endpoints (not the
    // full sequence) silently drops middle-bin matches — e.g. a unit
    // price exactly equal to the part's retail price.
    val li = Tables.load(spark, sf, "lineitem")
      .select((col("l_extendedprice") / col("l_quantity")).as("unit"))
    val pr = Tables.load(spark, sf, "part")
      .select(col("p_partkey"), col("p_retailprice"))
    val brute = li.crossJoin(pr)
      .filter(col("unit") >= col("p_retailprice") - lit(0.05) &&
        col("unit") <= col("p_retailprice") + lit(0.05))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_matches"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = run("q57_range_join_binned")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === brute)
  }

  test("q59 grouping sets: per-level counts reconcile") {
    val rows = run("q59_grouping_sets").collect()
    val detail = rows.filter(_.getAs[Long]("gid") == 0L)
    val byStatus = rows.filter(_.getAs[Long]("gid") == 1L)
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1)
    assert(detail.map(_.getAs[Long]("n_orders")).sum ===
      grand.head.getAs[Long]("n_orders"))
    assert(byStatus.map(_.getAs[Long]("n_orders")).sum ===
      grand.head.getAs[Long]("n_orders"))
  }

  test("q23 as-of: prev_signup is never after the purchase event") {
    val e = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("ts"))
    val j = CoreAnalytics.queries("q23_asof_prev_signup")(spark, sf)
      .join(e, "event_id")
      .filter(col("prev_signup").isNotNull)
      .filter(col("prev_signup") > col("ts"))
    assert(j.count() === 0)
  }

  test("q102 key-skew profile reconciles with a driver-side recount " +
    "and shares sum to <= 100%") {
    val keys = Tables.load(spark, sf, "lineitem").select("l_suppkey")
      .collect().map(_.getLong(0))
    val exp = keys.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val top = exp.toSeq.sortBy { case (k, n) => (-n, k) }.take(20)
    val rows = run("q102_key_skew").collect()
    assert(rows.map(r => (r.getAs[Long]("l_suppkey"),
      r.getAs[Long]("n_rows"))).toSeq === top)
    rows.foreach { r =>
      assert(r.getAs[Double]("share_pct") ===
        r.getAs[Long]("n_rows") * 100.0 / keys.length)
    }
    assert(rows.map(_.getAs[Double]("share_pct")).sum <= 100.0 + 1e-9)
  }

  test("q134 funnel: step counts match a driver-side recompute of the " +
    "24h-windowed min-chain; steps monotone; pcts reconcile exactly") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = 24L * 3600L * 1000000L
    val per = ev.groupBy(_._1).values.map { g =>
      val u = g.map(x => (x._2, x._3)).toSeq
      val t1 = u.collect { case ("view", t) => t }.minOption
      val t2 = t1.flatMap(a => u.collect {
        case ("click", t) if t > a && t <= a + win => t }.minOption)
      val t3 = t2.flatMap(a => u.collect {
        case ("purchase", t) if t > a && t <= a + win => t }.minOption)
      (t1, t2, t3)
    }.toSeq
    val n1 = per.count(_._1.isDefined).toLong
    val n2 = per.count(_._2.isDefined).toLong
    val n3 = per.count(_._3.isDefined).toLong
    assert(n1 > 0L && n2 > 0L && n3 > 0L, "fixture lost discrimination")
    val rows = run("q134_funnel_steps").collect()
    assert(rows.map(r => r.getAs[Long]("step") ->
      r.getAs[Long]("users")).toMap === Map(1L -> n1, 2L -> n2, 3L -> n3))
    assert(n1 >= n2 && n2 >= n3, "funnel must be monotone")
    val pct = rows.map(r => r.getAs[Long]("step") ->
      r.getAs[Double]("conv_pct")).toMap
    assert(pct(1L) === 100.0)
    assert(pct(2L) === n2 * 100.0 / n1)
    assert(pct(3L) === n3 * 100.0 / n2)
  }

  test("q138 hourly anomalies: flagged hours match a driver-side " +
    "trailing-median recompute; every flag is a real >= 2x spike with " +
    "a full 24-hour baseline") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hourUs = 3600L * 1000000L
    val counts = ev.groupBy { case (t, us) =>
      (t, Math.floorDiv(us, hourUs) * hourUs) }
      .map { case (k, g) => k -> g.length.toLong }
    val want = counts.groupBy(_._1._1).flatMap { case (tp, g) =>
      val hours = g.toSeq.map { case ((_, h), n) => (h, n) }.sortBy(_._1)
      hours.indices.flatMap { i =>
        if (i < 24) None
        else {
          val prev = hours.slice(i - 24, i).map(_._2).sorted
          val med = (prev(11) + prev(12)) / 2.0 // (n-1)*0.5 = 11.5
          val n = hours(i)._2
          if (n.toDouble >= 2 * med)
            Some((tp, hours(i)._1) -> (n, med, n / med))
          else None
        }
      }
    }
    val got = run("q138_hourly_anomalies").collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime * 1000L) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))
    }.toMap
    assert(got === want,
      "anomaly flags diverged from the driver-side recompute")
    assert(want.nonEmpty, "fixture produced no spikes")
  }

  test("q139 funnel segments: per-segment cells match a driver-side " +
    "recompute joined on custkey and sum to the q134 totals") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val seg = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val win = 24L * 3600L * 1000000L
    val perUser = ev.groupBy(_._1).map { case (u, g) =>
      val evs = g.map(x => (x._2, x._3)).toSeq
      val t1 = evs.collect { case ("view", t) => t }.minOption
      val t2 = t1.flatMap(a => evs.collect {
        case ("click", t) if t > a && t <= a + win => t }.minOption)
      val t3 = t2.flatMap(a => evs.collect {
        case ("purchase", t) if t > a && t <= a + win => t }.minOption)
      (u, t1, t2, t3)
    }
    val want = perUser.toSeq.flatMap { case (u, t1, t2, t3) =>
      seg.get(u).map(sg => (sg, t1, t2, t3)) }
      .groupBy(_._1).map { case (sg, g) =>
        val n1 = g.count(_._2.isDefined).toLong
        val n2 = g.count(_._3.isDefined).toLong
        val n3 = g.count(_._4.isDefined).toLong
        sg -> (n1, n2, n3, n2 * 100.0 / n1, n3 * 100.0 / n1)
      }
    val rows = run("q139_funnel_segments").collect()
    val got = rows.map(r => r.getString(0) -> (r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got === want,
      "segment funnel diverged from the driver-side recompute")
    // the dimension join drops no one here (every user is a custkey),
    // so segment cells must sum to the overall q134 step counts
    val totals = run("q134_funnel_steps").collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[Long]("users")).toMap
    assert(got.values.map(_._1).sum === totals(1L))
    assert(got.values.map(_._2).sum === totals(2L))
    assert(got.values.map(_._3).sum === totals(3L))
  }

  test("q135 retention: the cohort matrix matches a driver-side " +
    "java.time recompute (independent week truncation); cells bounded " +
    "by cohort size") {
    import java.time.{DayOfWeek, Instant, ZoneOffset}
    import java.time.temporal.TemporalAdjusters
    def week(us: Long): java.time.LocalDate = Instant
      .ofEpochSecond(Math.floorDiv(us, 1000000L))
      .atZone(ZoneOffset.UTC).toLocalDate
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstSignup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._3).min }
    val cohortUsers = firstSignup.groupBy { case (_, t) => week(t) }
      .map { case (w, g) => w -> g.size.toLong }
    val cells = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, t) => firstSignup.get(u)
        .filter(t >= _).map(fs => (week(fs), u, week(t))) }
      .distinct
      .groupBy { case (cw, _, aw) =>
        (cw, (aw.toEpochDay - cw.toEpochDay) / 7) }
      .map { case (k, g) => k -> g.size.toLong }
    val rows = run("q135_retention_cohorts").collect()
    val got = rows.map(r => (r.getAs[java.sql.Timestamp]("cohort_week")
      .toInstant.atZone(ZoneOffset.UTC).toLocalDate,
      r.getAs[Long]("week_offset")) ->
      (r.getAs[Long]("active_users"), r.getAs[Long]("cohort_users"))).toMap
    assert(got.keySet === cells.keySet)
    got.foreach { case ((cw, off), (active, size)) =>
      assert(active === cells((cw, off)), s"cell ($cw, $off)")
      assert(size === cohortUsers(cw), s"cohort size at $cw")
      assert(active <= size && off >= 0L)
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("retention_pct") ===
        r.getAs[Long]("active_users") * 100.0 /
          r.getAs[Long]("cohort_users"))
    }
  }
}
