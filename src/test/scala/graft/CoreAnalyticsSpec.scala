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
}
