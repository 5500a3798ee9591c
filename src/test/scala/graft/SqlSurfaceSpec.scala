package graft

import org.apache.spark.sql.DataFrame

/** The plain-SQL entry surface (the reference's Metabase leg made
  * native): registered views must answer SQL text identically to the
  * DataFrame registry forms — same rows, same columns — and the
  * warehouse entity tables must be queryable by name.
  */
class SqlSurfaceSpec extends SparkSuite {

  /** Collected rows normalized for order-insensitive comparison. */
  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "∅" else r.get(i).toString))
      .sortBy(_.mkString("|"))

  // Representative registry queries whose oracle SQL is portable ANSI
  // (runs unchanged on Spark): aggregation, multi-join star, top-k,
  // point lookup, range scan, anti-join EXISTS, window rank, set ops,
  // CASE buckets, HAVING, correlated-avg join — the shapes a dashboard
  // actually emits.
  private val portable = Seq(
    "q01_pricing_summary", "q02_revenue_by_segment",
    "q03_topk_customers", "q04_monthly_sales", "q05_key_lookup",
    "q06_time_range_scan", "q07_orphan_check", "q08_window_rank",
    "q12_setop_intersect", "q15_date_parts", "q16_case_buckets",
    "q17_semijoin_exists", "q18_distinct_counts", "q19_having_filter",
    "q44_above_cust_avg", "q45_setop_except")

  test("SQL text over registered table views answers identically to " +
    "the DataFrame registry forms (the Metabase leg, 16 query shapes)") {
    SqlSurface.registerTables(spark, sf)
    for (name <- portable) {
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sf)
      assert(viaSql.columns.map(_.toLowerCase).sorted.toSeq
        === viaDf.columns.map(_.toLowerCase).sorted.toSeq,
        s"$name: SQL and DataFrame column sets diverge")
      assert(rows(viaSql.select(viaSql.columns.sorted.map(viaSql(_)): _*))
        === rows(viaDf.select(viaDf.columns.sorted.map(viaDf(_)): _*)),
        s"$name: SQL and DataFrame answers diverge")
    }
  }

  test("registry queries are addressable as views: SELECT * FROM " +
    "<query_name> equals the registry call") {
    SqlSurface.registerAll(spark, sf)
    for (name <- Seq("q03_topk_customers", "q27_exact_dedup",
        "q34_quality_score")) {
      assert(rows(spark.sql(s"SELECT * FROM $name"))
        === rows(SparkEntry.queries(name)(spark, sf)),
        s"$name view diverges from the registry form")
    }
    // ad-hoc SQL over a query view composes (the dashboard case:
    // filter/aggregate over a curated view)
    val n = spark.sql(
      "SELECT count(*) AS n FROM q03_topk_customers WHERE revenue > 0")
      .collect().head.getLong(0)
    assert(n > 0L)
    // graft native functions are available to ad-hoc SQL text
    val sim = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .collect().head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("warehouse entity tables register as views when present and " +
    "skip silently when absent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sqlwh").toString
    // nothing ingested yet: no views, no errors
    assert(SqlSurface.registerWarehouse(spark, root) === Seq())
    // land one entity table; only it registers
    Seq(("VNT001", "CLI001", "PRO001", 2L))
      .toDF("vente_id", "client_id", "produit_id", "quantite")
      .write.parquet(s"$root/ventes")
    assert(SqlSurface.registerWarehouse(spark, root) === Seq("ventes"))
    assert(spark.sql("SELECT vente_id FROM ventes").collect()
      .map(_.getString(0)).toSeq === Seq("VNT001"))
  }
}
