package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreAnalytics, LlmPipeline}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory = SURVEY.md §2: the reference's ETL operators re-expressed
  * as verifiable queries, the implied warehouse query surface (§2.2), and the
  * north-star LLM-pipeline extensions (dedup / similarity / text analysis /
  * multimodal), each with DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top-k customers by net revenue: scan → star join (broadcast dim) →
    * partial+final agg → TakeOrderedAndProject (SURVEY.md §7.3).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreAnalytics.queries("q03_topk_customers")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (CoreAnalytics)
    * plus the LLM-training-data pipeline surface (LlmPipeline: dedup,
    * similarity search, text analysis over documents/embeddings).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreAnalytics.queries ++ LlmPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (used for non-SQL-expressible ops).
    */
  def oracleSql: Map[String, String] =
    CoreAnalytics.oracles ++ LlmPipeline.oracles
}
