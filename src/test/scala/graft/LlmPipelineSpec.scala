package graft

import org.apache.spark.sql.functions._
import graft.queries.LlmPipeline

/** Gates for the LLM-pipeline operators that the DuckDB oracle cannot
  * check (sketches) or where determinism itself is the property.
  */
class LlmPipelineSpec extends SparkSuite {

  test("every SparkEntry query (all modules) executes at sf0.001; " +
    "every oracle key names a declared query") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q47 approx distinct: within 5% relative error of exact, per lang") {
    val approx = LlmPipeline.queries("q47_approx_distinct")(spark, sf)
    val exact = Tables.load(spark, sf, "documents")
      .select(col("lang"),
        explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).as("exact_terms"))
    val rows = approx.join(exact, "lang").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx_terms").toDouble
      val e = r.getAs[Long]("exact_terms").toDouble
      assert(math.abs(a - e) / e <= 0.05,
        s"lang=${r.getAs[String]("lang")} approx=$a exact=$e")
    }
  }

  test("q46 deterministic sample: identical across reruns, ~20% rate, " +
    "slot in [0,20)") {
    def ids = LlmPipeline.queries("q46_det_sample")(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_slot")))
    val run1 = ids
    val run2 = ids
    assert(run1.toSeq === run2.toSeq) // content-addressed: no rand()
    assert(run1.forall { case (_, slot) => slot >= 0 && slot < 20 })
    val total = Tables.load(spark, sf, "documents").count().toDouble
    val frac = run1.length / total
    assert(frac > 0.10 && frac < 0.30, s"sample fraction $frac")
  }
}
