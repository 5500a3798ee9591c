package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.Functions

/** Native cosine_sim expression: bit-exactness vs the higher-order
  * function composition it replaces, null semantics, SQL registration,
  * and the SparkSessionExtensions injection path.
  */
class FunctionsSpec extends SparkSuite {

  private def hofCosine = expr(
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / " +
      "(sqrt(aggregate(transform(a, x -> x * x), 0D, (acc, x) -> acc + x)) * " +
      "sqrt(aggregate(transform(b, x -> x * x), 0D, (acc, x) -> acc + x)))")

  test("cosine_sim is bit-identical to the zip_with/aggregate fold") {
    import spark.implicits._
    Functions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("native"), hofCosine.as("hof"))
    val got = df.collect()
    got.foreach { r =>
      // Bit-level equality, not epsilon: same fold order, same doubles.
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("cosine_sim known values + null + degenerate inputs") {
    import spark.implicits._
    Functions.register(spark)
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)), // orthogonal -> 0
      (Array(1.0, 2.0), Array(2.0, 4.0)), // parallel -> 1
      (Array(1.0, 0.0), Array(-1.0, 0.0))) // opposite -> -1
      .toDF("a", "b").select(expr("cosine_sim(a, b)").as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq
      .zip(Seq(0.0, 1.0, -1.0)).forall { case (g, e) => math.abs(g - e) < 1e-15 })
    val nulls = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS c")
    assert(nulls.collect().head.isNullAt(0))
    // mismatched lengths -> NULL (zip_with pads with null, sum poisons)
    val mism = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D)) AS c")
    assert(mism.collect().head.isNullAt(0))
    // null element -> NULL, same reasoning
    val nullElem = spark.sql(
      "SELECT cosine_sim(array(1.0D, CAST(NULL AS DOUBLE)), " +
        "array(1.0D, 2.0D)) AS c")
    assert(nullElem.collect().head.isNullAt(0))
    // zero-norm -> NaN (exactly like the fold-based form)
    val nan = spark.sql(
      "SELECT cosine_sim(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS c")
    assert(nan.collect().head.getDouble(0).isNaN)
  }

  test("type check rejects non-double arrays") {
    Functions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array('x'), array('y'))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("GraftExtensions injects the function builder") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // imperative path is equivalent and already exercised above
    Functions.register(spark)
    assert(spark.sql("SELECT cosine_sim(array(1.0D), array(1.0D)) AS c")
      .collect().head.getDouble(0) === 1.0)
  }
}
