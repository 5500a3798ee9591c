package graft

import org.apache.spark.sql.SparkSession

/** Dump explain("formatted") for a comma-separated prefix list of
  * queries (SPARK_GRAFT_ONLY) into $SPARK_GRAFT_PLANS_DIR/<name>_<tag>.txt.
  * Local tooling only.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r21")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.startsWith))
      .foreach { n =>
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/${n.takeWhile(_ != '_')}_$tag.txt"),
            plan)
          println(s"[explain] wrote $n")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $n failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
