package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.Functions

/** SparkSessionExtensions entry point: inject the graft native functions
  * into any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard deployment path on a shared cluster, where the session is
  * constructed by the platform, not the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    Functions.builders.foreach { case (name, cls, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name),
        builder))
    }
}
