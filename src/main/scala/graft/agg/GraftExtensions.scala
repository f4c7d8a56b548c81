package graft.agg

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Cluster installation path: put the library jar on the classpath and
 * set `spark.sql.extensions=graft.agg.GraftExtensions` — every session
 * (including Thrift/Connect ones that never run Scala code) gets the
 * `graft_*` SQL functions without a driver-side register() call.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.sqlBuilders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
}
