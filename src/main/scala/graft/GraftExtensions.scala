package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

/** Session extensions for the engine — the supported plug-in point for
  * custom Catalyst surfaces (`spark.sql.extensions=graft.GraftExtensions`
  * in any user config, or `.withExtensions(new GraftExtensions)` at
  * session build). Registers the codegen [[graft.functions.DotProduct]]
  * as the SQL function `graft_dot(array<double>, array<double>)`, so
  * pure-SQL users (spark.sql, JDBC, SQL files) get the same fused
  * no-allocation loop the DataFrame facade uses — cosine in SQL becomes
  * `graft_dot(a,b) / (sqrt(graft_dot(a,a)) * sqrt(graft_dot(b,b)))`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot takes 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
  }
}
