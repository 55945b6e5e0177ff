package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for graft's custom expressions, so a
  * cluster can enable them declaratively:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (equivalent to calling [[GraftFunctions.register]] per session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("infobox_to_map"),
      new ExpressionInfo(classOf[InfoboxToMap].getName, "infobox_to_map"),
      (exprs: Seq[Expression]) => InfoboxToMap(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("rolling_chunks"),
      new ExpressionInfo(classOf[RollingHashChunks].getName, "rolling_chunks"),
      (exprs: Seq[Expression]) => RollingHashChunks(exprs.head,
        GraftFunctions.intArg(exprs, 1, 16), GraftFunctions.intArg(exprs, 2, 6))))
  }
}
