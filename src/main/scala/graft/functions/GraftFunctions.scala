package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column wrappers for graft's custom Catalyst expressions.
  *
  * Registered through the session's `FunctionRegistry`, so the functions are
  * usable from SQL text as well as the DataFrame API (and the Column wrapper
  * avoids depending on any non-public Column constructor).
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "infobox_to_map", exprs => InfoboxToMap(exprs.head), "built-in")
  }

  /** Flatten a Bangumi infobox JSON array into map<string,string> (F1). */
  def infobox_to_map(c: Column): Column = call_function("infobox_to_map", c)
}
