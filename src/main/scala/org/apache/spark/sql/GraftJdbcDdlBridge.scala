package org.apache.spark.sql

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.StructType

/** Bridge to the package-private JDBC DDL builder (the
  * [[GraftStateStoreBridge]] pattern): exposes the EXACT column-DDL
  * string Spark's JDBC writer would embed in its `CREATE TABLE`
  * statement for a given dialect — so the MySQL dialect surface
  * ([[graft.sinks.JdbcLoad.mysqlWriteOptions]]) can be executed against
  * a real grammar check ([[graft.sinks.MySqlDdl]]) in a sandbox with no
  * MySQL server: the statement under test is the one Spark itself
  * constructs (`JdbcUtils.createTable` emits
  * `CREATE TABLE t (<schemaString>) <createTableOptions>`), not a
  * hand-mocked copy.
  */
object GraftJdbcDdlBridge {

  def dialectFor(url: String): JdbcDialect = JdbcDialects.get(url)

  /** The `(<cols>)` body Spark's JDBC writer generates: dialect type
    * mapping plus the user's `createTableColumnTypes` overrides — the
    * same call `JdbcUtils.createTable` makes. */
  def schemaString(
      dialect: JdbcDialect,
      schema: StructType,
      caseSensitive: Boolean,
      createTableColumnTypes: Option[String]): String =
    JdbcUtils.schemaString(dialect, schema, caseSensitive,
      createTableColumnTypes)

  /** The full statement `JdbcUtils.createTable` would execute. */
  def createTableStatement(
      url: String,
      table: String,
      schema: StructType,
      createTableColumnTypes: Option[String],
      createTableOptions: String): String = {
    val dialect = JdbcDialects.get(url)
    val strSchema = schemaString(dialect, schema, caseSensitive = false,
      createTableColumnTypes)
    s"CREATE TABLE $table ($strSchema) $createTableOptions".trim
  }
}
