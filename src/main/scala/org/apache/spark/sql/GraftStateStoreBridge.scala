package org.apache.spark.sql

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Bridge to the package-private state-store maintenance API (the standard
  * ecosystem pattern for `private[sql]` members — same approach
  * spark-testing-base et al. use). Used only by the bench harness to
  * unload providers left behind by completed streaming queries, so later
  * queries are measured against a quiet JVM.
  */
object GraftStateStoreBridge {
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
