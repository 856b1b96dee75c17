package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
import org.apache.spark.sql.streaming.StreamingQuery

/** Which catalog tables does a RUNNING streaming query statically
  * reference? Needed by `graft.ops.Bucketing.maintainIfAdvised`'s
  * restart fence (r18): compact rewrites index files, so it must
  * refuse while a live stream has the index planned in — but refusing
  * for EVERY live stream would block the normal topology (ten streams
  * over ten indexes; compacting one should only require restarting
  * one). The analyzed plan (a StreamExecution constructor argument —
  * available for any active query) retains the V1 catalog relations a
  * probe joined statically, so the fence can name the offending
  * streams precisely.
  *
  * `StreamingQueryWrapper` is `private[sql]`, hence this shim in an
  * `org.apache.spark.sql` subpackage — the same pattern as
  * `org.apache.spark.graftbus.ListenerDrain`. Nothing else lives here.
  */
object StreamPlans {

  /** Lower-cased catalog table names the query's analyzed plan reads.
    * None = not inspectable (not a classic wrapper, or the plan walk
    * failed) — callers treat that conservatively. */
  def staticTables(q: StreamingQuery): Option[Set[String]] = q match {
    case w: StreamingQueryWrapper =>
      try Some(w.streamingQuery.analyzedPlan.collect {
        case lr: LogicalRelation =>
          lr.catalogTable.map(_.identifier.table.toLowerCase).toSeq
        case hr: HiveTableRelation =>
          Seq(hr.tableMeta.identifier.table.toLowerCase)
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          v2.identifier.map(_.name.toLowerCase).toSeq
      }.flatten.toSet)
      catch { case scala.util.control.NonFatal(_) => None }
    case _ => None
  }
}
