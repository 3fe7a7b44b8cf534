package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.types.StructType

/** The STAGED side of graft's atomic CREATE OR REPLACE / RTAS
  * (`graft.sources.GraftCatalog`'s StagingTableCatalog): wraps the new
  * generation's table — fully built and writable in its invisible
  * `gen_<uuid>` directory — and defers visibility to `onCommit` (ONE
  * atomic `_graft_ptr` move) / cleanup to `onAbort` (delete the
  * generation). RTAS writes land through the inner table's normal
  * write builder BEFORE the commit, so readers never observe a partial
  * replace and no crash window can lose the table.
  */
final class GraftStagedTable(inner: GraftSqlTable,
                             onCommit: () => Unit,
                             onAbort: () => Unit)
    extends StagedTable with SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    inner.columns()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()
  override def properties(): java.util.Map[String, String] =
    inner.properties()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}
