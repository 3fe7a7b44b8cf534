package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.types.{BooleanType, StringType}

/** The commands behind graft's NATIVE VIEW DDL (`CREATE [OR REPLACE]
  * VIEW [IF NOT EXISTS] … AS …` / `DROP VIEW [IF EXISTS] …` /
  * `SHOW VIEWS IN …` on a [[graft.sources.GraftCatalog]]) — vanilla
  * Spark 4.1 routes view DDL to the SESSION catalog only (every other
  * catalog gets `MISSING_CATALOG_ABILITY` before its `ViewCatalog`
  * implementation is consulted), so [[graft.ext.GraftSqlParser]]
  * intercepts the three statements when they target a graft catalog
  * and parses them into these [[LeafRunnableCommand]]s — the Iceberg
  * SQL-extensions-parser model against public extension points. DDL on
  * any other catalog delegates untouched to the vanilla parser.
  *
  * Semantics mirror the `CALL <cat>.system.create_view/drop_view/
  * show_views` procedures (which stay as the non-extension-session
  * fallback): the view's schema and column names pin at CREATE time by
  * analyzing the query (broken SQL fails the DDL, not the first read),
  * and the stored view resolves in its own catalog+namespace context
  * ([[graft.ext.GraftResolveViews]]).
  */
object GraftViewDdl {

  def viewCatalog(spark: SparkSession, catalogName: String): ViewCatalog =
    spark.sessionState.catalogManager.catalog(catalogName) match {
      case vc: ViewCatalog => vc
      case other => throw new UnsupportedOperationException(
        s"catalog $catalogName (${other.getClass.getName}) does not " +
          "support views")
    }
}

/** `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] <ident> AS <query>`. */
case class GraftCreateViewCommand(catalogName: String,
                                               ident: Identifier,
                                               query: String,
                                               replace: Boolean,
                                               ifNotExists: Boolean)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    require(!(replace && ifNotExists),
      "CREATE OR REPLACE VIEW and IF NOT EXISTS cannot both be specified")
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    if (ifNotExists && vc.viewExists(ident)) return Seq.empty
    // analyzing the defining query pins schema + column names (and
    // rejects broken SQL at CREATE time, not first read)
    val frame = sparkSession.sql(query)
    val info = new ViewInfo(ident, query, catalogName, ident.namespace(),
      frame.schema, frame.columns, Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]())
    if (replace) vc.replaceView(info, true) else vc.createView(info)
    Seq.empty
  }
}

/** `ALTER VIEW <ident> AS <query>` — redefine an EXISTING view's body
  * (schema re-pins from the new query; user TBLPROPERTIES are
  * PRESERVED, the vanilla AlterViewAs semantic).
  */
case class GraftAlterViewAsCommand(catalogName: String,
                                   ident: Identifier,
                                   query: String)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    if (!vc.viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    val existing = vc.loadView(ident)
    val frame = sparkSession.sql(query)
    val info = new ViewInfo(ident, query, catalogName, ident.namespace(),
      frame.schema, frame.columns, Array.empty[String], Array.empty[String],
      existing.properties())
    vc.replaceView(info, false)
    Seq.empty
  }
}

/** `ALTER VIEW <ident> SET TBLPROPERTIES (…)` / `UNSET TBLPROPERTIES
  * [IF EXISTS] (…)` onto the catalog's native `alterView`. UNSET
  * without IF EXISTS rejects missing keys (the vanilla
  * UNSET_NONEXISTENT_PROPERTIES semantic — a typo must not be
  * swallowed).
  */
case class GraftAlterViewPropsCommand(catalogName: String,
                                      ident: Identifier,
                                      set: Seq[(String, String)],
                                      unset: Seq[String],
                                      unsetIfExists: Boolean = false)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    if (unset.nonEmpty && !unsetIfExists) {
      val existing = vc.loadView(ident).properties()
      val missing = unset.filterNot(existing.containsKey)
      if (missing.nonEmpty) throw new IllegalArgumentException(
        s"UNSET TBLPROPERTIES: view $ident has no " +
          s"propert${if (missing.size == 1) "y" else "ies"} " +
          s"${missing.mkString(", ")} — use IF EXISTS to ignore")
    }
    val changes: Seq[org.apache.spark.sql.connector.catalog.ViewChange] =
      set.map { case (k, v) =>
        org.apache.spark.sql.connector.catalog.ViewChange.setProperty(k, v)
      } ++ unset.map(
        org.apache.spark.sql.connector.catalog.ViewChange.removeProperty)
    vc.alterView(ident, changes: _*)
    Seq.empty
  }
}

/** `DROP VIEW [IF EXISTS] <ident>`. */
case class GraftDropViewCommand(catalogName: String,
                                             ident: Identifier,
                                             ifExists: Boolean)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    if (!vc.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

/** `SHOW VIEWS IN <catalog>[.<ns>…]` — the vanilla output shape
  * (namespace, viewName, isTemporary).
  */
case class GraftShowViewsCommand(catalogName: String,
                                              namespace: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary", BooleanType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    vc.listViews(namespace: _*).toSeq.map(i =>
      Row(namespace.mkString("."), i.name, false))
  }
}
