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

/** `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] <ident>
  * [(col [COMMENT '…'], …)] [COMMENT '…'] [TBLPROPERTIES (…)]
  * AS <query>` — the full vanilla clause surface. A column list
  * RENAMES the query's outputs (vanilla rule: counts must match); the
  * view comment persists as the reserved `comment` property (the
  * `ViewCatalog.PROP_COMMENT` convention).
  */
case class GraftCreateViewCommand(catalogName: String,
                                               ident: Identifier,
                                               query: String,
                                               replace: Boolean,
                                               ifNotExists: Boolean,
                                               columnAliases: Seq[String] = Nil,
                                               columnComments: Seq[String] = Nil,
                                               comment: Option[String] = None,
                                               properties: Seq[(String, String)] = Nil)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    require(!(replace && ifNotExists),
      "CREATE OR REPLACE VIEW and IF NOT EXISTS cannot both be specified")
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    if (ifNotExists && vc.viewExists(ident)) return Seq.empty
    // analyzing the defining query pins schema + column names (and
    // rejects broken SQL at CREATE time, not first read)
    val frame = sparkSession.sql(query)
    if (columnAliases.nonEmpty &&
        columnAliases.length != frame.columns.length)
      throw new IllegalArgumentException(
        s"CREATE VIEW $ident: the column list names " +
          s"${columnAliases.length} columns but the query produces " +
          s"${frame.columns.length}")
    val dup = columnAliases.groupBy(_.toLowerCase).filter(_._2.size > 1)
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"CREATE VIEW $ident: duplicate column name" +
        s"${if (dup.size == 1) "" else "s"} ${dup.keys.mkString(", ")}")
    // the stored schema carries the ALIASED names (what DESCRIBE and
    // reads surface); queryColumnNames keep the query's own outputs
    val schema =
      if (columnAliases.isEmpty) frame.schema
      else org.apache.spark.sql.types.StructType(
        frame.schema.fields.zip(columnAliases).map { case (f, a) =>
          f.copy(name = a)
        })
    val props = new java.util.LinkedHashMap[String, String]()
    properties.foreach { case (k, v) => props.put(k, v) }
    comment.foreach(c => props.put(ViewCatalog.PROP_COMMENT, c))
    val info = new ViewInfo(ident, query, catalogName, ident.namespace(),
      schema, frame.columns, columnAliases.toArray,
      columnComments.toArray, props)
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

/** `ALTER VIEW <from> RENAME TO <to>` — the catalog's native
  * renameView (same catalog; the metadata file moves, the defining SQL
  * and its stored resolution context are untouched).
  */
case class GraftRenameViewCommand(catalogName: String,
                                  from: Identifier,
                                  to: Identifier)
    extends LeafRunnableCommand {

  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftViewDdl.viewCatalog(sparkSession, catalogName).renameView(from, to)
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

/** `SHOW CREATE VIEW <ident>` (also served for `SHOW CREATE TABLE`
  * naming a graft VIEW): reconstructs runnable DDL from the stored
  * metadata — column aliases with their comments, the view comment,
  * user TBLPROPERTIES (reserved properties excluded), and the defining
  * SQL. Output column matches vanilla (`createtab_stmt`).
  */
case class GraftShowCreateViewCommand(catalogName: String,
                                      ident: Identifier)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("createtab_stmt", StringType, nullable = false)())

  private def q(s: String): String = s"'${s.replace("'", "''")}'"
  private def bq(s: String): String = s"`${s.replace("`", "``")}`"

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    val v = vc.loadView(ident)
    val props = v.properties()
    val cols =
      if (v.columnAliases() == null || v.columnAliases().isEmpty) ""
      else v.columnAliases().toSeq.zipWithIndex.map { case (a, i) =>
        val c = v.columnComments() match {
          case cc if cc != null && i < cc.length && cc(i).nonEmpty =>
            s" COMMENT ${q(cc(i))}"
          case _ => ""
        }
        s"${bq(a)}$c"
      }.mkString(" (", ", ", ")")
    val comment = Option(props.get(ViewCatalog.PROP_COMMENT))
      .map(c => s"\nCOMMENT ${q(c)}").getOrElse("")
    val userProps = props.entrySet().toArray(
      Array.empty[java.util.Map.Entry[String, String]]).toSeq
      .filterNot(e => ViewCatalog.RESERVED_PROPERTIES.contains(e.getKey))
    val tblProps =
      if (userProps.isEmpty) ""
      else userProps.map(e => s"${q(e.getKey)} = ${q(e.getValue)}")
        .mkString("\nTBLPROPERTIES (", ", ", ")")
    val fq = (catalogName +: ident.namespace().toSeq :+ ident.name())
      .map(bq).mkString(".")
    Seq(Row(s"CREATE VIEW $fq$cols$comment$tblProps AS\n${v.query()}\n"))
  }
}

/** `DESCRIBE [TABLE] [EXTENDED|FORMATTED] <ident>` on a graft VIEW:
  * the vanilla view shape — one row per column (aliased names, stored
  * comments), EXTENDED adds the detailed-information section (view
  * text, catalog/namespace context, query output columns, properties).
  */
case class GraftDescribeViewCommand(catalogName: String,
                                    ident: Identifier,
                                    extended: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val vc = GraftViewDdl.viewCatalog(sparkSession, catalogName)
    val v = vc.loadView(ident)
    val comments = Option(v.columnComments()).getOrElse(Array.empty)
    val colRows = v.schema().fields.toSeq.zipWithIndex.map { case (f, i) =>
      Row(f.name, f.dataType.simpleString,
        if (i < comments.length && comments(i).nonEmpty) comments(i)
        else null)
    }
    if (!extended) colRows
    else {
      val props = v.properties()
      val userProps = props.entrySet().toArray(
        Array.empty[java.util.Map.Entry[String, String]]).toSeq
        .filterNot(e => ViewCatalog.RESERVED_PROPERTIES.contains(e.getKey))
        .map(e => s"${e.getKey}=${e.getValue}")
      colRows ++ Seq(
        Row("", "", null),
        Row("# Detailed View Information", "", null),
        Row("Catalog", catalogName, null),
        Row("Namespace", ident.namespace().mkString("."), null),
        Row("View Name", ident.name(), null),
        Row("View Text", v.query(), null),
        Row("View Catalog and Namespace",
          (v.currentCatalog() +: v.currentNamespace().toSeq)
            .mkString("."), null),
        Row("View Query Output Columns",
          v.queryColumnNames().mkString("[", ", ", "]"), null)) ++
        Option(props.get(ViewCatalog.PROP_COMMENT))
          .map(c => Row("Comment", c, null)).toSeq ++
        (if (userProps.isEmpty) Seq.empty
         else Seq(Row("View Properties",
           userProps.mkString("[", ", ", "]"), null)))
    }
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
