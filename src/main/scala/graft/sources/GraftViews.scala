package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewChange, ViewInfo}
import org.apache.spark.sql.types.StructType

/** Persistent SQL VIEWS for [[GraftCatalog]] — Spark 4's native
  * `ViewCatalog` protocol (the Iceberg view idiom): `CREATE VIEW` /
  * `CREATE OR REPLACE VIEW` / `DROP VIEW` / `SHOW VIEWS` /
  * `ALTER VIEW … SET TBLPROPERTIES` all analyze natively once the
  * catalog declares the ability, and a `SELECT` through the view
  * re-resolves the stored SQL in the view's own catalog+namespace
  * context — pushdown reaches the underlying table scan exactly as if
  * the user had inlined the query.
  *
  * Storage: `<root>/<ns>/_graft_views/<name>.view` — one small
  * metadata file per view (the view TEXT is the artifact, the Hive /
  * Iceberg convention; nothing is materialized). Writes land tmp +
  * atomic-move, so readers never observe a torn view; the underscore
  * directory is invisible to [[GraftCatalog.listTables]]'s
  * `_graft_meta.json` predicate.
  */
private[sources] object GraftViews {

  private def enc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def dec(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  def dirFor(root: String, ns: Seq[String]): Path =
    Paths.get((root +: ns).mkString("/")).resolve("_graft_views")

  def fileFor(root: String, ident: Identifier): Path =
    dirFor(root, ident.namespace.toSeq).resolve(s"${ident.name}.view")

  def exists(root: String, ident: Identifier): Boolean =
    Files.isRegularFile(fileFor(root, ident))

  def list(root: String, ns: Seq[String]): Seq[String] = {
    val d = dirFor(root, ns)
    if (!Files.isDirectory(d)) Seq.empty
    else Option(d.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".view"))
      .map(_.getName.stripSuffix(".view")).toSeq.sorted
  }

  /** One line per field; every value Base64-armored (view SQL contains
    * arbitrary text). Multi-valued fields carry their ELEMENT COUNT on
    * the line (`key\tcount\tvalue`, values joined with `` before
    * encoding) and split with limit -1 — so a trailing empty
    * alias/comment round-trips exactly (Java's default split drops
    * trailing empties) and `Seq("")` stays distinguishable from
    * `Seq()`.
    */
  def write(root: String, ident: Identifier, name: String, sql: String,
            currentCatalog: String, currentNamespace: Seq[String],
            schema: StructType, queryColumnNames: Seq[String],
            columnAliases: Seq[String], columnComments: Seq[String],
            properties: Map[String, String]): Unit = {
    val d = dirFor(root, ident.namespace.toSeq)
    Files.createDirectories(d)
    def multi(key: String, xs: Seq[String]) =
      s"$key\t${xs.length}\t${enc(xs.mkString(""))}"
    val body = (Seq(
      s"name\t${enc(name)}",
      s"sql\t${enc(sql)}",
      s"cat\t${enc(currentCatalog)}",
      multi("ns", currentNamespace),
      s"schema\t${enc(schema.json)}",
      multi("qcols", queryColumnNames),
      multi("aliases", columnAliases),
      multi("comments", columnComments)) ++
      properties.toSeq.sortBy(_._1).map { case (k, v) =>
        s"prop\t${enc(k)}\t${enc(v)}"
      }).mkString("\n")
    val tmp = d.resolve(s".${ident.name}_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, body)
    Files.move(tmp, fileFor(root, ident),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  def read(root: String, ident: Identifier): Option[GraftView] = {
    val f = fileFor(root, ident)
    if (!Files.isRegularFile(f)) return None
    val fields = scala.collection.mutable.Map.empty[String, String]
    val multis = scala.collection.mutable.Map.empty[String, Array[String]]
    val props = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Files.readAllLines(f).forEach { l =>
      l.split("\t", 3) match {
        case Array("prop", k, v) => props(dec(k)) = dec(v)
        case Array(key, n, v) =>
          // count-carrying multi field: split with -1 keeps trailing
          // empties; count 0 is the empty Seq (vs Seq("") = count 1)
          val parts =
            if (n.toInt == 0) Array.empty[String]
            else dec(v).split("", -1)
          require(parts.length == n.toInt,
            s"corrupt view file $f: field '$key' declares ${n.toInt} " +
              s"elements but decodes ${parts.length}")
          multis(key) = parts
        case Array(key, v) => fields(key) = v
        case _ => ()
      }
    }
    def split(key: String): Array[String] = multis.get(key).getOrElse {
      // pre-round-13 files wrote multi fields WITHOUT the count token —
      // fall back to the legacy decode (default split: trailing empties
      // were not representable then, so none are lost)
      val raw = dec(fields(key))
      if (raw.isEmpty) Array.empty[String] else raw.split("")
    }
    Some(new GraftView(dec(fields("name")), dec(fields("sql")),
      dec(fields("cat")), split("ns"),
      org.apache.spark.sql.types.DataType.fromJson(dec(fields("schema")))
        .asInstanceOf[StructType],
      split("qcols"), split("aliases"), split("comments"), props.toMap))
  }
}

/** The [[View]] a stored `.view` file surfaces. */
final class GraftView(viewName: String, viewSql: String, cat: String,
                      ns: Array[String], viewSchema: StructType,
                      qcols: Array[String], aliases: Array[String],
                      comments: Array[String], props: Map[String, String])
    extends View {
  override def name(): String = viewName
  override def query(): String = viewSql
  override def currentCatalog(): String = cat
  override def currentNamespace(): Array[String] = ns
  override def schema(): StructType = viewSchema
  override def queryColumnNames(): Array[String] = qcols
  override def columnAliases(): Array[String] = aliases
  override def columnComments(): Array[String] = comments
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.LinkedHashMap[String, String]()
    props.foreach { case (k, v) => m.put(k, v) }
    m
  }

  def withProperties(p: Map[String, String]): GraftView =
    new GraftView(viewName, viewSql, cat, ns, viewSchema, qcols, aliases,
      comments, p)
  def propsMap: Map[String, String] = props

  private[sources] def persist(root: String, ident: Identifier): Unit =
    GraftViews.write(root, ident, viewName, viewSql, cat, ns.toSeq,
      viewSchema, qcols.toSeq, aliases.toSeq, comments.toSeq, props)
}
