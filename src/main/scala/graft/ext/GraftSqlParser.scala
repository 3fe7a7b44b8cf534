package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.types.{DataType, StructType}

import org.apache.spark.sql.graft.{GraftAlterViewAsCommand, GraftAlterViewPropsCommand, GraftCreateViewCommand, GraftDescribeViewCommand, GraftDropViewCommand, GraftRenameViewCommand, GraftShowCreateViewCommand, GraftShowViewsCommand}

/** Injected SQL parser (the Iceberg SQL-extensions-parser model):
  * intercepts the three VIEW DDL statements when they target a
  * [[graft.sources.GraftCatalog]] and routes them to the catalog's
  * native `ViewCatalog` implementation — vanilla Spark 4.1 hard-wires
  * view DDL to the session catalog (`MISSING_CATALOG_ABILITY` for
  * every other catalog), so without this a user typing standard DDL
  * against a graft catalog dead-ends even though the catalog fully
  * implements the protocol.
  *
  *   - `CREATE [OR REPLACE] VIEW [IF NOT EXISTS] <ident>
  *     [(col [COMMENT '…'], …)] [COMMENT '…'] [TBLPROPERTIES (…)]
  *     AS <query>`
  *   - `DROP VIEW [IF EXISTS] <ident>`
  *   - `SHOW VIEWS {IN | FROM} <catalog>[.<ns>…]`
  *   - `SHOW CREATE VIEW <ident>` (and `SHOW CREATE TABLE` naming a
  *     graft view; graft TABLES keep the vanilla path)
  *   - `DESCRIBE [TABLE] [EXTENDED|FORMATTED] <ident>` naming a graft
  *     view (tables delegate to the native V2 DESCRIBE)
  *
  * EVERYTHING ELSE — including these statements against any other
  * catalog and `CREATE [GLOBAL] TEMPORARY VIEW` — delegates verbatim
  * to the vanilla parser, so nothing changes for other catalogs.
  * Identifier lexing honors backtick quoting (including doubled
  * backticks); statement-head matching is whitespace- and
  * case-insensitive, the vanilla rules.
  *
  * Installed build-time by [[GraftExtensions]] (`injectParser`);
  * sessions without the extension keep the CALL-procedure DDL surface
  * ([[graft.sources.GraftProcedures]] create_view/drop_view/show_views).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.viewDdl(session, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** The intercepted statement, or None = delegate. */
  private[ext] def viewDdl(session: SparkSession, delegate: ParserInterface,
                           sql: String): Option[LogicalPlan] = {
    val s = sql.trim.stripSuffix(";")
    matchCreate(session, delegate, s)
      .orElse(matchAlterAs(session, delegate, s))
      .orElse(matchDrop(session, s))
      .orElse(matchShow(session, s))
      .orElse(matchShowCreate(session, s))
      .orElse(matchDescribe(session, s))
  }

  // --------------------------------------------------------- lexing

  /** Consume one dot-separated, possibly-backquoted multipart
    * identifier from the head of `s`; returns (parts, rest). Doubled
    * backticks unescape inside a quoted part (the vanilla rule).
    */
  private def ident(s: String): Option[(Seq[String], String)] = {
    var i = 0
    val n = s.length
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    def part(): Boolean =
      if (i < n && s(i) == '`') {
        val sb = new StringBuilder
        i += 1
        while (i < n) {
          if (s(i) == '`') {
            if (i + 1 < n && s(i + 1) == '`') { sb.append('`'); i += 2 }
            else { i += 1; parts += sb.toString; return true }
          } else { sb.append(s(i)); i += 1 }
        }
        false // unterminated quote
      } else {
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        if (i == start) false
        else { parts += s.substring(start, i); true }
      }
    if (!part()) return None
    while (i < n && s(i) == '.') { i += 1; if (!part()) return None }
    Some((parts.toSeq, s.substring(i)))
  }

  /** Case-insensitively consume `words` (each separated by whitespace)
    * from the head of `s`; returns the rest.
    */
  private def keywords(s: String, words: String*): Option[String] = {
    var rest = s
    var first = true
    for (w <- words) {
      val trimmed = rest.dropWhile(_.isWhitespace)
      // every keyword after the first must have consumed whitespace
      if (!first && (trimmed.length == rest.length)) return None
      if (trimmed.length < w.length ||
        !trimmed.substring(0, w.length).equalsIgnoreCase(w)) return None
      // keyword boundary: next char must not be a word char
      val after = trimmed.substring(w.length)
      if (after.nonEmpty && (after(0).isLetterOrDigit || after(0) == '_'))
        return None
      rest = after
      first = false
    }
    Some(rest)
  }

  // ---------------------------------------------- catalog resolution

  /** (catalog name, identifier) when `parts` addresses a graft
    * catalog — either explicitly (head is a registered GraftCatalog)
    * or implicitly (session's current catalog is one). None = not
    * graft's statement, delegate.
    */
  /** Shared probe: does `name` resolve to a GraftCatalog? (forces
    * catalog instantiation only after a statement shape fully matched.)
    */
  private def isGraftCatalog(session: SparkSession, name: String): Boolean =
    scala.util.Try(session.sessionState.catalogManager.catalog(name))
      .toOption.exists(_.isInstanceOf[graft.sources.GraftCatalog])

  private def address(session: SparkSession, parts: Seq[String])
      : Option[(String, Identifier)] = {
    val cm = session.sessionState.catalogManager
    def isGraft(name: String): Boolean = isGraftCatalog(session, name)
    // vanilla resolution order wins for TEMP views: a 1-part name
    // matching a session temp view, or a global_temp.x reference,
    // always delegates — even under a graft current catalog (DROP VIEW
    // t must drop the temp view, never shadow-delete a persisted one)
    if (parts.length == 1 &&
        session.sessionState.catalog.getTempView(parts.head).isDefined)
      return None
    if (parts.length == 2 && parts.head ==
        session.sessionState.conf.getConfString(
          "spark.sql.globalTempDatabase", "global_temp"))
      return None
    if (parts.length >= 2 && cm.isCatalogRegistered(parts.head) &&
        isGraft(parts.head))
      Some((parts.head,
        Identifier.of(parts.tail.dropRight(1).toArray, parts.last)))
    else if (!cm.isCatalogRegistered(parts.head) &&
        isGraft(cm.currentCatalog.name)) {
      val full =
        if (parts.length == 1) cm.currentNamespace.toSeq ++ parts else parts
      Some((cm.currentCatalog.name,
        Identifier.of(full.dropRight(1).toArray, full.last)))
    } else None
  }

  // -------------------------------------------------- the statements

  private def matchCreate(session: SparkSession,
                          delegate: ParserInterface, s: String)
      : Option[LogicalPlan] = {
    val afterCreate = keywords(s, "CREATE") match {
      case Some(r) => r
      case None => return None
    }
    val (replace, afterReplace) =
      keywords(afterCreate, "OR", "REPLACE") match {
        case Some(r) => (true, r)
        case None => (false, afterCreate)
      }
    val afterView = keywords(afterReplace, "VIEW") match {
      case Some(r) => r
      case None => return None // incl. TEMPORARY/GLOBAL TEMP → delegate
    }
    val (ifNotExists, afterIne) =
      keywords(afterView, "IF", "NOT", "EXISTS") match {
        case Some(r) => (true, r)
        case None => (false, afterView)
      }
    val trimmed = afterIne.dropWhile(_.isWhitespace)
    val (parts, afterIdent) = ident(trimmed) match {
      case Some(pr) => pr
      case None => return None
    }
    // optional clauses, the vanilla order:
    //   (col [COMMENT '…'], …)  COMMENT '…'  TBLPROPERTIES (…)  AS query
    val (cols, afterCols) = colList(afterIdent) match {
      case Some((cs, rest)) => (cs, rest)
      case None => (Seq.empty[(String, String)], afterIdent)
    }
    val (comment, afterComment) = keywords(afterCols, "COMMENT") match {
      case Some(r) => stringLit(r) match {
        case Some((c, rest)) => (Some(c), rest)
        case None => return None // COMMENT without a literal → vanilla
      }
      case None => (None, afterCols)
    }
    val (props, afterProps) =
      keywords(afterComment, "TBLPROPERTIES") match {
        case Some(r) => propList(r, withValues = true) match {
          case Some((ps, rest)) => (ps, rest)
          case None => return None
        }
        case None => (Seq.empty[(String, String)], afterComment)
      }
    val query = keywords(afterProps, "AS") match {
      case Some(q) if q.exists(!_.isWhitespace) => q.trim
      case _ => return None
    }
    address(session, parts).map { case (cat, id) =>
      // the body must be a QUERY — validated AT PARSE TIME like
      // vanilla (parseQuery throws on commands), so `CREATE VIEW … AS
      // DROP TABLE t` is a parse error, never an executed statement
      delegate.parseQuery(query)
      GraftCreateViewCommand(cat, id, query, replace, ifNotExists,
        columnAliases = cols.map(_._1), columnComments = cols.map(_._2),
        comment = comment, properties = props)
    }
  }

  /** One single-/double-quoted string literal (doubled-quote escapes)
    * at the head of `s` (after whitespace); (value, rest).
    */
  private def stringLit(s0: String): Option[(String, String)] = {
    val s = s0.dropWhile(_.isWhitespace)
    val quote = if (s.startsWith("'")) '\''
      else if (s.startsWith("\"")) '"'
      else return None
    val sb = new StringBuilder
    var i = 1
    while (i < s.length) {
      if (s(i) == quote) {
        if (i + 1 < s.length && s(i + 1) == quote) { sb.append(quote); i += 2 }
        else return Some((sb.toString, s.substring(i + 1)))
      } else { sb.append(s(i)); i += 1 }
    }
    None // unterminated
  }

  /** A CREATE VIEW column list: `(col [COMMENT '…'], …)` — names
    * single-part (backtick-quoting honored), comments optional ("" =
    * none, positional with the aliases). None = not this shape.
    */
  private def colList(s0: String)
      : Option[(Seq[(String, String)], String)] = {
    var s = s0.dropWhile(_.isWhitespace)
    if (!s.startsWith("(")) return None
    s = s.drop(1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (true) {
      s = s.dropWhile(_.isWhitespace)
      val (parts, rest) = ident(s) match {
        case Some(pr) => pr
        case None => return None
      }
      if (parts.length != 1) return None
      s = rest
      val comment = keywords(s, "COMMENT") match {
        case Some(r) => stringLit(r) match {
          case Some((c, r2)) => s = r2; c
          case None => return None
        }
        case None => ""
      }
      out += (parts.head -> comment)
      s = s.dropWhile(_.isWhitespace)
      if (s.startsWith(",")) s = s.drop(1)
      else if (s.startsWith(")")) return Some((out.toSeq, s.drop(1)))
      else return None
    }
    None
  }

  /** `ALTER VIEW <ident> {AS <query> | RENAME TO <ident> |
    * SET TBLPROPERTIES (…) | UNSET TBLPROPERTIES [IF EXISTS] (…)}` —
    * vanilla 4.1 routes NO view statement to a V2 ViewCatalog, so all
    * four forms intercept here; anything else (unrecognized property
    * syntax included) delegates and surfaces the vanilla error.
    */
  private def matchAlterAs(session: SparkSession,
                           delegate: ParserInterface, s: String)
      : Option[LogicalPlan] = {
    val afterAlter = keywords(s, "ALTER", "VIEW") match {
      case Some(r) => r
      case None => return None
    }
    val trimmed = afterAlter.dropWhile(_.isWhitespace)
    val (parts, afterIdent) = ident(trimmed) match {
      case Some(pr) => pr
      case None => return None
    }
    keywords(afterIdent, "AS") match {
      case Some(q) if q.exists(!_.isWhitespace) =>
        val query = q.trim
        address(session, parts).map { case (cat, id) =>
          delegate.parseQuery(query) // body must be a QUERY, at parse time
          GraftAlterViewAsCommand(cat, id, query)
        }
      case _ =>
        // RENAME TO — the catalog's native renameView
        keywords(afterIdent, "RENAME", "TO").foreach { r =>
          ident(r.dropWhile(_.isWhitespace)) match {
            case Some((toParts, tail)) if tail.forall(_.isWhitespace) =>
              return (address(session, parts), address(session, toParts)) match {
                case (Some((cat, from)), Some((cat2, to))) if cat == cat2 =>
                  Some(GraftRenameViewCommand(cat, from, to))
                case (Some(_), Some(_)) => throw new IllegalArgumentException(
                  "ALTER VIEW … RENAME TO cannot move a view across catalogs")
                case _ => None
              }
            case _ => return None
          }
        }
        // SET / UNSET TBLPROPERTIES (vanilla never routes these to a
        // V2 ViewCatalog either)
        val setRest = keywords(afterIdent, "SET", "TBLPROPERTIES")
        val unsetRest = keywords(afterIdent, "UNSET", "TBLPROPERTIES")
          .map { r =>
            keywords(r, "IF", "EXISTS") match {
              case Some(r2) => (r2, true)
              case None => (r, false)
            }
          }
        (setRest, unsetRest) match {
          case (Some(r), _) =>
            propList(r, withValues = true).collect {
              case (props, tail) if tail.forall(_.isWhitespace) =>
                address(session, parts).map { case (cat, id) =>
                  GraftAlterViewPropsCommand(cat, id, props, Nil)
                }
            }.flatten
          case (_, Some((r, ifExists))) =>
            propList(r, withValues = false).collect {
              case (props, tail) if tail.forall(_.isWhitespace) =>
                address(session, parts).map { case (cat, id) =>
                  GraftAlterViewPropsCommand(cat, id, Nil,
                    props.map(_._1), ifExists)
                }
            }.flatten
          case _ => None
        }
    }
  }

  /** A parenthesized TBLPROPERTIES list: `('k' = 'v', key2 = 'w')`
    * (keys/values single-quoted — doubled-quote escapes — or bare
    * identifier-ish tokens). Returns (pairs, rest-after-paren); None =
    * not this shape, delegate.
    */
  private def propList(s0: String, withValues: Boolean)
      : Option[(Seq[(String, String)], String)] = {
    var s = s0.dropWhile(_.isWhitespace)
    if (!s.startsWith("(")) return None
    s = s.drop(1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def tok(): Option[String] = {
      s = s.dropWhile(_.isWhitespace)
      // single- OR double-quoted (both are stringLit in the vanilla
      // grammar; doubled-quote escapes), else a bare identifier-ish run
      val q = if (s.startsWith("'")) Some('\'')
        else if (s.startsWith("\"")) Some('"')
        else None
      q match {
        case Some(quote) =>
          val sb = new StringBuilder
          var i = 1
          while (i < s.length) {
            if (s(i) == quote) {
              if (i + 1 < s.length && s(i + 1) == quote) {
                sb.append(quote); i += 2
              } else { s = s.substring(i + 1); return Some(sb.toString) }
            } else { sb.append(s(i)); i += 1 }
          }
          None // unterminated
        case None =>
          val t = s.takeWhile(c => c.isLetterOrDigit || c == '_' ||
            c == '.' || c == '-')
          if (t.isEmpty) None else { s = s.drop(t.length); Some(t) }
      }
    }
    while (true) {
      val k = tok().getOrElse(return None)
      val v =
        if (!withValues) ""
        else {
          s = s.dropWhile(_.isWhitespace)
          if (!s.startsWith("=")) return None
          s = s.drop(1)
          tok().getOrElse(return None)
        }
      out += (k -> v)
      s = s.dropWhile(_.isWhitespace)
      if (s.startsWith(",")) s = s.drop(1)
      else if (s.startsWith(")")) return Some((out.toSeq, s.drop(1)))
      else return None
    }
    None
  }

  private def matchDrop(session: SparkSession, s: String)
      : Option[LogicalPlan] = {
    val afterDrop = keywords(s, "DROP", "VIEW") match {
      case Some(r) => r
      case None => return None
    }
    val (ifExists, afterIe) = keywords(afterDrop, "IF", "EXISTS") match {
      case Some(r) => (true, r)
      case None => (false, afterDrop)
    }
    val trimmed = afterIe.dropWhile(_.isWhitespace)
    ident(trimmed) match {
      case Some((parts, rest)) if rest.forall(_.isWhitespace) =>
        address(session, parts).map { case (cat, id) =>
          GraftDropViewCommand(cat, id, ifExists)
        }
      case _ => None
    }
  }

  private def graftViewExists(session: SparkSession, cat: String,
                              id: Identifier): Boolean =
    scala.util.Try(session.sessionState.catalogManager.catalog(cat))
      .toOption.collect {
        case vc: org.apache.spark.sql.connector.catalog.ViewCatalog =>
          vc.viewExists(id)
      }.getOrElse(false)

  /** `SHOW CREATE VIEW <ident>` / `SHOW CREATE TABLE <ident>` when the
    * identifier names an EXISTING graft view (graft TABLES keep the
    * vanilla ShowCreateTable path — the existence probe decides at
    * parse time, the Iceberg model).
    */
  private def matchShowCreate(session: SparkSession, s: String)
      : Option[LogicalPlan] = {
    val rest = keywords(s, "SHOW", "CREATE", "VIEW")
      .orElse(keywords(s, "SHOW", "CREATE", "TABLE")) match {
      case Some(r) => r
      case None => return None
    }
    ident(rest.dropWhile(_.isWhitespace)) match {
      case Some((parts, tail)) if tail.forall(_.isWhitespace) =>
        address(session, parts).collect {
          case (cat, id) if graftViewExists(session, cat, id) =>
            GraftShowCreateViewCommand(cat, id)
        }
      case _ => None
    }
  }

  /** `DESCRIBE|DESC [TABLE] [EXTENDED|FORMATTED] <ident>` when the
    * identifier names an EXISTING graft view — vanilla resolves
    * DESCRIBE against tables only, so a persisted V2 view dead-ends
    * without this. Tables (and anything with partition specs / column
    * paths after the identifier) delegate untouched.
    */
  private def matchDescribe(session: SparkSession, s: String)
      : Option[LogicalPlan] = {
    val afterDesc = keywords(s, "DESCRIBE").orElse(keywords(s, "DESC")) match {
      case Some(r) => r
      case None => return None
    }
    val afterTable = keywords(afterDesc, "TABLE").getOrElse(afterDesc)
    val (extended, rest) = keywords(afterTable, "EXTENDED")
      .map((true, _))
      .orElse(keywords(afterTable, "FORMATTED").map((true, _)))
      .getOrElse((false, afterTable))
    ident(rest.dropWhile(_.isWhitespace)) match {
      case Some((parts, tail)) if tail.forall(_.isWhitespace) =>
        address(session, parts).collect {
          case (cat, id) if graftViewExists(session, cat, id) =>
            GraftDescribeViewCommand(cat, id, extended)
        }
      case _ => None
    }
  }

  private def matchShow(session: SparkSession, s: String)
      : Option[LogicalPlan] = {
    val afterShow = keywords(s, "SHOW", "VIEWS") match {
      case Some(r) => r
      case None => return None
    }
    val afterIn = keywords(afterShow, "IN")
      .orElse(keywords(afterShow, "FROM")) match {
      case Some(r) => r
      case None => return None // bare SHOW VIEWS → session catalog
    }
    val trimmed = afterIn.dropWhile(_.isWhitespace)
    ident(trimmed) match {
      case Some((parts, rest)) if rest.forall(_.isWhitespace) =>
        val cm = session.sessionState.catalogManager
        def isGraft(name: String): Boolean = isGraftCatalog(session, name)
        if (cm.isCatalogRegistered(parts.head) && isGraft(parts.head))
          Some(GraftShowViewsCommand(parts.head, parts.tail))
        else if (!cm.isCatalogRegistered(parts.head) &&
            isGraft(cm.currentCatalog.name))
          Some(GraftShowViewsCommand(cm.currentCatalog.name, parts))
        else None
      case _ => None
    }
  }
}
