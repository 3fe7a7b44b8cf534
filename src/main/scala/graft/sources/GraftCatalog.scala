package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.{GraftTable, GraftTableMeta}

/** DSv2 catalog exposing [[GraftTable]] directories as SQL-addressable
  * tables — the named-table registry the reference keeps in its storage
  * wrapper (`storage/azurestoragewrapper.py:40-52`), lifted to Spark's
  * catalog protocol so a user's FIRST touch works:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/tables")
  *   spark.sql("SELECT * FROM graft.db.events WHERE cents BETWEEN 100 AND 199")
  *   spark.sql("SELECT * FROM graft.db.events VERSION AS OF 3")   // time travel
  *   spark.readStream.table("graft.db.events")                    // commit-log tailing
  * }}}
  *
  * Layout: `<root>/<namespace>/<table>` is a GraftTable directory whose
  * `_graft_meta.json` sidecar ([[GraftTableMeta]]) records keys /
  * partition column / index config. `CREATE TABLE ... PARTITIONED BY
  * (col) TBLPROPERTIES ('keys'='k1,k2', 'statsCols'='a,b',
  * 'bloomCols'='c', 'bloomBits'='1024')` creates + annotates one;
  * [[GraftTableMeta.annotate]] makes an existing Scala-API table
  * addressable.
  *
  * Reads plan through Spark's own vectorized parquet scan over the
  * version's live files with zone-map/Bloom skipping applied as file
  * pruning inside the scan (see `org.apache.spark.sql.graft
  * .GraftSqlRead`). The SQL statement surface covers the write side
  * too: `INSERT INTO`/`INSERT OVERWRITE`/`TRUNCATE` via the V1 write
  * bridge, `DELETE FROM` via `SupportsDeleteV2` (deletion-vector
  * commits for selective predicates), `MERGE INTO`/`UPDATE` via
  * `GraftRowLevelSqlStrategy` onto the keyed clause ladder, and
  * `ALTER TABLE ADD COLUMNS` via the sidecar schema evolution below —
  * every other ALTER class stays rejected by design.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog with ViewCatalog
    with StagingTableCatalog {

  // ------------------------------------------- atomic REPLACE (staging)
  //
  // CREATE OR REPLACE TABLE / REPLACE TABLE [AS SELECT] / atomic CTAS
  // through Spark's native StagingTableCatalog protocol, made ATOMIC by
  // a GENERATION POINTER: the staged table builds in a fresh
  // `<table>/gen_<uuid>` subdirectory (fully invisible — readers keep
  // resolving the old generation), and commit is ONE atomic move of the
  // `_graft_ptr` file naming the new generation. No crash window can
  // lose the table: before the pointer lands readers see the old state,
  // after it the new — the drop+create gap of the non-atomic fallback
  // is gone. A table created by plain CREATE TABLE lives directly in
  // `<table>/` (the legacy layout, no pointer); its first REPLACE
  // upgrades it to the generational layout (the pointer wins over
  // in-place metadata on resolve, so the upgrade commit is still the
  // single pointer move; the superseded in-place files are swept after,
  // crash-tolerantly). REPLACE starts a fresh history by design (the
  // documented divergence) — but now atomically.

  private def ptrFile(dir: String) = Paths.get(dir, "_graft_ptr")

  /** The directory actually holding the table's GraftTable: the
    * pointed-to generation when `_graft_ptr` exists, the table
    * directory itself otherwise (in-place layout).
    */
  private def resolveDir(ident: Identifier): String =
    GraftTableMeta.resolve(dirOf(ident.namespace, ident.name))

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stage(ident, info, StageMode.Create)

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident: Identifier)
    stage(ident, info, StageMode.Replace)
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: TableInfo): StagedTable =
    stage(ident, info, StageMode.CreateOrReplace)

  private object StageMode extends Enumeration {
    val Create, Replace, CreateOrReplace = Value
  }

  private def stage(ident: Identifier, info: TableInfo,
                    mode: StageMode.Value): StagedTable = {
    if (mode == StageMode.Create && tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (catalogName +: ident.namespace.toSeq :+ ident.name)
            .map(p => s"`$p`").mkString("."))
    val (schema, props) = enrichColumns(info.columns(), info.properties())
    validateIdent(ident, schema)
    val dir = dirOf(ident.namespace, ident.name)
    val gen = s"gen_${java.util.UUID.randomUUID().toString.replace("-", "").take(16)}"
    val genDir = s"$dir/$gen"
    Files.createDirectories(Paths.get(genDir))
    val gt =
      try buildTable(genDir, schema, info.partitions(), props)
      catch {
        case e: Throwable =>
          scala.util.Try(graft.operators.Fs.deleteTree(Paths.get(genDir)))
          throw e
      }
    val inner = org.apache.spark.sql.graft.GraftSqlRead
      .table(spark, gt, gt.currentVersion)
      .asInstanceOf[org.apache.spark.sql.graft.GraftSqlTable]
    new org.apache.spark.sql.graft.GraftStagedTable(inner,
      onCommit = () => commitGeneration(ident, dir, gen, mode),
      onAbort = () => {
        graft.operators.Fs.deleteTree(Paths.get(genDir))
        sweepIfBare(dir) // a table dir this stage created stays behind
      })
  }

  /** THE atomic swap: one tmp-write + atomic move of `_graft_ptr`.
    * Existence semantics re-check at commit time (CREATE's "nobody
    * beat me" is enforced by the pointer move itself — no
    * REPLACE_EXISTING, so the loser of two racing atomic CTAS commits
    * gets TableAlreadyExists instead of silently clobbering the
    * winner); post-swap cleanup of the superseded generation / legacy
    * in-place files is best-effort — the pointer already decides every
    * subsequent resolve, so leftover debris is inert.
    */
  private def commitGeneration(ident: Identifier, dir: String, gen: String,
                               mode: StageMode.Value): Unit = {
    val p = ptrFile(dir)
    val legacyLive = Files.exists(Paths.get(dir, "_graft_meta.json"))
    val oldGen = if (Files.isRegularFile(p)) Some(Files.readString(p).trim)
      else None
    val existed = legacyLive || oldGen.nonEmpty
    def abortWith(e: Throwable): Nothing = {
      scala.util.Try(graft.operators.Fs.deleteTree(Paths.get(s"$dir/$gen")))
      sweepIfBare(dir)
      throw e
    }
    def alreadyExists = new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(
        (catalogName +: ident.namespace.toSeq :+ ident.name)
          .map(x => s"`$x`").mkString("."))
    if (mode == StageMode.Create && existed) abortWith(alreadyExists)
    if (mode == StageMode.Replace && !existed)
      abortWith(new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident: Identifier))
    // the staged generation must still BE a table — a mis-configured
    // external sweep (or manual deletion) between stage and commit must
    // fail the statement, never point the table at garbage
    if (!Files.exists(Paths.get(s"$dir/$gen", "_graft_meta.json")))
      abortWith(new IllegalStateException(
        s"staged generation $gen of ${ident} vanished before commit — " +
          "the replace/create is aborted; the previous table state (if " +
          "any) is untouched"))
    val tmp = Paths.get(dir,
      s"._graft_ptr_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, gen)
    if (mode == StageMode.Create && !legacyLive) {
      // CREATE: publishing the pointer IS the existence gate. NOT a
      // rename — on POSIX Files.move(…, ATOMIC_MOVE) maps to rename(2),
      // which silently REPLACES an existing target, so two racing
      // atomic creates would both "win" and the loser's data would
      // clobber the winner's pointer. Hard-link creation is the
      // primitive that actually fails atomically on an existing target
      // (link(2) → EEXIST), the same OCC gate commitEntries uses.
      if (!GraftCatalog.publishPointerIfAbsent(tmp, p))
        abortWith(alreadyExists)
    } else
      Files.move(tmp, p,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // post-swap sweep: the generation the pointer just superseded, and
    // (on a legacy upgrade) the in-place table files — NOT other gen_
    // dirs, which may be concurrent stages in flight
    oldGen.filter(_ != gen).foreach { g =>
      scala.util.Try(graft.operators.Fs.deleteTree(Paths.get(s"$dir/$g")))
    }
    if (legacyLive)
      Option(Paths.get(dir).toFile.listFiles()).getOrElse(Array.empty)
        .foreach { f =>
          val keep = f.getName == "_graft_ptr" || f.getName.startsWith("gen_")
          if (!keep) scala.util.Try(graft.operators.Fs.deleteTree(f.toPath))
        }
  }

  /** Remove a table directory that holds NO table (no meta, no
    * pointer) and no other entries — the debris an aborted staged
    * CREATE would otherwise leave, which blocks DROP NAMESPACE.
    */
  private def sweepIfBare(dir: String): Unit = {
    val d = Paths.get(dir)
    val bare = Files.isDirectory(d) &&
      !Files.exists(d.resolve("_graft_meta.json")) &&
      !Files.isRegularFile(d.resolve("_graft_ptr")) &&
      Option(d.toFile.listFiles()).getOrElse(Array.empty).isEmpty
    if (bare) { scala.util.Try(Files.deleteIfExists(d)); () }
  }

  // ------------------------------------------------------------- views
  //
  // Spark 4's native V2 view protocol (the ViewCatalog interface ships
  // UNWIRED in vanilla 4.1 — no SQL statement routes here on its own):
  // CREATE [OR REPLACE] VIEW / DROP VIEW / SHOW VIEWS / ALTER VIEW …
  // {AS | SET/UNSET TBLPROPERTIES} reach these methods through the
  // injected parser (graft.ext.GraftSqlParser) on extension sessions,
  // or the CALL procedures elsewhere; SELECTs through a view
  // re-resolve its stored SQL in the view's own catalog+namespace
  // context (graft.ext.GraftResolveViews) — filters/pruning push into
  // the underlying table scan as if the query were inlined. Views
  // persist as one small metadata file each under `<ns>/_graft_views/`
  // ([[GraftViews]]).

  override def listViews(namespace: String*): Array[Identifier] = {
    if (namespace.nonEmpty && !Files.isDirectory(nsDir(namespace.toArray)))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)
    GraftViews.list(root, namespace.toSeq)
      .map(n => Identifier.of(namespace.toArray, n)).toArray
  }

  override def loadView(ident: Identifier): View =
    GraftViews.read(root, ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  override def viewExists(ident: Identifier): Boolean =
    GraftViews.exists(root, ident)

  override def createView(info: ViewInfo): View = {
    require(!tableExists(info.ident),
      s"cannot create view ${info.ident}: a TABLE with that name exists")
    if (GraftViews.exists(root, info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(info.ident)
    GraftViews.write(root, info.ident, info.ident.name, info.sql,
      info.currentCatalog, info.currentNamespace.toSeq, info.schema,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq,
      scala.jdk.CollectionConverters.MapHasAsScala(info.properties)
        .asScala.toMap)
    loadView(info.ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    require(!tableExists(info.ident),
      s"cannot create view ${info.ident}: a TABLE with that name exists")
    if (!orCreate && !GraftViews.exists(root, info.ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(info.ident)
    GraftViews.write(root, info.ident, info.ident.name, info.sql,
      info.currentCatalog, info.currentNamespace.toSeq, info.schema,
      info.queryColumnNames.toSeq, info.columnAliases.toSeq,
      info.columnComments.toSeq,
      scala.jdk.CollectionConverters.MapHasAsScala(info.properties)
        .asScala.toMap)
    loadView(info.ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val v = loadView(ident).asInstanceOf[GraftView]
    var props = v.propsMap
    changes.foreach {
      case sp: ViewChange.SetProperty => props += (sp.property -> sp.value)
      case rp: ViewChange.RemoveProperty => props -= rp.property
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER VIEW change $other")
    }
    val updated = v.withProperties(props)
    updated.persist(root, ident)
    updated
  }

  override def dropView(ident: Identifier): Boolean = {
    val f = GraftViews.fileFor(root, ident)
    Files.deleteIfExists(f)
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!GraftViews.exists(root, oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (GraftViews.exists(root, newIdent) || tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    val v = loadView(oldIdent).asInstanceOf[GraftView]
    Files.createDirectories(
      GraftViews.dirFor(root, newIdent.namespace.toSeq))
    GraftViews.write(root, newIdent, newIdent.name, v.query(),
      v.currentCatalog(), v.currentNamespace().toSeq, v.schema(),
      v.queryColumnNames().toSeq, v.columnAliases().toSeq,
      v.columnComments().toSeq, v.propsMap)
    Files.deleteIfExists(GraftViews.fileFor(root, oldIdent))
    ()
  }

  /** FunctionCatalog: the engine resolves a scan's reported
    * `bucket(n, col)` partition transform through here (storage-
    * partitioned joins over hidden bucket partitioning — the Iceberg
    * idiom). One function, namespace-agnostic.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !Files.isDirectory(nsDir(namespace)))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)
    Array(Identifier.of(namespace, "bucket"))
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket"))
      org.apache.spark.sql.graft.GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  private var catalogName: String = _
  private var root: String = _

  /** The catalog's root directory ([[GraftMaterializedViews]] builds
    * state-table paths under it).
    */
  private[sources] def rootDir: String = root

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"GraftCatalog requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  /** Opt into Spark 4's constraint DDL: `ALTER TABLE … ADD/DROP
    * CONSTRAINT … CHECK` analyzes only when the catalog declares it.
    */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      // column DEFAULT values: the analyzer stores the default in the
      // column metadata (CURRENT_DEFAULT/EXISTS_DEFAULT) and fills
      // omitted INSERT columns; the schema sidecar persists the
      // metadata verbatim (StructType.json), so defaults survive
      // restarts — CREATE TABLE-time only (ALTER ADD COLUMN keeps the
      // nullable-null contract: existing rows project null)
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // GENERATED ALWAYS AS (expr) + GENERATED ALWAYS AS IDENTITY:
      // the analyzer stores the generation/identity spec in the column
      // metadata (persisted verbatim by the schema sidecar);
      // [[GraftTable.conform]] computes generated values and allocates
      // identity blocks on every write path
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  private def spark = SparkSession.active

  private def dirOf(ns: Array[String], table: String): String =
    (root +: ns.toSeq :+ table).mkString("/")

  private def nsDir(ns: Array[String]): java.nio.file.Path =
    Paths.get((root +: ns.toSeq).mkString("/"))

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        catalogName +: namespace.toSeq)
    Option(d.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory &&
        (Files.exists(f.toPath.resolve("_graft_meta.json")) ||
          Files.isRegularFile(f.toPath.resolve("_graft_ptr"))))
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTableMeta.read(resolveDir(ident)).nonEmpty

  private def open(ident: Identifier): GraftTable =
    GraftTableMeta.open(spark, resolveDir(ident)).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        ident: org.apache.spark.sql.connector.catalog.Identifier))

  /** [[GraftProcedures]]' table access (procedures receive table refs
    * as string arguments — `'db.t'` — and open through the catalog's
    * own registry).
    */
  private[sources] def openTable(ident: Identifier): GraftTable = open(ident)

  // ----------------------------------------------------- procedures
  //
  // SQL maintenance statements (`CALL graft.system.restore/vacuum/
  // compact/compact_dv(…)`) — the Iceberg stored-procedure idiom over
  // Spark 4's native ProcedureCatalog. See [[GraftProcedures]].

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      GraftProcedures.identifiers
    else Array.empty

  override def loadTable(ident: Identifier): Table = {
    // `<name>__changes` is the table's CDC feed (the Iceberg
    // metadata-table idiom): a relation emitting _change_type rows per
    // version increment as a stream, or batch-read with a default
    // full-history anchor (snapshot-as-inserts)
    if (ident.name.endsWith("__changes")) {
      val base = Identifier.of(ident.namespace,
        ident.name.stripSuffix("__changes"))
      if (tableExists(base))
        return new org.apache.spark.sql.graft.GraftCdcTable(spark, open(base))
    }
    // `<name>__history` is DESCRIBE HISTORY as a metadata table: one
    // row per retained version (commit clock, kind, delta sizes,
    // markers), served as a local scan — no distributed job
    if (ident.name.endsWith("__history")) {
      val base = Identifier.of(ident.namespace,
        ident.name.stripSuffix("__history"))
      if (tableExists(base))
        return new org.apache.spark.sql.graft.GraftHistoryTable(spark, open(base))
    }
    // `<name>__detail` is DESCRIBE DETAIL as a metadata table: ONE row
    // of table-level facts (location, layout, version, live files/
    // bytes/partitions, constraint + column-mapping state) from the
    // manifest and sidecars only — a local scan, no distributed job
    if (ident.name.endsWith("__detail")) {
      val base = Identifier.of(ident.namespace,
        ident.name.stripSuffix("__detail"))
      if (tableExists(base))
        return new org.apache.spark.sql.graft.GraftDetailTable(spark, open(base))
    }
    val gt = open(ident)
    org.apache.spark.sql.graft.GraftSqlRead.table(spark, gt, gt.currentVersion)
  }

  /** `VERSION AS OF v` time travel — the pinned version's live set. On
    * a `<name>__changes` identifier it instead anchors a BATCH change
    * feed: every `_change_type` row since version v (the Delta
    * `table_changes` semantic).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    def parse(gt: GraftTable): Long = {
      val v = scala.util.Try(version.trim.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"GraftCatalog versions are commit numbers, got '$version'"))
      require(gt.versions.contains(v),
        s"version $v does not exist for table ${gt.path}")
      v
    }
    if (ident.name.endsWith("__changes")) {
      val base = Identifier.of(ident.namespace,
        ident.name.stripSuffix("__changes"))
      if (tableExists(base)) {
        val gt = open(base)
        return new org.apache.spark.sql.graft.GraftCdcTable(spark, gt,
          batchSince = Some(parse(gt)))
      }
    }
    val gt = open(ident)
    org.apache.spark.sql.graft.GraftSqlRead.table(spark, gt, parse(gt))
  }

  /** `TIMESTAMP AS OF t` time travel: the latest version committed at
    * or before `t` (micros since epoch; manifest mtimes are the commit
    * clock).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val gt = open(ident)
    org.apache.spark.sql.graft.GraftSqlRead.table(spark, gt,
      gt.versionAtTimestamp(timestampMicros))
  }

  /** Column-spec form of CREATE TABLE — the path the analyzer takes
    * when GENERATED / IDENTITY column capabilities are declared: the
    * generation expression and identity (start, step, allowExplicit)
    * arrive on the [[org.apache.spark.sql.connector.catalog.Column]]
    * objects (NOT in the StructType), get encoded into the schema
    * sidecar's column metadata, and [[GraftTable]]'s `conform` applies
    * them on every write path. Identity columns auto-join `statsCols`
    * so the high-watermark read stays metadata-only.
    */
  /** GENERATED / IDENTITY specs arrive on the V2 Column objects —
    * encode them into StructField metadata (persisted by the schema
    * sidecar) and auto-join identity columns into statsCols so the
    * high-watermark read stays metadata-only.
    */
  private def enrichColumns(
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      properties: java.util.Map[String, String])
      : (StructType, java.util.Map[String, String]) = {
    val base = org.apache.spark.sql.graft.Bridge
      .v2ColumnsToStructType(columns)
    var identityCols = Seq.empty[String]
    val enriched = StructType(base.fields.zip(columns).map { case (f, c) =>
      var mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      Option(c.generationExpression()).foreach { g =>
        mb = mb.putString(GraftTable.GeneratedExprKey, g)
      }
      Option(c.identityColumnSpec()).foreach { s =>
        identityCols :+= f.name
        mb = mb.putLong(GraftTable.IdentityStartKey, s.getStart)
          .putLong(GraftTable.IdentityStepKey, s.getStep)
          .putBoolean(GraftTable.IdentityExplicitKey, s.isAllowExplicitInsert)
      }
      f.copy(metadata = mb.build())
    })
    val props =
      if (identityCols.isEmpty) properties
      else {
        val m = new java.util.LinkedHashMap[String, String](properties)
        val prev = Option(m.get("statsCols")).toSeq
          .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        m.put("statsCols", (prev ++ identityCols).distinct.mkString(","))
        m
      }
    (enriched, props)
  }

  override def createTable(ident: Identifier,
                           columns: Array[org.apache.spark.sql.connector.catalog.Column],
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val (enriched, props) = enrichColumns(columns, properties)
    createTable(ident, enriched, partitions, props)
  }

  /** Ident-level invariants shared by createTable and the staging
    * path: reserved metadata-table suffixes and the reserved synthetic
    * partition column name.
    */
  private def validateIdent(ident: Identifier, schema: StructType): Unit = {
    require(!schema.fieldNames.contains(GraftTable.SyntheticPartition),
      s"column name ${GraftTable.SyntheticPartition} is reserved")
    // `<name>__changes` / `<name>__history` are metadata-table
    // identifiers of `<name>` — a real table by either name would be
    // unreachable (loadTable routes them to the base table's feed)
    require(!ident.name.endsWith("__changes"),
      s"table name ${ident.name} is reserved: the __changes suffix " +
        "addresses a table's CDC feed")
    require(!ident.name.endsWith("__history"),
      s"table name ${ident.name} is reserved: the __history suffix " +
        "addresses a table's commit history")
    require(!ident.name.endsWith("__detail"),
      s"table name ${ident.name} is reserved: the __detail suffix " +
        "addresses a table's DESCRIBE DETAIL metadata table")
  }

  /** Materialize a GraftTable at `dir` from the SQL-surface arguments
    * (transform parsing, key/index properties, schema sidecar) — the
    * shared build step of createTable (in-place) and the staging path
    * (a generation subdirectory).
    */
  private def buildTable(dir: String, schema: StructType,
                         partitions: Array[Transform],
                         properties: java.util.Map[String, String])
      : GraftTable = {
    // each transform = (source column, xform tag): identity passes the
    // value through; years/months/days/hours/bucket(n)/truncate(w) are
    // HIDDEN partitioning (the Iceberg vocabulary) — the table derives
    // the partition value itself on every write path
    val partSpecs: Seq[(String, String)] = partitions.toSeq.map { t =>
      def ref: String = {
        val refs = t.references.toSeq.flatMap(_.fieldNames.toSeq)
        require(refs.length == 1,
          s"PARTITIONED BY transform ${t.describe()} must reference " +
            "exactly one column")
        refs.head
      }
      def width: Int = t.arguments.collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value.isInstanceOf[Number] =>
          l.value.asInstanceOf[Number].intValue
      }.getOrElse(throw new IllegalArgumentException(
        s"transform ${t.describe()} needs an integer argument"))
      t.name match {
        case "identity" => ref -> "identity"
        case n @ ("years" | "months" | "days" | "hours") => ref -> n
        case "bucket" => ref -> s"bucket[$width]"
        case "truncate" => ref -> s"truncate[$width]"
        case other => throw new IllegalArgumentException(
          s"GraftCatalog supports identity/years/months/days/hours/" +
            s"bucket/truncate PARTITIONED BY transforms, got '$other'")
      }
    }
    val partCols = partSpecs.map(_._1)
    val hiddenXform = partSpecs.exists(_._2 != "identity")
    partCols.foreach(c => require(schema.fieldNames.contains(c),
      s"PARTITIONED BY column '$c' is not in the table schema"))
    // zero partition columns → one synthetic partition (unpartitioned
    // table); several, or ANY non-identity transform → composed into
    // one synthetic path level (the table derives the rendered value);
    // one identity column → plain physical partitioning
    val (pcol, psrc, pxf) = partCols match {
      case Seq(one) if !hiddenXform =>
        (one, Seq.empty[String], Seq.empty[String])
      case Seq() =>
        (GraftTable.SyntheticPartition, Seq.empty[String], Seq.empty[String])
      case many =>
        (GraftTable.SyntheticPartition, many, partSpecs.map(_._2))
    }
    def csv(k: String) = Option(properties.get(k)).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val keys = csv("keys")
    require(keys.nonEmpty,
      "GraftCatalog tables need TBLPROPERTIES ('keys'='k1[,k2...]')")
    val bloomBits = Option(properties.get("bloomBits")).map(_.toInt).getOrElse(1024)
    Files.createDirectories(Paths.get(dir).getParent)
    val gt = new GraftTable(spark, dir, keys, pcol,
      csv("statsCols"), csv("bloomCols"), bloomBits, psrc, pxf)
    gt.createIfNotExists(schema)
    GraftTableMeta.annotate(gt)
    // non-config, non-engine-reserved TBLPROPERTIES persist as
    // free-form properties (the sidecar ALTER TABLE SET TBLPROPERTIES
    // maintains) — policy keys like analyze_after_commits validate here
    val userProps = properties.entrySet().toArray(
      Array.empty[java.util.Map.Entry[String, String]]).toSeq
      .map(e => e.getKey -> e.getValue)
      .filterNot { case (k, _) => GraftCatalog.ConfigProps.contains(k) }
    if (userProps.nonEmpty) gt.setTableProps(userProps.toMap)
    gt
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (catalogName +: ident.namespace.toSeq :+ ident.name).map(p => s"`$p`")
          .mkString("."))
    validateIdent(ident, schema)
    val gt = buildTable(dirOf(ident.namespace, ident.name), schema,
      partitions, properties)
    org.apache.spark.sql.graft.GraftSqlRead.table(spark, gt, gt.currentVersion)
  }

  /** `ALTER TABLE ADD COLUMNS` maps onto the lock-safe sidecar
    * evolution (merge-by-union — concurrent writers cannot lose the
    * column): existing files and versions project typed null, zero
    * data rewrites. `ALTER TABLE ADD/DROP CONSTRAINT … CHECK` (Spark
    * 4's native constraint DDL) maps onto [[GraftTable.addCheck]] /
    * `dropCheck` — ADD validates the CURRENT rows first and throws
    * `CheckViolationException` without recording anything if they
    * violate; from then on every mutation that would commit a
    * violating row aborts atomically (no version, no files).
    * `ALTER TABLE RENAME COLUMN / DROP COLUMN` are METADATA-ONLY via
    * column mapping ([[graft.operators.GraftTable.columnMap]], the
    * Delta shape): zero file rewrites, reads translate, key/partition/
    * CHECK-referenced columns reject. Type changes stay rejected by
    * design — they would reinterpret already-written files.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val gt = open(ident)
    // VALIDATE the whole change set BEFORE applying anything: a batch
    // mixing an AddColumn with a rejected change (merge schema
    // evolution emits both kinds) must not persist the add and then
    // fail — the statement aborts with the table untouched. EVERY
    // structural rejection the apply loop makes is mirrored here:
    // nested field names, non-nullable/positioned adds, unsupported
    // change classes, and the type-widening lattice
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"GraftCatalog: nested RENAME COLUMN (${r.fieldNames.mkString(".")}) " +
            "is not supported")
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"GraftCatalog: nested DROP COLUMN (${d.fieldNames.mkString(".")}) " +
            "is not supported")
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"GraftCatalog: nested ADD COLUMNS (${a.fieldNames.mkString(".")}) " +
            "is not supported")
        require(a.isNullable,
          s"GraftCatalog: added column ${a.fieldNames.head} must be nullable " +
            "— existing rows project null")
        require(a.position() == null,
          s"GraftCatalog: ADD COLUMNS ${a.fieldNames.head} with a position " +
            "(FIRST/AFTER) is not supported — columns append at the end")
      case _: TableChange.AddConstraint | _: TableChange.DropConstraint => ()
      case sp: TableChange.SetProperty =>
        require(!GraftCatalog.ConfigProps.contains(sp.property),
          s"GraftCatalog: property '${sp.property}' is table CONFIG, " +
            "fixed at CREATE TABLE — it cannot be altered")
        // policy keys validate their value HERE (all-or-nothing batch)
        if (sp.property == graft.operators.GraftTable.AutoAnalyzeProp)
          require(scala.util.Try(sp.value.toLong).toOption.exists(_ > 0),
            s"GraftCatalog: ${sp.property} must be a positive integer, " +
              s"got '${sp.value}'")
      case rp: TableChange.RemoveProperty =>
        require(!GraftCatalog.ConfigProps.contains(rp.property),
          s"GraftCatalog: property '${rp.property}' is table CONFIG, " +
            "fixed at CREATE TABLE — it cannot be removed")
      case u: TableChange.UpdateColumnType if u.fieldNames.length > 1 =>
        throw new IllegalArgumentException(
          s"GraftCatalog: nested ALTER COLUMN (${u.fieldNames.mkString(".")}) " +
            "is not supported")
      case u: TableChange.UpdateColumnType if u.fieldNames.length == 1 =>
        val curType = gt.declaredLogicalSchema
          .flatMap(_.fields.find(_.name == u.fieldNames.head).map(_.dataType))
        if (curType.exists(c =>
            GraftTable.Widenings.contains(u.newDataType -> c)))
          throw new IllegalArgumentException(
            s"GraftCatalog: column '${u.fieldNames.head}' would NARROW " +
              s"from ${curType.get.simpleString} to " +
              s"${u.newDataType.simpleString} — narrower sources need no " +
              "schema evolution: CAST the source column to " +
              s"${curType.get.simpleString}, or drop WITH SCHEMA " +
              "EVOLUTION (a plain MERGE up-casts narrower sources)")
        if (!curType.contains(u.newDataType) &&
            curType.exists(c =>
              !GraftTable.Widenings.contains(c -> u.newDataType)))
          throw new IllegalArgumentException(
            s"GraftCatalog: column '${u.fieldNames.head}' cannot change " +
              s"from ${curType.get.simpleString} to " +
              s"${u.newDataType.simpleString} — only the widening lattice " +
              "(byte/short/int/long up-chain, float -> double) evolves " +
              "metadata-only; CAST the source column instead")
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER TABLE change $other — supported: " +
          "ADD COLUMNS (nullable, top-level), RENAME COLUMN, DROP COLUMN, " +
          "ALTER COLUMN TYPE (widening), ADD/DROP CONSTRAINT … CHECK, " +
          "and SET/UNSET TBLPROPERTIES (non-config keys); schema " +
          "otherwise evolves on the write path")
    }
    changes.collect {
      // metadata-only column mapping (round 11, the Delta shape): zero
      // file rewrites — reads translate, old files keep physical names,
      // a re-added dropped name gets a fresh physical slot
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          s"GraftCatalog: nested RENAME COLUMN (${r.fieldNames.mkString(".")}) " +
            "is not supported")
        gt.renameColumn(r.fieldNames.head, r.newName)
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          s"GraftCatalog: nested DROP COLUMN (${d.fieldNames.mkString(".")}) " +
            "is not supported")
        if (d.ifExists && !gt.read.schema.fieldNames.contains(d.fieldNames.head)) ()
        else gt.dropColumn(d.fieldNames.head)
      // metadata-only TYPE WIDENING (round 11): the declared schema
      // widens along the probed lattice, files keep their narrower
      // physical type, the parquet readers up-convert per file
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1,
          s"GraftCatalog: nested ALTER COLUMN (${u.fieldNames.mkString(".")}) " +
            "is not supported")
        // pre-validated above (narrowing / off-lattice throw before
        // ANY change lands); equal types no-op, widenings evolve
        // metadata-only
        val curType = gt.declaredLogicalSchema
          .flatMap(_.fields.find(_.name == u.fieldNames.head).map(_.dataType))
        if (!curType.contains(u.newDataType))
          gt.widenColumnType(u.fieldNames.head, u.newDataType)
      case a: TableChange.AddConstraint => a.constraint() match {
        case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
          require(ck.predicateSql != null && ck.predicateSql.nonEmpty,
            "GraftCatalog: CHECK constraint carries no predicate SQL")
          gt.addCheck(ck.name, ck.predicateSql)
        case other => throw new UnsupportedOperationException(
          s"GraftCatalog: unsupported constraint ${other.toDDL} — only " +
            "CHECK constraints are supported (keys are declared at CREATE " +
            "TABLE via TBLPROPERTIES; PRIMARY KEY / UNIQUE / FOREIGN KEY " +
            "are not enforceable here)")
      }
      case d: TableChange.DropConstraint =>
        if (!d.ifExists) require(gt.checks.contains(d.name),
          s"GraftCatalog: no CHECK constraint named '${d.name}' on the " +
            s"table — existing: ${gt.checks.keys.toSeq.sorted.mkString(", ")}")
        gt.dropCheck(d.name)
      case sp: TableChange.SetProperty =>
        gt.setTableProps(Map(sp.property -> sp.value))
      case rp: TableChange.RemoveProperty =>
        gt.unsetTableProps(Seq(rp.property))
    }
    val adds = changes.filterNot(c => c.isInstanceOf[TableChange.AddConstraint]
      || c.isInstanceOf[TableChange.DropConstraint]
      || c.isInstanceOf[TableChange.RenameColumn]
      || c.isInstanceOf[TableChange.DeleteColumn]
      || c.isInstanceOf[TableChange.UpdateColumnType]
      || c.isInstanceOf[TableChange.SetProperty]
      || c.isInstanceOf[TableChange.RemoveProperty]).map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          s"GraftCatalog: nested ADD COLUMNS (${a.fieldNames.mkString(".")}) " +
            "is not supported")
        require(a.isNullable,
          s"GraftCatalog: added column ${a.fieldNames.head} must be nullable " +
            "— existing rows project null")
        // sidecar evolution APPENDS; honoring FIRST/AFTER would
        // reinterpret positional consumers of already-written files —
        // reject rather than silently appending
        require(a.position() == null,
          s"GraftCatalog: ADD COLUMNS ${a.fieldNames.head} with a position " +
            "(FIRST/AFTER) is not supported — columns append at the end")
        org.apache.spark.sql.types.StructField(a.fieldNames.head, a.dataType,
          nullable = true)
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog: unsupported ALTER TABLE change $other — supported: " +
          "ADD COLUMNS (nullable, top-level), RENAME COLUMN, DROP COLUMN " +
          "and ADD/DROP CONSTRAINT … CHECK; schema otherwise evolves on " +
          "the write path")
    }
    if (adds.nonEmpty) gt.addColumns(adds)
    org.apache.spark.sql.graft.GraftSqlRead.table(spark, gt, gt.currentVersion)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = Paths.get(dirOf(ident.namespace, ident.name))
    // only remove directories that ARE graft tables (the same
    // meta/pointer predicate tableExists/listTables use) — DROP
    // TABLE on an identifier that happens to name an arbitrary
    // directory under the catalog root must not delete it. A
    // generational table drops whole (pointer + every generation).
    if (!Files.isDirectory(dir) ||
      (!Files.exists(dir.resolve("_graft_meta.json")) &&
        !Files.isRegularFile(dir.resolve("_graft_ptr")))) return false
    graft.operators.Fs.deleteTree(dir)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(!newIdent.name.endsWith("__changes"),
      s"table name ${newIdent.name} is reserved: the __changes suffix " +
        "addresses a table's CDC feed")
    require(!newIdent.name.endsWith("__history"),
      s"table name ${newIdent.name} is reserved: the __history suffix " +
        "addresses a table's commit history")
    require(!newIdent.name.endsWith("__detail"),
      s"table name ${newIdent.name} is reserved: the __detail suffix " +
        "addresses a table's DESCRIBE DETAIL metadata table")
    val from = Paths.get(dirOf(oldIdent.namespace, oldIdent.name))
    val to = Paths.get(dirOf(newIdent.namespace, newIdent.name))
    if (!Files.isDirectory(from))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        oldIdent: org.apache.spark.sql.connector.catalog.Identifier)
    if (Files.exists(to))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (catalogName +: newIdent.namespace.toSeq :+ newIdent.name).map(p => s"`$p`")
          .mkString("."))
    Files.createDirectories(to.getParent)
    Files.move(from, to)
    ()
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    Option(Paths.get(root).toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(f => Array(f.getName))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (Files.isDirectory(nsDir(namespace))) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    if (Files.isDirectory(nsDir(namespace)))
      java.util.Collections.emptyMap[String, String]()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
      catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("GraftCatalog namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) return false
    val children = Option(d.toFile.listFiles()).getOrElse(Array.empty)
    if (children.nonEmpty && !cascade)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    // cascade only reclaims graft tables; refuse if a non-table
    // directory is nested here (same guard as dropTable)
    // a dir holding ONLY gen_* entries (no meta, no pointer) is the
    // debris of a crashed staged CREATE — graft-owned, reclaimable
    def stageDebris(c: java.io.File): Boolean =
      Option(c.listFiles()).getOrElse(Array.empty).forall(e =>
        e.getName.startsWith("gen_") || e.getName.startsWith("._graft_"))
    val strangers = children.filter(c => c.isDirectory &&
      c.getName != "_graft_views" && // the namespace's view store
      !Files.exists(c.toPath.resolve("_graft_meta.json")) &&
      !Files.isRegularFile(c.toPath.resolve("_graft_ptr")) &&
      !stageDebris(c))
    if (strangers.nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} contains non-graft-table " +
          s"directories: ${strangers.map(_.getName).mkString(", ")}")
    graft.operators.Fs.deleteTree(d)
    true
  }
}

object GraftCatalog {

  /** CREATE-time TBLPROPERTIES consumed as table CONFIG (or written by
    * the engine itself) — never persisted to the free-form property
    * sidecar, and rejected by ALTER TABLE SET TBLPROPERTIES (config is
    * immutable after CREATE).
    */
  private[sources] val ConfigProps: Set[String] = Set(
    "keys", "statsCols", "bloomCols", "bloomBits",
    // Spark-managed reserved keys that ride createTable properties
    "provider", "owner", "location", "external", "is_managed_location",
    "option.path", "path")

  /** Atomically publish `tmp`'s content at `target` ONLY if `target`
    * does not exist: hard-link creation (link(2) → EEXIST on an
    * existing target — unlike rename(2), which silently replaces), with
    * an exclusive CREATE_NEW copy as the fallback for filesystems
    * without hard links. Returns false when `target` already exists —
    * the loser of a racing-create commit. `tmp` is consumed either way.
    */
  private[sources] def publishPointerIfAbsent(
      tmp: java.nio.file.Path, target: java.nio.file.Path): Boolean =
    try {
      try { Files.createLink(target, tmp); true }
      catch {
        case _: UnsupportedOperationException =>
          // no hard links (e.g. some network mounts): exclusive create
          // of the target — CREATE_NEW fails atomically on existence
          try {
            Files.write(target, Files.readAllBytes(tmp),
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
      }
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      scala.util.Try(Files.deleteIfExists(tmp)); ()
    }
}
