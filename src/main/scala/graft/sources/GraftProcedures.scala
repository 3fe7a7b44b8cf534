package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.GraftTable

/** SQL MAINTENANCE STATEMENTS as stored procedures (the Iceberg
  * `CALL cat.system.<proc>(…)` idiom over Spark 4's native
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]] —
  * analyzer `ResolveProcedures`/`BindProcedures`/`InvokeProcedures`
  * do the resolution, named/default arguments and invocation; `SHOW
  * PROCEDURES` / `DESCRIBE PROCEDURE` work out of the box):
  *
  * {{{
  *   CALL graft.system.restore('db.t', 3)
  *   CALL graft.system.vacuum('db.t', keep_versions => 2)
  *   CALL graft.system.compact('db.t')
  *   CALL graft.system.compact_dv('db.t', max_fraction => 0.1)
  *   CALL graft.system.compact_range('db.t', 'cents', buckets => 8)
  * }}}
  *
  * Each procedure is driver-orchestrated metadata work plus the same
  * distributed jobs its Scala API twin runs ([[GraftTable.restore]] /
  * `vacuum` / `compact` / `compactDvHeavy`), and returns ONE summary
  * row through a [[LocalScan]] so `CALL` surfaces what happened.
  */
object GraftProcedures {

  private val TableParam =
    ProcedureParameter.in("table", StringType)
      .comment("table identifier under this catalog, e.g. 'db.t'").build()

  val identifiers: Array[Identifier] =
    Array("restore", "vacuum", "compact", "compact_dv", "compact_range",
        "analyze", "show_stats", "create_view", "drop_view", "show_views",
        "create_mview", "create_mview_sql", "refresh_mview",
        "refresh_all_mviews", "drop_mview")
      .map(n => Identifier.of(Array("system"), n))

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.toSeq == Seq("system"),
      s"procedures live under the 'system' namespace, got " +
        s"${(ident.namespace :+ ident.name).mkString(".")}")
    def open(tableRef: String): GraftTable = {
      val parts = tableRef.split('.')
      require(parts.length >= 1 && parts.forall(_.nonEmpty),
        s"bad table reference '$tableRef' — expected 'namespace.table'")
      cat.openTable(Identifier.of(parts.dropRight(1), parts.last))
    }
    ident.name match {
      case "restore" => proc("restore",
        "restore the table to a committed version as a NEW commit " +
          "(all history stays time-travelable)",
        Array(TableParam,
          ProcedureParameter.in("version", LongType).build()),
        StructType(Seq(StructField("table", StringType),
          StructField("restored_to", LongType),
          StructField("new_version", LongType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val v = in.getLong(1)
          t.restore(v)
          Seq(InternalRow(in.getUTF8String(0).copy(), v, t.currentVersion))
        })
      case "vacuum" => proc("vacuum",
        "reclaim history: keep the last keep_versions manifests, " +
          "delete data files only they referenced, sweep orphans; " +
          "dry_run => true reports what WOULD reclaim without touching " +
          "anything (orphan_files is -1 on real vacuums — not counted, " +
          "the sweep itself reclaims them)",
        Array(TableParam,
          ProcedureParameter.in("keep_versions", IntegerType)
            .defaultValue("1").build(),
          ProcedureParameter.in("dry_run", BooleanType)
            .defaultValue("false").build()),
        StructType(Seq(StructField("table", StringType),
          StructField("kept_versions", IntegerType),
          StructField("live_files", IntegerType),
          StructField("dry_run", BooleanType),
          StructField("reclaimable_versions", IntegerType),
          StructField("reclaimable_files", LongType),
          StructField("reclaimable_bytes", LongType),
          StructField("orphan_files", LongType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val keep = in.getInt(1)
          val dry = in.getBoolean(2)
          // real vacuums skip the dry run's orphan tree walk (their own
          // sweep covers orphans): orphan_files reports -1 = not counted
          val r = t.vacuumDryRun(keep, includeOrphans = dry)
          if (!dry) {
            t.vacuum(keep)
            // atomic-REPLACE housekeeping: when this table is a pointed-
            // to generation, sweep SIBLING gen_ dirs that are NOT
            // current and whose NEWEST file (deep mtime — an in-flight
            // stage keeps writing, so its tree stays fresh) is older
            // than the grace window (default 24h, the conservative
            // orphan-cleanup posture) — debris of stages that crashed
            // before commit. commitGeneration independently verifies
            // the staged generation still exists before any pointer
            // swap, so even a mis-tuned grace can only fail a straggler
            // replace loudly, never point the table at garbage.
            val genDir = java.nio.file.Paths.get(t.path)
            val tableDir = genDir.getParent
            val ptr = tableDir.resolve("_graft_ptr")
            if (java.nio.file.Files.isRegularFile(ptr)) {
              val current = java.nio.file.Files.readString(ptr).trim
              val grace = org.apache.spark.sql.SparkSession.active.conf
                .get("spark.graft.vacuum.generationGraceMs", "86400000")
                .toLong
              val cutoff = System.currentTimeMillis() - grace
              def newestMtime(p: java.nio.file.Path): Long = {
                var mx = 0L
                // close the walk stream — forEach alone leaks the
                // directory fd per swept sibling on long-lived sessions
                val s = java.nio.file.Files.walk(p)
                try s.forEach { f =>
                  val m = java.nio.file.Files.getLastModifiedTime(f).toMillis
                  if (m > mx) mx = m
                } finally s.close()
                mx
              }
              Option(tableDir.toFile.listFiles()).getOrElse(Array.empty)
                .foreach { f =>
                  if (f.isDirectory && f.getName.startsWith("gen_") &&
                      f.getName != current &&
                      scala.util.Try(newestMtime(f.toPath))
                        .getOrElse(Long.MaxValue) < cutoff)
                    scala.util.Try(graft.operators.Fs.deleteTree(f.toPath))
                }
            }
          }
          Seq(InternalRow(in.getUTF8String(0).copy(),
            math.min(keep, t.versions.size), t.dataFileCount, dry,
            r.droppedVersions.size, r.deadFiles, r.deadBytes,
            r.orphanFiles))
        })
      case "compact" => proc("compact",
        "rewrite every partition's live files into parallelism files " +
          "(content-invariant; purges deletion vectors)",
        Array(TableParam,
          ProcedureParameter.in("parallelism", IntegerType)
            .defaultValue("16").build()),
        StructType(Seq(StructField("table", StringType),
          StructField("live_files", IntegerType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          t.compact(in.getInt(1))
          Seq(InternalRow(in.getUTF8String(0).copy(), t.dataFileCount))
        })
      case "compact_dv" => proc("compact_dv",
        "when the fraction of deletion-vector'd live files exceeds " +
          "max_fraction, rewrite exactly those partitions and purge " +
          "the vectors (restores the columnar filter-pushed scan)",
        Array(TableParam,
          ProcedureParameter.in("max_fraction", DoubleType)
            .defaultValue("0.1").build()),
        StructType(Seq(StructField("table", StringType),
          StructField("compacted", BooleanType),
          StructField("dv_fraction_before", DoubleType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val (did, before) = t.compactDvHeavyMeasured(in.getDouble(1))
          Seq(InternalRow(in.getUTF8String(0).copy(), did, before))
        })
      case "compact_range" => proc("compact_range",
        "range-clustering compaction (the OPTIMIZE … ZORDER intent): " +
          "re-cut each partition into ~buckets range-disjoint, sorted " +
          "files on cluster_by (comma-separated columns), so file-level " +
          "zone maps and row-group stats become selective on them " +
          "(content-invariant; purges deletion vectors)",
        Array(TableParam,
          ProcedureParameter.in("cluster_by", StringType).build(),
          ProcedureParameter.in("buckets", IntegerType)
            .defaultValue("16").build()),
        StructType(Seq(StructField("table", StringType),
          StructField("cluster_by", StringType),
          StructField("live_files", IntegerType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val cols = in.getUTF8String(1).toString.split(',')
            .map(_.trim).filter(_.nonEmpty).toSeq
          require(cols.nonEmpty, "compact_range needs cluster_by columns")
          t.compactRange(in.getInt(2), cols)
          Seq(InternalRow(in.getUTF8String(0).copy(),
            in.getUTF8String(1).copy(), t.dataFileCount))
        })
      case "analyze" => proc("analyze",
        "ONE distributed pass computing table row count and per-column " +
          "statistics (HLL NDV, null counts, numeric extrema, string " +
          "lengths, equi-height histograms on numeric columns) into the " +
          "stats sidecar; the SQL scan reports them into Spark's " +
          "cost-based optimizer (spark.sql.cbo.enabled)",
        Array(TableParam,
          ProcedureParameter.in("columns", StringType)
            .defaultValue("''")
            .comment("comma-separated column subset; empty = all")
            .build(),
          ProcedureParameter.in("histogram_bins", IntegerType)
            .defaultValue("64")
            .comment("equi-height histogram bins for numeric columns " +
              "(0 = no histograms)").build()),
        StructType(Seq(StructField("table", StringType),
          StructField("version", LongType),
          StructField("row_count", LongType),
          StructField("columns_analyzed", IntegerType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val cols = Option(in.getUTF8String(1)).map(_.toString).getOrElse("")
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val ts = t.analyzeTable(cols, in.getInt(2))
          Seq(InternalRow(in.getUTF8String(0).copy(), ts.version,
            ts.rowCount, ts.cols.size))
        })
      case "show_stats" => proc("show_stats",
        "the stats sidecar's content (CALL analyze first): one row per " +
          "analyzed column plus a '*' table row — version the stats " +
          "were computed at, row count, NDV, null count, extrema, " +
          "lengths, histogram bin count + rendered bins, staleness " +
          "(commits since the stats were computed) and its WARNING " +
          "TIER: fresh / drifting / stale (stale = drift at or past " +
          "the analyze_after_commits policy bar, or any drift with no " +
          "policy set — re-analyze, or set the policy); metadata-only",
        Array(TableParam),
        StructType(Seq(StructField("column", StringType),
          StructField("stats_version", LongType),
          StructField("row_count", LongType),
          StructField("ndv", LongType),
          StructField("null_count", LongType),
          StructField("min", StringType),
          StructField("max", StringType),
          StructField("avg_len", LongType),
          StructField("max_len", LongType),
          StructField("hist_bins", IntegerType),
          StructField("histogram", StringType),
          StructField("stale_commits", LongType),
          StructField("staleness", StringType))),
        in => {
          val t = open(in.getUTF8String(0).toString)
          val ts = t.tableStats.getOrElse(throw new IllegalStateException(
            s"no statistics for '${in.getUTF8String(0)}' — run " +
              "CALL <catalog>.system.analyze first"))
          def l(o: Option[Long]) =
            o.map(java.lang.Long.valueOf).orNull
          def u(o: Option[String]) =
            o.map(UTF8String.fromString).orNull
          val stale = t.currentVersion - ts.version
          val policy = t.tableProps
            .get(graft.operators.GraftTable.AutoAnalyzeProp)
            .flatMap(s => scala.util.Try(s.toLong).toOption)
          val tier = UTF8String.fromString(
            if (stale == 0) "fresh"
            else policy match {
              case Some(n) if stale < n => "drifting"
              case _ => "stale"
            })
          InternalRow(UTF8String.fromString("*"), ts.version, ts.rowCount,
            null, null, null, null, null, null, null, null, stale, tier) +:
            ts.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
              val bins = cs.hist.map(h => Integer.valueOf(h.bins.size)).orNull
              val rendered = cs.hist.map(h => UTF8String.fromString(
                h.bins.map(b => s"[${b.lo},${b.hi}]:${b.ndv}")
                  .mkString(" "))).orNull
              InternalRow(UTF8String.fromString(c), ts.version, ts.rowCount,
                l(cs.ndv), l(cs.nullCount), u(cs.min), u(cs.max),
                l(cs.avgLen), l(cs.maxLen), bins, rendered, stale, tier)
            }
        })
      // ----------------------------------------------------- view DDL
      //
      // Vanilla Spark 4.1 routes `CREATE VIEW` DDL to the session
      // catalog only (every other catalog gets MISSING_CATALOG_ABILITY
      // before a ViewCatalog implementation is ever consulted). On
      // extension-built sessions the injected parser
      // ([[graft.ext.GraftSqlParser]], round 13) serves the native
      // CREATE/DROP VIEW + SHOW VIEWS statements; these CALL
      // procedures remain the DDL surface for sessions WITHOUT the
      // extension — the Iceberg maintenance-statement idiom. Reads
      // resolve through [[graft.ext.GraftResolveViews]]; programmatic
      // DDL can also use the ViewCatalog API directly.
      case "create_view" => proc("create_view",
        "persist a SQL view under this catalog (use fully-qualified " +
          "table names in the SQL so the view resolves from any " +
          "session); replace => true for CREATE OR REPLACE semantics",
        Array(
          ProcedureParameter.in("view", StringType)
            .comment("view identifier under this catalog, e.g. 'db.v'")
            .build(),
          ProcedureParameter.in("sql", StringType).build(),
          ProcedureParameter.in("replace", BooleanType)
            .defaultValue("false").build()),
        StructType(Seq(StructField("view", StringType),
          StructField("columns", IntegerType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          val sql = in.getUTF8String(1).toString
          val replace = in.getBoolean(2)
          val parts = viewRef.split('.')
          require(parts.length >= 2 && parts.forall(_.nonEmpty),
            s"bad view reference '$viewRef' — expected 'namespace.view'")
          val ident = Identifier.of(parts.dropRight(1), parts.last)
          val spark = org.apache.spark.sql.SparkSession.active
          // the analyzed frame pins the view's schema + column names
          // (and rejects broken SQL at CREATE time, not first read)
          val frame = spark.sql(sql)
          val info = new org.apache.spark.sql.connector.catalog.ViewInfo(
            ident, sql, cat.name(), parts.dropRight(1), frame.schema,
            frame.columns, Array.empty[String], Array.empty[String],
            java.util.Collections.emptyMap[String, String]())
          if (replace) cat.replaceView(info, true) else cat.createView(info)
          Seq(InternalRow(UTF8String.fromString(viewRef),
            frame.columns.length))
        })
      case "create_mview" => proc("create_mview",
        "materialize a per-key algebraic aggregate of a base table " +
          "into a state table '<view>_state' hash-bucketed on the " +
          "first key (incremental refresh rewrites only delta buckets), " +
          "surfaced as the persisted view '<view>'; refresh with " +
          "refresh_mview",
        Array(
          ProcedureParameter.in("view", StringType).build(),
          ProcedureParameter.in("base", StringType).build(),
          ProcedureParameter.in("keys", StringType)
            .comment("comma-separated group-key columns").build(),
          ProcedureParameter.in("measures", StringType)
            .comment("comma-separated measures, each " +
              "'[sum:|min:|max:|dcount:]col [WHERE pred] [AS alias]' " +
              "(sum — the default — also derives avg; dcount is the " +
              "DataSketches HLL approximate COUNT DISTINCT)").build(),
          ProcedureParameter.in("buckets", IntegerType)
            .defaultValue("16")
            .comment("state-table hash buckets on the first key — size " +
              "so |state|/buckets files stay small; only buckets " +
              "holding delta keys rewrite per refresh").build()),
        StructType(Seq(StructField("view", StringType),
          StructField("base_version", LongType),
          StructField("state_rows", LongType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          val (v, rows) = GraftMaterializedViews.create(
            org.apache.spark.sql.SparkSession.active, cat, viewRef,
            in.getUTF8String(1).toString,
            in.getUTF8String(2).toString.split(',').map(_.trim)
              .filter(_.nonEmpty).toSeq,
            GraftMaterializedViews.parseMeasures(
              in.getUTF8String(3).toString),
            in.getInt(4))
          Seq(InternalRow(UTF8String.fromString(viewRef), v, rows))
        })
      case "create_mview_sql" => proc("create_mview_sql",
        "materialize a SELECT (one grouped aggregate over one table of " +
          "this catalog, optional WHERE, sum/avg/min/max/count " +
          "aggregates with optional per-aggregate FILTER over integral " +
          "columns) as an incrementally-refreshable mview whose reads " +
          "render EXACTLY the SELECT's columns; refresh with " +
          "refresh_mview",
        Array(
          ProcedureParameter.in("view", StringType).build(),
          ProcedureParameter.in("sql", StringType).build(),
          ProcedureParameter.in("buckets", IntegerType)
            .defaultValue("16").build()),
        StructType(Seq(StructField("view", StringType),
          StructField("base_version", LongType),
          StructField("state_rows", LongType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          val (v, rows) = GraftMaterializedViews.createFromSql(
            org.apache.spark.sql.SparkSession.active, cat, viewRef,
            in.getUTF8String(1).toString, in.getInt(2))
          Seq(InternalRow(UTF8String.fromString(viewRef), v, rows))
        })
      case "refresh_mview" => proc("refresh_mview",
        "fold the base table's changes since the last refresh into the " +
          "materialized view's state: insert-only deltas fold " +
          "INCREMENTALLY (O(delta)); deletes/updates trigger one full " +
          "recompute+sync; a replayed refresh skips (txn-anchored)",
        Array(ProcedureParameter.in("view", StringType).build()),
        StructType(Seq(StructField("view", StringType),
          StructField("mode", StringType),
          StructField("from_version", LongType),
          StructField("to_version", LongType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          val (mode, from, to) = GraftMaterializedViews.refresh(cat, viewRef)
          Seq(InternalRow(UTF8String.fromString(viewRef),
            UTF8String.fromString(mode), from, to))
        })
      case "refresh_all_mviews" => proc("refresh_all_mviews",
        "refresh EVERY registered materialized view (optionally only " +
          "those over 'base') — the operational tick after base " +
          "mutations; discovery is a metadata walk, each refresh " +
          "anchors on its own state's txn marker; returns one row per " +
          "mview with its refresh mode",
        Array(ProcedureParameter.in("base", StringType)
          .defaultValue("''")
          .comment("restrict to mviews over this base table; empty = all")
          .build()),
        StructType(Seq(StructField("view", StringType),
          StructField("mode", StringType),
          StructField("from_version", LongType),
          StructField("to_version", LongType))),
        in => {
          val b = Option(in.getUTF8String(0)).map(_.toString.trim)
            .filter(_.nonEmpty)
          GraftMaterializedViews.refreshAll(cat, b).map {
            case (v, m, f, t) => InternalRow(UTF8String.fromString(v),
              UTF8String.fromString(m), f, t)
          }
        })
      case "drop_mview" => proc("drop_mview",
        "drop a materialized view: the finish view AND its state table " +
          "(config + refresh anchor included)",
        Array(ProcedureParameter.in("view", StringType).build()),
        StructType(Seq(StructField("view", StringType),
          StructField("dropped", BooleanType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          Seq(InternalRow(UTF8String.fromString(viewRef),
            GraftMaterializedViews.drop(cat, viewRef)))
        })
      case "drop_view" => proc("drop_view",
        "drop a persisted view (returns whether one existed)",
        Array(ProcedureParameter.in("view", StringType).build()),
        StructType(Seq(StructField("view", StringType),
          StructField("dropped", BooleanType))),
        in => {
          val viewRef = in.getUTF8String(0).toString
          val parts = viewRef.split('.')
          require(parts.length >= 2 && parts.forall(_.nonEmpty),
            s"bad view reference '$viewRef' — expected 'namespace.view'")
          val dropped =
            cat.dropView(Identifier.of(parts.dropRight(1), parts.last))
          Seq(InternalRow(UTF8String.fromString(viewRef), dropped))
        })
      case "show_views" => proc("show_views",
        "list the persisted views of a namespace (SHOW VIEWS routes " +
          "to the session catalog only in vanilla Spark)",
        Array(ProcedureParameter.in("namespace", StringType).build()),
        StructType(Seq(StructField("namespace", StringType),
          StructField("view", StringType))),
        in => {
          val ns = in.getUTF8String(0).toString
          val parts = ns.split('.').filter(_.nonEmpty)
          cat.listViews(parts.toIndexedSeq: _*).toSeq.map(i =>
            InternalRow(UTF8String.fromString(ns),
              UTF8String.fromString(i.name)))
        })
      case other => throw new UnsupportedOperationException(
        s"unknown procedure graft system.$other — available: " +
          identifiers.map(_.name).mkString(", "))
    }
  }

  /** An [[UnboundProcedure]] whose bound form runs `body` on the
    * driver and returns its rows through one [[LocalScan]].
    */
  private def proc(procName: String, desc: String,
                   params: Array[ProcedureParameter],
                   outSchema: StructType,
                   body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name: String = procName
      override def description: String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name: String = procName
          override def description: String = desc
          override def parameters: Array[ProcedureParameter] = params
          // mutations commit through OCC — not idempotent re-runs
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val out = body(input).toArray
            java.util.List.of[Scan](new LocalScan {
              override def readSchema(): StructType = outSchema
              override def rows(): Array[InternalRow] = out
              override def description(): String = s"GraftProcedure($procName)"
            }).iterator()
          }
        }
    }
}
