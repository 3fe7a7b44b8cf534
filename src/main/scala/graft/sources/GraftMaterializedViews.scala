package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions._

import graft.operators.{GraftTable, GraftTableMeta}

/** MATERIALIZED VIEWS with INCREMENTAL refresh — the composition the
  * round-12 pieces exist for: a per-key algebraic aggregate
  * (count / exact-decimal sum / derived avg — the
  * [[graft.operators.Incremental]] discipline) over a
  * base catalog table, materialized as a STATE table and surfaced as a
  * persisted VIEW of its read-time finish.
  *
  * {{{
  *   CALL cat.system.create_mview('db.spend', base => 'db.events',
  *     keys => 'user_id', measures => 'cents')
  *   -- base keeps ingesting …
  *   CALL cat.system.refresh_mview('db.spend')   -- incremental
  *   SELECT * FROM cat.db.spend                  -- n_rows / sum_* / avg_*
  * }}}
  *
  * REFRESH reads the base's CHANGE ROWS since the last refreshed
  * version ([[GraftTable.readChangesRowsBetween]] — O(changed files),
  * never the corpus):
  *
  *   - insert-only changes fold in INCREMENTALLY: one map-side-combined
  *     aggregate over the delta, then a keyed MERGE into the state
  *     (matched keys ADD partials, new keys insert) — |delta| work at
  *     any corpus size, the Δ-maintenance rule;
  *   - anything else (deletes, updates — algebraic subtraction is
  *     unsafe under replays) falls back to ONE full recompute at the
  *     new version, synced as the same MERGE plus
  *     WHEN NOT MATCHED BY SOURCE DELETE (groups that vanished from
  *     the base vanish from the state).
  *
  * EXACTLY-ONCE by construction: every refresh commits through
  * [[GraftTable.mergeBatch]] with `(appId = "mview", batchId = <base
  * version refreshed to>)` — the anchor IS the state table's txn
  * marker, atomic with the state mutation, so a crashed/replayed
  * refresh skips instead of double-counting, and there is no separate
  * anchor file to drift.
  */
object GraftMaterializedViews {

  private def enc(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def dec(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  private val AppId = "mview"

  final case class Config(base: String, keys: Seq[String],
                          measures: Seq[String])

  private def configPath(stateDir: String) =
    Paths.get(stateDir, "_graft_mview.json")

  private def writeConfig(stateDir: String, c: Config): Unit = {
    val body = Seq(s"base\t${enc(c.base)}",
      s"keys\t${enc(c.keys.mkString(","))}",
      s"measures\t${enc(c.measures.mkString(","))}").mkString("\n")
    val tmp = Paths.get(stateDir,
      s"._graft_mview_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp, body)
    Files.move(tmp, configPath(stateDir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def readConfig(stateDir: String): Config = {
    require(Files.isRegularFile(configPath(stateDir)),
      s"no materialized-view config under $stateDir — not a state table " +
        "created by create_mview")
    val m = Files.readAllLines(configPath(stateDir)).toArray.toSeq
      .map(_.toString).filter(_.nonEmpty)
      .map { l => val Array(k, v) = l.split("\t", 2); k -> dec(v) }.toMap
    Config(m("base"), m("keys").split(',').toSeq,
      m("measures").split(',').toSeq)
  }

  private def split(ref: String): Identifier = {
    val parts = ref.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"bad reference '$ref' — expected 'namespace.name'")
    Identifier.of(parts.dropRight(1), parts.last)
  }

  private def stateRef(viewRef: String): String = s"${viewRef}_state"

  /** Per-key algebraic state with PER-MEASURE non-null counts: `_cnt`
    * (all rows), and per measure `_sum_<m>` (exact-decimal sum of the
    * NON-NULL values, 0 when none — always non-null so incremental
    * addition is plain `+`) and `_nn_<m>` (non-null count). The finish
    * derives SQL semantics: SUM is NULL when `_nn` is 0, AVG divides
    * by `_nn` (never the row count) — so the view matches
    * `sum(m)`/`avg(m)` exactly for nullable measures.
    */
  private def state(df: DataFrame, keys: Seq[String],
                    measures: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        measures.flatMap(m => Seq(
          coalesce(sum(graft.Agg.dec4(col(m))), lit(0).cast("decimal(38,4)"))
            .as(s"_sum_$m"),
          count(col(m)).as(s"_nn_$m"))): _*)

  /** The keyed MERGE both refresh modes commit through: matched keys
    * ADD the delta partials, unmatched delta keys insert; `fullSync`
    * additionally deletes state keys the (full) source no longer has.
    */
  private def stateCols(cfg: Config): Seq[String] =
    "_cnt" +: cfg.measures.flatMap(m => Seq(s"_sum_$m", s"_nn_$m"))

  private def foldInto(st: GraftTable, toVersion: Long, delta: DataFrame,
                       cfg: Config, fullSync: Boolean): Boolean = {
    // fullSync = SET the source partials; incremental = ADD them (all
    // state columns are non-null by construction, so + is exact)
    def assign(c: String): org.apache.spark.sql.Column =
      if (fullSync) GraftTable.src(c) else col(c) + GraftTable.src(c)
    val assigns: Map[String, org.apache.spark.sql.Column] =
      stateCols(cfg).map(c => c -> assign(c)).toMap
    val insert = Some((lit(true),
      (cfg.keys ++ stateCols(cfg))
        .map(c => c -> GraftTable.src(c)).toMap))
    val nmbs =
      if (fullSync) Seq(GraftTable.MatchedDelete(lit(true)))
      else Seq.empty[GraftTable.MatchedClause]
    GraftTable.retryOnConflict() {
      st.mergeBatch(AppId, toVersion, delta,
        matched = Seq(GraftTable.MatchedUpdate(lit(true), assigns)),
        notMatchedInsert = insert, notMatchedBySource = nmbs)
    }
  }

  /** CREATE: materialize the initial state at the base's current
    * version, persist the config, and surface the finish as a
    * persisted VIEW named `viewRef` (readable on extension sessions).
    * Returns (base version materialized, state rows).
    */
  def create(spark: SparkSession, cat: GraftCatalog, viewRef: String,
             baseRef: String, keys: Seq[String], measures: Seq[String])
      : (Long, Long) = {
    require(keys.nonEmpty && measures.nonEmpty,
      "create_mview needs keys and measures")
    val cfg = Config(baseRef, keys, measures)
    // EVERY precondition before ANY mutation — a late failure must not
    // orphan a committed state table
    require(!GraftViews.exists(catRoot(cat), split(viewRef)),
      s"cannot create materialized view $viewRef: a VIEW with that " +
        "name exists")
    val base = cat.openTable(split(baseRef))
    val baseV = base.currentVersion
    val snap = base.readAt(baseV)
    (keys ++ measures).foreach(c => require(snap.columns.contains(c),
      s"base '$baseRef' has no column '$c'"))
    val state0 = state(snap, keys, measures)
    // the state table: keyed on the group keys, unpartitioned (state is
    // |keys|-sized), stats on _cnt for the metadata tiers
    val stIdent = split(stateRef(viewRef))
    require(!cat.tableExists(stIdent) && !GraftViews.exists(catRoot(cat), stIdent),
      s"${stateRef(viewRef)} already exists")
    require(!cat.tableExists(split(viewRef)),
      s"cannot create materialized view $viewRef: a TABLE with that " +
        "name exists")
    val dir = (catRoot(cat) +: stIdent.namespace.toSeq :+ stIdent.name)
      .mkString("/")
    Files.createDirectories(Paths.get(dir).getParent)
    val st = new GraftTable(spark, dir, keys, GraftTable.SyntheticPartition,
      statsCols = Seq("_cnt"))
    st.createIfNotExists(state0.schema)
    GraftTableMeta.annotate(st)
    writeConfig(dir, cfg)
    // the initial load is refresh #baseV — same txn discipline
    foldInto(st, baseV, state0, cfg, fullSync = true)
    // the user-facing finish view (exact-decimal state, double surface)
    val finishSql = {
      val catName = cat.name()
      val stName = s"$catName.${stateRef(viewRef)}"
      // SQL semantics for nullable measures: SUM is NULL when no
      // non-null value exists, AVG divides by the NON-NULL count
      val ms = measures.flatMap(m => Seq(
        s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS DOUBLE) " +
          s"ELSE CAST(_sum_$m AS DOUBLE) END AS sum_$m",
        s"CASE WHEN _nn_$m = 0 THEN CAST(NULL AS DOUBLE) " +
          s"ELSE CAST(_sum_$m AS DOUBLE) / _nn_$m END AS avg_$m"))
      s"SELECT ${(keys :+ "_cnt AS n_rows").mkString(", ")}, " +
        s"${ms.mkString(", ")} FROM $stName"
    }
    val frame = spark.sql(finishSql)
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      split(viewRef), finishSql, cat.name(),
      split(viewRef).namespace(), frame.schema, frame.columns,
      Array.empty[String], Array.empty[String],
      java.util.Collections.emptyMap[String, String]()))
    (baseV, st.read.count())
  }

  /** REFRESH: fold the base's changes since the last refreshed version
    * into the state. Returns (mode, fromVersion, toVersion) where mode
    * is `current` (nothing to do), `incremental` (insert-only delta
    * folded) or `full` (recompute + sync — deletes/updates in range).
    */
  def refresh(cat: GraftCatalog, viewRef: String)
      : (String, Long, Long) = {
    val stIdent = split(stateRef(viewRef))
    val st = cat.openTable(stIdent)
    val cfg = readConfig(st.path)
    val base = cat.openTable(split(cfg.base))
    val lastV = st.txnVersion(AppId)
    require(lastV >= 0, s"$viewRef has no refresh anchor — recreate it")
    val curV = base.currentVersion
    if (curV <= lastV) return ("current", lastV, lastV)
    val changes = base.readChangesRowsBetween(lastV, curV)
      .localCheckpoint(true)
    // incremental needs (a) insert-only changes and (b) NO null group
    // key in the delta — the keyed MERGE matches with === (ANSI: a
    // null key never matches), so a null-key delta group would INSERT
    // a duplicate state row instead of folding; the full sync handles
    // it exactly
    val nonIncremental = changes.filter(
      col("_change_type") =!= "insert" ||
        cfg.keys.map(k => col(k).isNull).reduce(_ || _))
      .limit(1).count() > 0L
    if (!nonIncremental) {
      val delta = state(changes.drop("_change_type"), cfg.keys, cfg.measures)
      foldInto(st, curV, delta, cfg, fullSync = false)
      ("incremental", lastV, curV)
    } else {
      val full = state(base.readAt(curV), cfg.keys, cfg.measures)
      foldInto(st, curV, full, cfg, fullSync = true)
      ("full", lastV, curV)
    }
  }

  /** DROP: remove the finish view and the state table (with its
    * config + txn anchor). Returns whether anything existed.
    */
  def drop(cat: GraftCatalog, viewRef: String): Boolean = {
    val v = cat.dropView(split(viewRef))
    val stIdent = split(stateRef(viewRef))
    val t = cat.tableExists(stIdent) && cat.dropTable(stIdent)
    v || t
  }

  private def catRoot(cat: GraftCatalog): String = cat.rootDir
}
