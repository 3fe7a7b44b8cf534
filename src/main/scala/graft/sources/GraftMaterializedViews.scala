package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.functions._

import graft.operators.{GraftTable, GraftTableMeta}

/** MATERIALIZED VIEWS with INCREMENTAL refresh — the composition the
  * round-12 pieces exist for: a per-key algebraic aggregate
  * (count / exact-decimal sum / derived avg / min / max / HLL
  * approximate count-distinct, each optionally predicate-filtered —
  * the [[graft.operators.Incremental]] discipline) over a
  * base catalog table, materialized as a STATE table and surfaced as a
  * persisted VIEW of its read-time finish.
  *
  * {{{
  *   CALL cat.system.create_mview('db.spend', base => 'db.events',
  *     keys => 'user_id', measures =>
  *       'cents, max:cents, dcount:sku,
  *        sum:cents WHERE kind = \'x\' AS x_cents')
  *   -- base keeps ingesting …
  *   CALL cat.system.refresh_mview('db.spend')   -- incremental
  *   SELECT * FROM cat.db.spend   -- n_rows / sum_* / avg_* / max_* / …
  * }}}
  *
  * The STATE table is hash-bucketed on the first group key
  * (`buckets => n`, default 16): the keyed MERGE's rewrite unit is the
  * bucket, so an incremental refresh rewrites only buckets holding
  * delta keys — O(delta) write cost even at billions of groups.
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

  /** One measure of the view's algebra. The `measures` argument is a
    * comma-separated list (commas inside parens/quotes don't split) of
    *
    * {{{ [func:]column [WHERE predicate] [AS alias] }}}
    *
    * where `func` ∈ sum (default — emits `sum_*` AND `avg_*`), `min`,
    * `max`, `dcount` (approximate COUNT DISTINCT via the DataSketches
    * HLL aggregate — exact below the sketch's set-mode threshold),
    * `cnt` (non-null count — the COUNT(col) family for columns of ANY
    * type, no numeric state attached), the
    * predicate is any Spark SQL boolean over base columns (rows failing
    * it contribute nothing to THIS measure), and the alias names the
    * finish columns (`sum_<name>`, `min_<name>`, …; defaults to the
    * column name — required when the same column appears twice under
    * one func). ALL funcs fold incrementally under insert-only deltas
    * (sums add, min/max fold through least/greatest, HLL sketches
    * union); deletes/updates fall back to the one full recompute like
    * before — min/max/dcount are not algebraically subtractable, which
    * is exactly what the mode split exists for.
    */
  final case class Measure(func: String, col: String,
                           pred: Option[String], name: String) {
    /** Canonical round-trip form (what the config file stores). */
    def spec: String =
      s"$func:$col${pred.map(p => s" WHERE $p").getOrElse("")} AS $name"
    /** The measure's source column, gated by its predicate. */
    def gated: org.apache.spark.sql.Column =
      pred match {
        case Some(p) => when(expr(p), col_(col))
        case None => col_(col)
      }
    private def col_(c: String) = org.apache.spark.sql.functions.col(c)
  }

  private val FinishFuncs = Set("sum", "min", "max", "dcount", "cnt")

  /** Split on TOP-LEVEL commas only (predicates may contain `IN (a,b)`
    * or quoted strings with commas).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { c =>
      if (inStr) { sb.append(c); if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true; sb.append(c)
        case '(' => depth += 1; sb.append(c)
        case ')' => depth -= 1; sb.append(c)
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case _ => sb.append(c)
      }
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val AsRe = "(?is)^(.*)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
  private val WhereRe = "(?is)^(.*?)\\s+WHERE\\s+(.+)$".r

  def parseMeasure(raw: String): Measure = {
    val (body, alias) = raw.trim match {
      case AsRe(b, a) => (b.trim, Some(a))
      case other => (other, None)
    }
    val (head, pred) = body match {
      case WhereRe(h, p) => (h.trim, Some(p.trim))
      case _ => (body, None)
    }
    val (func, col) = head.split(":", 2) match {
      case Array(f, c) if FinishFuncs.contains(f.trim.toLowerCase) =>
        (f.trim.toLowerCase, c.trim)
      case _ => ("sum", head.trim)
    }
    val name = alias.getOrElse(col)
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"measure '$raw': state/finish columns derive from the measure " +
        s"name and '$name' is not a bare identifier — add 'AS <alias>'")
    require(col.nonEmpty, s"measure '$raw' names no column")
    Measure(func, col, pred, name)
  }

  def parseMeasures(raw: String): Seq[Measure] = {
    val ms = splitTop(raw).map(parseMeasure)
    val dups = ms.groupBy(m => (m.func, m.name)).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate measure names ${dups.mkString(", ")} — disambiguate " +
        "with 'AS <alias>'")
    ms
  }

  /** One DIMENSION side of a fact ⋈ dims materialized view: a small
    * graft table of the same catalog, equi-joined onto the (projected,
    * renamed) fact frame. `cols` maps the dim's ORIGINAL column names
    * to their flat STATE names (renamed on collision across the join);
    * `condSql` is the join condition over the renamed flat columns;
    * `anchor` pins the dim VERSION the current state was computed
    * against — any drift forces the honest full recompute (a dim
    * change can rewrite history for every fact row that joins it, so
    * no delta algebra is sound).
    */
  final case class Dim(ref: String, joinType: String, condSql: String,
                       cols: Seq[(String, String)], anchor: Long)

  /** `filter` = an optional WHERE over base rows (the SQL-defined
    * flavor): applied to every state input — the initial snapshot,
    * each insert-only delta, and full recomputes — so the view models
    * `SELECT … FROM base WHERE filter GROUP BY keys` exactly.
    * `derived` = the subset of `keys` that are EXPRESSIONS over base
    * columns (name → expr SQL — `GROUP BY CAST(ts AS DATE)` aliased in
    * the SELECT): computed onto every state input right after the
    * filter, so grouping, null-key probing and the state MERGE all see
    * them as plain columns.
    * `factCols` (join views only) = the fact-side projection (orig →
    * state name); `dims` = the joined dimensions IN JOIN ORDER. With
    * dims, every state input is fact → project/rename → ⋈ broadcast
    * dims → filter → derived keys, so the whole algebra downstream
    * sees one flat frame.
    */
  final case class Config(base: String, keys: Seq[String],
                          measures: Seq[Measure],
                          filter: Option[String] = None,
                          derived: Seq[(String, String)] = Nil,
                          factCols: Seq[(String, String)] = Nil,
                          dims: Seq[Dim] = Nil)

  private def configPath(stateDir: String) =
    Paths.get(stateDir, "_graft_mview.json")

  private def writeConfig(stateDir: String, c: Config): Unit = {
    val body = (Seq(s"base\t${enc(c.base)}",
      s"keys\t${enc(c.keys.mkString(","))}") ++
      (if (c.measures.isEmpty) Seq(s"nomeasures\t${enc("1")}")
       else Seq.empty) ++
      c.filter.map(f => s"filter\t${enc(f)}").toSeq ++
      c.derived.map { case (n, ex) => s"dkey\t${enc(n)}\t${enc(ex)}" } ++
      c.factCols.map { case (o, n) => s"factcol\t${enc(o)}\t${enc(n)}" } ++
      c.dims.zipWithIndex.flatMap { case (d, i) =>
        val head = s"dim\t$i\t${enc(d.ref)}\t${enc(d.joinType)}\t" +
          s"${d.anchor}\t${enc(d.condSql)}"
        head +:
          d.cols.map { case (o, n) => s"dimcol\t$i\t${enc(o)}\t${enc(n)}" }
      } ++
      c.measures.map(m => s"measure\t${enc(m.spec)}")).mkString("\n")
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
    val raw = Files.readAllLines(configPath(stateDir)).toArray.toSeq
      .map(_.toString).filter(_.nonEmpty)
    val derived = raw.collect { case l if l.startsWith("dkey\t") =>
      val Array(_, n, ex) = l.split("\t", 3)
      dec(n) -> dec(ex)
    }
    val factCols = raw.collect { case l if l.startsWith("factcol\t") =>
      val Array(_, o, n) = l.split("\t", 3)
      dec(o) -> dec(n)
    }
    val dimCols = raw.collect { case l if l.startsWith("dimcol\t") =>
      val Array(_, i, o, n) = l.split("\t", 4)
      i.toInt -> (dec(o) -> dec(n))
    }
    val dims = raw.collect { case l if l.startsWith("dim\t") =>
      val Array(_, i, r, jt, anchor, cond) = l.split("\t", 6)
      i.toInt -> Dim(dec(r), dec(jt), dec(cond),
        dimCols.filter(_._1 == i.toInt).map(_._2), anchor.toLong)
    }.sortBy(_._1).map(_._2)
    val multiTag = Set("dkey\t", "factcol\t", "dim\t", "dimcol\t")
    val lines = raw.filterNot(l => multiTag.exists(l.startsWith))
      .map { l => val Array(k, v) = l.split("\t", 2); k -> dec(v) }
    val m = lines.toMap
    val measures0 = lines.collect { case ("measure", spec) =>
      parseMeasure(spec)
    }
    // pre-round-13 configs wrote ONE comma-joined 'measures' line of
    // plain sum columns — parse it so existing mviews keep refreshing
    // (an empty measure set would silently stop folding the sums)
    val measures =
      if (measures0.nonEmpty) measures0
      else m.get("measures").toSeq
        .flatMap(_.split(',').toSeq.filter(_.nonEmpty))
        .map(c => Measure("sum", c, None, c))
    require(measures.nonEmpty || m.contains("nomeasures"),
      s"mview config under $stateDir declares no measures — corrupt?")
    Config(m("base"), m("keys").split(',').toSeq, measures,
      m.get("filter"), derived, factCols, dims)
  }

  /** Every state input flows through the config's row filter, then
    * gains the DERIVED key columns — grouping, null-key probing and
    * the state MERGE all see them as plain columns.
    */
  private def prepared(df: DataFrame, cfg: Config): DataFrame = {
    val f = cfg.filter.map(p => df.filter(expr(p))).getOrElse(df)
    cfg.derived.foldLeft(f) { case (d, (n, ex)) =>
      d.withColumn(n, expr(ex))
    }
  }

  /** Fact ⋈ dims (join views; identity otherwise): project+rename the
    * fact side (keeping `_change_type` when the input is a CDC delta),
    * then fold each dim in — read AT ITS ANCHORED VERSION (so a
    * concurrent dim write mid-refresh cannot tear the join; the next
    * refresh sees the anchor drift and recomputes), projected to the
    * renamed columns the view references, and BROADCAST: dims are
    * small by the join-mview contract, so an incremental fold is
    * |fact delta| ⋈ broadcast — no shuffle at any corpus size.
    */
  private def joinInput(cat: GraftCatalog, cfg: Config,
                        factDf: DataFrame): DataFrame = {
    if (cfg.dims.isEmpty) return factDf
    val hasCdc = factDf.columns.contains("_change_type")
    val factSel = cfg.factCols.map { case (o, n) => col(o).as(n) } ++
      (if (hasCdc) Seq(col("_change_type")) else Nil)
    cfg.dims.foldLeft(factDf.select(factSel: _*)) { (df, d) =>
      val dimDf = cat.openTable(split(d.ref)).readAt(d.anchor)
        .select(d.cols.map { case (o, n) => col(o).as(n) }: _*)
      df.join(broadcast(dimDf), expr(d.condSql), d.joinType)
    }
  }

  /** The complete state-input pipeline: join (when dims), then filter,
    * then derived keys.
    */
  private def preparedInput(cat: GraftCatalog, cfg: Config,
                            factDf: DataFrame): DataFrame =
    prepared(joinInput(cat, cfg, factDf), cfg)

  private def split(ref: String): Identifier = {
    val parts = ref.split('.')
    require(parts.length >= 2 && parts.forall(_.nonEmpty),
      s"bad reference '$ref' — expected 'namespace.name'")
    Identifier.of(parts.dropRight(1), parts.last)
  }

  private def stateRef(viewRef: String): String = s"${viewRef}_state"

  /** Per-key algebraic state: `_cnt` (all rows), and per measure its
    * func's mergeable partial over the predicate-gated, NON-NULL
    * values —
    *
    *   - sum: `_sum_<m>` exact-decimal sum (0 when none — always
    *     non-null so incremental addition is plain `+`) and `_nn_<m>`
    *     non-null count;
    *   - min/max: `_min_<m>` / `_max_<m>` decimal extremum (NULL =
    *     no value; least/greatest skip nulls, the SQL MIN/MAX fold);
    *   - dcount: `_hll_<m>` DataSketches HLL sketch (unions are the
    *     merge).
    *
    * The finish derives SQL semantics: SUM is NULL when `_nn` is 0,
    * AVG divides by `_nn` (never the row count) — so the view matches
    * `sum(m)`/`avg(m)` exactly for nullable measures.
    */
  private def state(df: DataFrame, keys: Seq[String],
                    measures: Seq[Measure]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        measures.flatMap { m =>
          val g = m.gated
          m.func match {
            case "sum" => Seq(
              coalesce(sum(graft.Agg.dec4(g)), lit(0).cast("decimal(38,4)"))
                .as(s"_sum_${m.name}"),
              count(g).as(s"_nn_${m.name}"))
            case "min" => Seq(min(graft.Agg.dec4(g)).as(s"_min_${m.name}"))
            case "max" => Seq(max(graft.Agg.dec4(g)).as(s"_max_${m.name}"))
            case "dcount" =>
              Seq(hll_sketch_agg(g).as(s"_hll_${m.name}"))
            case "cnt" => Seq(count(g).as(s"_cn_${m.name}"))
          }
        }: _*)

  /** The keyed MERGE both refresh modes commit through: matched keys
    * FOLD the delta partials per func, unmatched delta keys insert;
    * `fullSync` additionally deletes state keys the (full) source no
    * longer has.
    */
  private def stateColsOf(m: Measure): Seq[String] = m.func match {
    case "sum" => Seq(s"_sum_${m.name}", s"_nn_${m.name}")
    case "min" => Seq(s"_min_${m.name}")
    case "max" => Seq(s"_max_${m.name}")
    case "dcount" => Seq(s"_hll_${m.name}")
    case "cnt" => Seq(s"_cn_${m.name}")
  }

  private def stateCols(cfg: Config): Seq[String] =
    "_cnt" +: cfg.measures.flatMap(stateColsOf)

  private def foldInto(st: GraftTable, toVersion: Long, delta: DataFrame,
                       cfg: Config, fullSync: Boolean,
                       expectedLast: Long,
                       reapplyEqual: Boolean = false): Boolean = {
    // fullSync = SET the source partials; incremental = FOLD them per
    // func (sums add — non-null by construction; min/max through
    // least/greatest — both skip nulls, the SQL fold; sketches union
    // null-safely)
    val src = GraftTable.src _
    val assigns: Map[String, org.apache.spark.sql.Column] =
      if (fullSync) stateCols(cfg).map(c => c -> src(c)).toMap
      else Map("_cnt" -> (col("_cnt") + src("_cnt"))) ++
        cfg.measures.flatMap { m =>
          m.func match {
            case "sum" => Seq(
              s"_sum_${m.name}" ->
                (col(s"_sum_${m.name}") + src(s"_sum_${m.name}")),
              s"_nn_${m.name}" ->
                (col(s"_nn_${m.name}") + src(s"_nn_${m.name}")))
            case "min" => Seq(s"_min_${m.name}" ->
              least(col(s"_min_${m.name}"), src(s"_min_${m.name}")))
            case "max" => Seq(s"_max_${m.name}" ->
              greatest(col(s"_max_${m.name}"), src(s"_max_${m.name}")))
            case "dcount" =>
              val c = s"_hll_${m.name}"
              Seq(c -> when(col(c).isNull, src(c))
                .when(src(c).isNull, col(c))
                .otherwise(hll_union(col(c), src(c))))
            case "cnt" => Seq(s"_cn_${m.name}" ->
              (col(s"_cn_${m.name}") + src(s"_cn_${m.name}")))
          }
        }.toMap
    val insert = Some((lit(true),
      (cfg.keys ++ stateCols(cfg))
        .map(c => c -> GraftTable.src(c)).toMap))
    val nmbs =
      if (fullSync) Seq(GraftTable.MatchedDelete(lit(true)))
      else Seq.empty[GraftTable.MatchedClause]
    GraftTable.retryOnConflict() {
      // expectedLastBatch pins the anchor this delta was computed FROM:
      // two refreshes that both read anchor v but race to commit
      // different head versions would otherwise BOTH pass the replay
      // check and fold the overlapping range twice — the loser now gets
      // StaleTxnAnchorException (checked atomically with the commit)
      // and the refresh loop recomputes from the winner's anchor
      st.mergeBatch(AppId, toVersion, delta,
        matched = Seq(GraftTable.MatchedUpdate(lit(true), assigns)),
        notMatchedInsert = insert, notMatchedBySource = nmbs,
        expectedLastBatch = Some(expectedLast),
        // a DIM-driven full recompute may re-commit at an UNCHANGED
        // fact anchor (the dim moved, the fact did not): safe because
        // full sync is an idempotent SET, and only that path passes
        // fullSync together with reapplyEqual
        reapplyEqualBatch = reapplyEqual && fullSync)
    }
  }

  /** CREATE: materialize the initial state at the base's current
    * version, persist the config, and surface the finish as a
    * persisted VIEW named `viewRef` (readable on extension sessions).
    * Returns (base version materialized, state rows).
    *
    * The state table is HASH-BUCKETED on the first group key
    * (`bucket[buckets]` hidden partitioning): the keyed MERGE's rewrite
    * unit is the partition, so an incremental refresh rewrites ONLY the
    * buckets holding delta keys — at billions of groups the write side
    * stays O(delta-buckets), never O(|state|).
    *
    * NOT atomic-by-construction (two filesystem artifacts + a view),
    * but CRASH-SAFE: any failure after the state table materializes
    * rolls the state table (and a created view) back, so a retry never
    * trips the already-exists preconditions on orphaned debris.
    */
  def create(spark: SparkSession, cat: GraftCatalog, viewRef: String,
             baseRef: String, keys: Seq[String], measures: Seq[Measure],
             buckets: Int = 16, filterSql: Option[String] = None,
             finishOverride: Option[String => String] = None,
             derivedKeys: Seq[(String, String)] = Nil,
             factCols: Seq[(String, String)] = Nil,
             dims: Seq[Dim] = Nil)
      : (Long, Long) = {
    require(keys.nonEmpty, "create_mview needs keys")
    // measures MAY be empty: a count(*)-only view rides the _cnt state
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(factCols.isEmpty || dims.nonEmpty,
      "a fact projection without dims makes no sense — single-table " +
        "mviews read the base unprojected")
    // dim anchors pin at CREATE: every dim read below (and every
    // incremental fold until a dim moves) happens AT these versions
    val anchoredDims = dims.map(d =>
      d.copy(anchor = cat.openTable(split(d.ref)).currentVersion))
    val cfg = Config(baseRef, keys, measures, filterSql, derivedKeys,
      factCols, anchoredDims)
    // EVERY precondition before ANY mutation — a late failure must not
    // orphan a committed state table
    require(!GraftViews.exists(catRoot(cat), split(viewRef)),
      s"cannot create materialized view $viewRef: a VIEW with that " +
        "name exists")
    val base = cat.openTable(split(baseRef))
    val baseV = base.currentVersion
    // validations and the initial state both run over the JOINED,
    // renamed input frame (identity when the view has no dims)
    val snap = joinInput(cat, cfg, base.readAt(baseV))
    val derivedNames = derivedKeys.map(_._1).toSet
    // derived key names must be FRESH — withColumn resolves
    // CASE-INSENSITIVELY, so the collision check must too (a
    // case-variant alias would silently REPLACE the base column the
    // measures aggregate) — and never underscore-prefixed (those are
    // the engine's internal columns: _change_type, _cnt, _sum_*, …)
    derivedNames.foreach { n =>
      require(!snap.columns.exists(_.equalsIgnoreCase(n)),
        s"derived key '$n' collides with a base column — alias it")
      require(!n.startsWith("_"),
        s"derived key '$n': underscore-prefixed names are reserved " +
          "for the engine's internal columns")
    }
    (keys.filterNot(derivedNames) ++ measures.map(_.col)).foreach(c =>
      require(snap.columns.contains(c),
        s"base '$baseRef' has no column '$c'"))
    // measure predicates, the row filter AND derived-key expressions
    // must resolve against the base NOW — a broken expression fails
    // the CREATE, not the first refresh
    (measures.flatMap(_.pred) ++ filterSql).foreach { p =>
      snap.select(expr(p).cast("boolean")).schema
    }
    derivedKeys.foreach { case (_, ex) => snap.select(expr(ex)).schema }
    val state0 = state(prepared(snap, cfg), keys, measures)
    // the state table: keyed on the group keys, hash-bucketed on the
    // first one (incremental MERGE rewrites only delta buckets), stats
    // on _cnt for the metadata tiers
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
      statsCols = Seq("_cnt"), partitionSrc = Seq(keys.head),
      partitionXform = Seq(s"bucket[$buckets]"))
    st.createIfNotExists(state0.schema)
    // everything past the table's first commit rolls back on failure:
    // a broken finish SQL or a createView race must not orphan a state
    // table that blocks the retry
    var viewCreated = false
    try {
      GraftTableMeta.annotate(st)
      writeConfig(dir, cfg)
      // the initial load is refresh #baseV — same txn discipline (the
      // -1 anchor pin makes a raced double-create lose loudly); a skip
      // means a concurrent creator already anchored this exact version
      if (!foldInto(st, baseV, state0, cfg, fullSync = true,
          expectedLast = -1L))
        throw new graft.operators.StaleTxnAnchorException(
          s"create_mview($viewRef): a concurrent create already " +
            "anchored the state")
      // the user-facing finish view (exact-decimal state, double
      // surface; the SQL-defined flavor supplies its own rendering)
      val finishSql = finishOverride.map(
        _(s"${cat.name()}.${stateRef(viewRef)}")).getOrElse {
        val catName = cat.name()
        val stName = s"$catName.${stateRef(viewRef)}"
        // SQL semantics for nullable measures: SUM is NULL when no
        // non-null value exists, AVG divides by the NON-NULL count,
        // MIN/MAX are NULL when no value exists (the nullable state
        // column IS that), COUNT DISTINCT of none is 0
        val ms = measures.flatMap { m =>
          val n = m.name
          m.func match {
            case "sum" => Seq(
              s"CASE WHEN _nn_$n = 0 THEN CAST(NULL AS DOUBLE) " +
                s"ELSE CAST(_sum_$n AS DOUBLE) END AS sum_$n",
              s"CASE WHEN _nn_$n = 0 THEN CAST(NULL AS DOUBLE) " +
                s"ELSE CAST(_sum_$n AS DOUBLE) / _nn_$n END AS avg_$n")
            case "min" => Seq(s"CAST(_min_$n AS DOUBLE) AS min_$n")
            case "max" => Seq(s"CAST(_max_$n AS DOUBLE) AS max_$n")
            case "dcount" => Seq(
              s"CAST(coalesce(hll_sketch_estimate(_hll_$n), 0) AS BIGINT) " +
                s"AS dcount_$n")
            case "cnt" => Seq(s"_cn_$n AS cnt_$n")
          }
        }
        s"SELECT ${(keys :+ "_cnt AS n_rows").mkString(", ")}, " +
          s"${ms.mkString(", ")} FROM $stName"
      }
      val frame = spark.sql(finishSql)
      cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
        split(viewRef), finishSql, cat.name(),
        split(viewRef).namespace(), frame.schema, frame.columns,
        Array.empty[String], Array.empty[String],
        java.util.Collections.emptyMap[String, String]()))
      viewCreated = true
      (baseV, st.read.count())
    } catch {
      // a CONCURRENCY loser must not roll back anything: in a raced
      // double create both callers touched the SAME state directory
      // (createIfNotExists is idempotent), so deleting it would
      // destroy the winner's committed table
      case e @ (_: graft.operators.StaleTxnAnchorException |
                _: graft.operators.CommitConflictException) =>
        throw new IllegalStateException(
          s"create_mview($viewRef) lost a concurrent-create race — " +
            "the other creator's view stands", e)
      case e: Throwable =>
        // roll back ONLY what THIS call created: dropping the view
        // unconditionally would delete a concurrent winner's view when
        // our own createView lost the race
        if (viewCreated) scala.util.Try(cat.dropView(split(viewRef)))
        scala.util.Try(graft.operators.Fs.deleteTree(Paths.get(dir)))
        throw e
    }
  }

  /** CREATE from a full SELECT (the way users actually write
    * materialized views):
    *
    * {{{
    *   CALL cat.system.create_mview_sql('db.spend', sql =>
    *     'SELECT user_id, sum(cents) AS total, count(*) AS n,
    *             max(cents) AS biggest,
    *             sum(cents) FILTER (WHERE cents % 2 = 0) AS even_total
    *      FROM cat.db.ev WHERE cents > 0 GROUP BY user_id')
    * }}}
    *
    * The ANALYZED plan is pattern-matched onto the incremental algebra:
    * one `Aggregate` over (optionally filtered) scans of ONE graft
    * table of THIS catalog — or a LEFT-DEEP join tree `fact [INNER |
    * LEFT] JOIN dim₁ ON … JOIN dim₂ ON …` of tables of this catalog
    * (the star-rollup shape: the leftmost table is the FACT whose CDC
    * drives incremental refresh; every right side is a small DIM,
    * version-anchored and broadcast into each fold — any dim change
    * forces one honest full recompute). Grouping expressions must be
    * bare columns (of fact OR dims) or aliased deterministic
    * expressions; aggregates are sum / avg / min / max / count(*) /
    * count(col) / approx_count_distinct(col), each with an optional
    * `FILTER (WHERE …)`, over bare columns — INTEGRAL for the
    * exact-decimal families (float/double sums are not exactly
    * foldable and reject loudly). The finish view renders EXACTLY the
    * SELECT's columns (names, order, types), so reading the mview is
    * indistinguishable from running the SELECT at the refreshed
    * versions. Anything outside the shape rejects with the supported
    * grammar in the message — never a silently-wrong view.
    */
  def createFromSql(spark: SparkSession, cat: GraftCatalog,
                    viewRef: String, sql: String, buckets: Int = 16)
      : (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, SubqueryAlias, Filter => LFilter}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    import org.apache.spark.sql.types._

    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"create_mview_sql: $why — supported shape: SELECT <group cols or " +
        "aliased group exprs>, <sum|avg|min|max|count aggregates " +
        "[FILTER (WHERE …)] AS alias> " +
        s"FROM <one table of catalog ${cat.name()}> [WHERE …] GROUP BY " +
        "<the group cols/exprs> [HAVING …]; aggregate inputs must be " +
        "bare columns (integral for sum/avg/min/max; any type for " +
        "count/approx_count_distinct). Got: " + sql)

    val analyzed = spark.sql(sql).queryExecution.analyzed
    // HAVING analyzes as Filter-over-Aggregate (plus a narrowing
    // Project when the HAVING references aggregates not in the SELECT
    // list — the analyzer materializes them as hidden aggregate
    // outputs): the condition becomes a READ-TIME filter over the
    // finish rendering, so the state keeps every group (SQL HAVING
    // semantics survive refreshes that move groups across the bar)
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.catalyst.expressions.NamedExpression
    val (visible, having, groups, aggs, child):
        (Option[Seq[AttributeReference]], Option[Expression],
         Seq[Expression], Seq[NamedExpression], LogicalPlan) =
      analyzed match {
        case Project(pl, LFilter(cond, Aggregate(g, a, c, _)))
            if pl.forall(_.isInstanceOf[AttributeReference]) =>
          (Some(pl.map(_.asInstanceOf[AttributeReference])), Some(cond),
            g, a, c)
        case LFilter(cond, Aggregate(g, a, c, _)) =>
          (None, Some(cond), g, a, c)
        case Aggregate(g, a, c, _) => (None, None, g, a, c)
        case _ => bad("the query is not a single grouped aggregate")
      }
    // peel the chain down to a LEFT-DEEP join tree of graft relations:
    // the LEFTMOST leaf is the FACT (its CDC drives incremental
    // refresh), every INNER/LEFT-joined right side is a DIM (read at
    // an anchored version, broadcast into every fold; any dim change
    // forces the honest full recompute). WHEREs collect wherever they
    // sit on the fact spine — a fact-side filter commutes with the
    // joins; a filtered DIM subquery does NOT (pre- vs post-join
    // filtering differ under LEFT OUTER) and rejects.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
    def stripAlias(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => stripAlias(c)
      case other => other
    }
    def peel(p: LogicalPlan, conds: List[Expression])
        : (DataSourceV2Relation,
           List[(DataSourceV2Relation, String, Expression)],
           List[Expression]) = p match {
      case SubqueryAlias(_, c) => peel(c, conds)
      case LFilter(cond, c) => peel(c, cond :: conds)
      case Join(l, r, jt, cond, _) =>
        val jtName = jt match {
          case Inner => "inner"
          case LeftOuter => "left_outer"
          case other => bad(s"unsupported join type ${other.sql} — " +
            "fact ⋈ dims mviews fold INNER and LEFT OUTER joins (fact " +
            "on the left)")
        }
        val dimRel = stripAlias(r) match {
          case dr: DataSourceV2Relation => dr
          case other => bad("the right (dimension) side of a join must " +
            s"be a bare table of this catalog, got ${other.nodeName}")
        }
        val c = cond.getOrElse(bad("joins need an ON condition"))
        val (fact, ds, cs) = peel(l, conds)
        (fact, ds :+ ((dimRel, jtName, c)), cs)
      case r: DataSourceV2Relation => (r, Nil, conds)
      case other => bad(s"unsupported operator ${other.nodeName} between " +
        "the aggregate and the table scan")
    }
    val (rel, dimsRaw, conds) = peel(child, Nil)
    def refOf(r: DataSourceV2Relation): String =
      (r.catalog, r.identifier) match {
        case (Some(c), Some(id)) if c.name() == cat.name() =>
          (id.namespace.toSeq :+ id.name).mkString(".")
        case _ => bad("every table in the FROM must be a table of " +
          "this catalog")
      }
    val baseRef = refOf(rel)
    val dimRefs = dimsRaw.map { case (dr, _, _) => refOf(dr) }
    // exprId → (relation index, original name): 0 = fact, i = dim i.
    // All downstream resolution is BY exprId — names may collide
    // across the join (the classic `id` ⋈ `id`), so colliding
    // referenced columns get a flat `<name>_<relIdx>` state rename
    import org.apache.spark.sql.catalyst.expressions.ExprId
    val rels = rel +: dimsRaw.map(_._1)
    val attrInfo: Map[ExprId, (Int, String)] =
      rels.zipWithIndex.flatMap { case (r, i) =>
        r.output.map(a => a.exprId -> ((i, a.name)))
      }.toMap
    val referenced: Seq[ExprId] =
      (groups ++ aggs ++ conds ++ dimsRaw.map(_._3))
        .flatMap(_.collect { case a: AttributeReference => a.exprId })
        .filter(attrInfo.contains).distinct
    val stateNameOf: Map[ExprId, String] =
      if (dimsRaw.isEmpty)
        attrInfo.map { case (id, (_, n)) => id -> n }
      else {
        val byName = referenced.groupBy(id => attrInfo(id)._2)
        val m = referenced.map { id =>
          val (ri, n) = attrInfo(id)
          id -> (if (byName(n).size == 1) n else s"${n}_$ri")
        }.toMap
        val names = m.values.toSeq
        if (names.distinct.size != names.size)
          bad("flat state names collide after join disambiguation (" +
            names.diff(names.distinct).distinct.mkString(", ") +
            ") — rename the clashing columns")
        m
      }
    def bareAttr(e: Expression, what: String): AttributeReference =
      e match {
        case a: AttributeReference if stateNameOf.contains(a.exprId) => a
        case other => bad(s"$what must be a bare base column, got " +
          other.sql)
      }
    def bareCol(e: Expression, what: String): String =
      stateNameOf(bareAttr(e, what).exprId)
    // clock-dependent functions are DETERMINISTIC within one query but
    // vary across refreshes — a WHERE/FILTER/key built on them would
    // fold new deltas under different semantics than the existing
    // state, silently diverging the view from its SELECT
    val ClockFns = Set("current_date", "current_timestamp", "now",
      "localtimestamp", "current_timezone", "current_time",
      "unix_timestamp")
    def rejectClock(e: Expression, what: String): Unit =
      ClockFns.find(f => e.exists(_.prettyName == f)).foreach { f =>
        bad(s"$what uses $f(), which would evaluate DIFFERENTLY at " +
          "each refresh — materialize against a literal instant instead")
      }
    // predicates round-trip through expr() against BARE flat frames
    // later — strip the reader-context qualifiers off every attribute
    // and swap in its flat state name
    def predSql(e: Expression): String = {
      rejectClock(e, "a WHERE/FILTER/ON predicate or key expression")
      e.transform {
        case a: AttributeReference =>
          a.withQualifier(Nil).withName(stateNameOf.getOrElse(a.exprId,
            bad(s"reference '${a.name}' does not resolve to a column " +
              "of the joined tables")))
      }.sql
    }
    val filterSql = conds match {
      case Nil => None
      case cs => Some(cs.map(c => s"(${predSql(c)})").mkString(" AND "))
    }
    // grouping: bare columns pass through; any other DETERMINISTIC
    // expression over base columns becomes a DERIVED key — its alias
    // in the SELECT list names the state column (`GROUP BY
    // CAST(ts AS DATE)` with `SELECT CAST(ts AS DATE) AS day …` keys
    // the state on `day`), the expression recomputes on every state
    // input
    val derivedKeys =
      scala.collection.mutable.LinkedHashMap.empty[String, String]
    def keyName(g: Expression): String = g match {
      case a: AttributeReference if stateNameOf.contains(a.exprId) =>
        stateNameOf(a.exprId)
      case e if e.deterministic =>
        val alias = aggs.collectFirst {
          case Alias(child, name) if child.semanticEquals(e) => name
        }.getOrElse(bad(s"GROUP BY expression ${e.sql} must appear " +
          "ALIASED in the SELECT list (AS <name>) — the alias names " +
          "the key"))
        if (!alias.matches("[A-Za-z_][A-Za-z0-9_]*"))
          bad(s"GROUP BY expression ${e.sql} needs a bare-identifier " +
            s"alias, got '$alias'")
        rejectClock(e, s"the GROUP BY expression ${e.sql}")
        // predSql validates every reference resolves (and renames it)
        derivedKeys(alias) = predSql(e)
        alias
      case e => bad(s"non-deterministic GROUP BY expression ${e.sql}")
    }
    val keys = groups.map(keyName)
    def integral(e: Expression, what: String): String = {
      val a = bareAttr(e, what)
      a.dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case dt => bad(s"aggregate input '${a.name}' is " +
          s"${dt.simpleString} — the exact-decimal incremental state " +
          "folds INTEGRAL columns only (float/double sums are not " +
          "exactly foldable)")
      }
      stateNameOf(a.exprId)
    }
    // measure naming: the source column, plus a deterministic suffix
    // when a per-aggregate FILTER makes it a distinct state family
    def measureName(colName: String, pred: Option[String]): String =
      pred match {
        case None => colName
        case Some(p) =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(p.getBytes("UTF-8")).take(3).map("%02x".format(_))
            .mkString
          s"${colName}_f$h"
      }
    // one pass over the SELECT list: collect measures (deduped by
    // state family) and the finish rendering per output column
    val measures = scala.collection.mutable.LinkedHashMap
      .empty[(String, String, Option[String]), Measure]
    var sawCountStar = false
    def measure(func: String, colName: String, pred: Option[String])
        : Measure =
      measures.getOrElseUpdate((func, colName, pred),
        Measure(func, colName, pred, measureName(colName, pred)))
    def render(out: org.apache.spark.sql.catalyst.expressions.NamedExpression)
        : String = out match {
      case a: AttributeReference =>
        val st = stateNameOf.getOrElse(a.exprId, bad(s"non-aggregate " +
          s"output '${a.name}' is not a base column"))
        if (!keys.contains(st)) bad(s"non-aggregate output " +
          s"'${a.name}' is not a GROUP BY column")
        // a join-renamed key surfaces under the SELECT's own name
        if (st == a.name) s"`$st`" else s"`$st` AS `${a.name}`"
      case Alias(a: AttributeReference, name) =>
        val st = stateNameOf.getOrElse(a.exprId, bad(s"non-aggregate " +
          s"output '${a.name}' is not a base column"))
        if (!keys.contains(st)) bad(s"non-aggregate output " +
          s"'${a.name}' is not a GROUP BY column")
        s"`$st` AS `$name`"
      // a DERIVED key's select-list alias: the state stores it under
      // this name already
      case Alias(childE, name)
          if !childE.isInstanceOf[AggregateExpression] &&
            derivedKeys.contains(name) &&
            groups.exists(_.semanticEquals(childE)) =>
        s"`$name`"
      case al @ Alias(ae: AggregateExpression, name) =>
        if (ae.isDistinct) bad("exact COUNT(DISTINCT col) is not " +
          "incrementally foldable — use approx_count_distinct(col) " +
          "(HLL-sketch state; sketch unions ARE the fold) or the " +
          "measures grammar's dcount:col")
        val pred = ae.filter.map(predSql)
        def cast(inner: String): String =
          s"CAST($inner AS ${al.dataType.sql})"
        ae.aggregateFunction match {
          case Sum(e, _) =>
            val c = integral(e, "sum's input")
            val m = measure("sum", c, pred)
            s"CASE WHEN _nn_${m.name} = 0 THEN CAST(NULL AS " +
              s"${al.dataType.sql}) ELSE ${cast(s"_sum_${m.name}")} END " +
              s"AS `$name`"
          case Average(e, _) =>
            val c = integral(e, "avg's input")
            val m = measure("sum", c, pred)
            s"CASE WHEN _nn_${m.name} = 0 THEN CAST(NULL AS " +
              s"${al.dataType.sql}) ELSE ${cast(
                s"CAST(_sum_${m.name} AS DOUBLE) / _nn_${m.name}")} END " +
              s"AS `$name`"
          case Min(e) =>
            val c = integral(e, "min's input")
            val m = measure("min", c, pred)
            s"${cast(s"_min_${m.name}")} AS `$name`"
          case Max(e) =>
            val c = integral(e, "max's input")
            val m = measure("max", c, pred)
            s"${cast(s"_max_${m.name}")} AS `$name`"
          case Count(Seq(Literal(1, IntegerType))) if pred.isEmpty =>
            sawCountStar = true
            s"_cnt AS `$name`"
          // approx_count_distinct rides the dcount HLL state: the
          // sketch union IS the incremental fold. The state estimator
          // is the DataSketches HLL (hll_sketch_agg), not Spark's
          // HLL++ — both approximate the same cardinality within ~2%
          // default error, so the view is as-approximate as the
          // SELECT, not bit-identical to its estimates
          case h: org.apache.spark.sql.catalyst.expressions.aggregate
              .HyperLogLogPlusPlus =>
            val a = bareAttr(h.child, "approx_count_distinct's input")
            a.dataType match {
              case IntegerType | LongType | StringType | BinaryType => ()
              case dt => bad("approx_count_distinct's input '" + a.name +
                s"' is ${dt.simpleString} — the HLL sketch state folds " +
                "INT/BIGINT/STRING/BINARY columns only (CAST in a " +
                "generated column, or count a key of that type)")
            }
            val m = measure("dcount", stateNameOf(a.exprId), pred)
            s"CAST(coalesce(hll_sketch_estimate(_hll_${m.name}), 0) AS " +
              s"BIGINT) AS `$name`"
          case Count(Seq(e)) if !e.isInstanceOf[Literal] =>
            val a = bareAttr(e, "count's input")
            val c = stateNameOf(a.exprId)
            // an INTEGRAL column rides the sum family's _nn_ partial
            // (state shared with any sum/avg over the same column); any
            // other type gets the count-only family — never a _sum_
            // state whose CAST(col AS DECIMAL) would fail or rot
            val isIntegral = a.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }
            if (isIntegral) {
              val m = measure("sum", c, pred) // _nn_<name> IS count(col)
              s"_nn_${m.name} AS `$name`"
            } else {
              val m = measure("cnt", c, pred)
              s"_cn_${m.name} AS `$name`"
            }
          case other => bad(s"unsupported aggregate ${other.prettyName}" +
            (if (pred.nonEmpty && other.isInstanceOf[Count])
              " (count(*) FILTER needs a column: count(col) FILTER …)"
            else ""))
        }
      case other => bad(s"unsupported output expression ${other.sql} " +
        "(expressions OVER aggregates don't fold; alias the raw " +
        "aggregate and compute downstream)")
    }
    val rendered = aggs.map(render)
    if (measures.isEmpty && !sawCountStar)
      bad("the SELECT has no aggregate")
    // output-attribute names by exprId — HAVING conditions and the
    // narrowing projection reference aggregate outputs by attribute
    val outName = aggs.map(ne => ne.exprId -> ne.name).toMap
    val havingSql = having.map { cond =>
      cond.transform {
        case a: AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
            Seq(outName.getOrElse(a.exprId,
              bad(s"HAVING references '${a.name}', not an aggregate output"))))
      }.sql
    }
    val visibleNames = visible.map(_.map(a =>
      outName.getOrElse(a.exprId,
        bad(s"projected column '${a.name}' is not an aggregate output"))))
    val finish = (stName: String) => {
      val inner = s"SELECT ${rendered.mkString(", ")} FROM $stName"
      (havingSql, visibleNames) match {
        case (None, _) => inner
        case (Some(h), None) => s"SELECT * FROM ($inner) WHERE $h"
        case (Some(h), Some(vs)) =>
          // hidden HAVING-only aggregates stay in the inner rendering
          // (their state columns exist either way) and drop here
          s"SELECT ${vs.map(n => s"`$n`").mkString(", ")} " +
            s"FROM ($inner) WHERE $h"
      }
    }
    // the flat projections: only columns the view actually references
    // reach the join (column-pruned dims broadcast small)
    val factColsProj =
      if (dimsRaw.isEmpty) Nil
      else referenced.filter(id => attrInfo(id)._1 == 0)
        .map(id => attrInfo(id)._2 -> stateNameOf(id))
    val dimSpecs = dimsRaw.zipWithIndex.map { case ((_, jt, cond), i0) =>
      val i = i0 + 1
      Dim(dimRefs(i0), jt, predSql(cond),
        referenced.filter(id => attrInfo(id)._1 == i)
          .map(id => attrInfo(id)._2 -> stateNameOf(id)),
        anchor = -1L) // create() re-anchors at the dims' current versions
    }
    create(spark, cat, viewRef, baseRef, keys,
      measures.values.toSeq, buckets, filterSql, Some(finish),
      derivedKeys.toSeq, factColsProj, dimSpecs)
  }

  /** REFRESH: fold the base's changes since the last refreshed version
    * into the state. Returns (mode, fromVersion, toVersion) where mode
    * is `current` (nothing to do), `incremental` (insert-only FACT
    * delta folded — requires every dim at its anchored version) or
    * `full` (recompute + sync — deletes/updates in the fact range, OR
    * any dim moved off its anchor: a dim change can rewrite the join
    * result for arbitrary EXISTING fact rows, so no delta is sound).
    *
    * A dim-driven full recompute re-anchors: it reads every dim at its
    * CURRENT version and persists the new anchors AFTER the state
    * commit. A crash between commit and config write self-heals — the
    * next refresh still sees anchor ≠ current and recomputes again
    * (full sync is an idempotent SET).
    */
  def refresh(cat: GraftCatalog, viewRef: String)
      : (String, Long, Long) = {
    val stIdent = split(stateRef(viewRef))
    val st = cat.openTable(stIdent)
    val cfg = readConfig(st.path)
    val base = cat.openTable(split(cfg.base))
    val MaxAttempts = 5
    var attempt = 1
    while (true) {
      val lastV = st.txnVersion(AppId)
      require(lastV >= 0, s"$viewRef has no refresh anchor — recreate it")
      val curV = base.currentVersion
      val dimNow: Map[String, Long] = cfg.dims.map(d =>
        d.ref -> cat.openTable(split(d.ref)).currentVersion).toMap
      val dimsMoved = cfg.dims.exists(d => dimNow(d.ref) != d.anchor)
      if (curV <= lastV && !dimsMoved) return ("current", lastV, lastV)
      def fullRecompute(): (String, Long, Long) = {
        val newCfg = cfg.copy(dims =
          cfg.dims.map(d => d.copy(anchor = dimNow(d.ref))))
        val full = state(preparedInput(cat, newCfg, base.readAt(curV)),
          cfg.keys, cfg.measures)
        if (foldInto(st, curV, full, cfg, fullSync = true,
            expectedLast = lastV, reapplyEqual = dimsMoved)) {
          if (cfg.dims.nonEmpty) writeConfig(st.path, newCfg)
          ("full", lastV, curV)
        } else ("current", lastV, st.txnVersion(AppId))
      }
      try {
        if (dimsMoved || curV <= lastV) return fullRecompute()
        // the config's row filter (and the dim join) applies BEFORE
        // everything, including the incremental-eligibility probe: a
        // null-key or non-insert row OUTSIDE the filter — or an
        // inner-joined fact row matching no dim — is irrelevant to
        // this view (it never contributed to the state)
        val changes = preparedInput(cat, cfg,
          base.readChangesRowsBetween(lastV, curV)).localCheckpoint(true)
        try {
          // incremental needs (a) insert-only changes and (b) NO null
          // group key in the delta — the keyed MERGE matches with ===
          // (ANSI: a null key never matches), so a null-key delta group
          // would INSERT a duplicate state row instead of folding; the
          // full sync handles it exactly. (A LEFT-joined fact insert
          // matching no dim surfaces dim-sourced keys as null and
          // honestly lands here too.)
          val nonIncremental = changes.filter(
            col("_change_type") =!= "insert" ||
              cfg.keys.map(k => col(k).isNull).reduce(_ || _))
            .limit(1).count() > 0L
          if (!nonIncremental) {
            val delta = state(changes.drop("_change_type"), cfg.keys,
              cfg.measures)
            // applied=false: a concurrent refresh already folded to >= curV
            if (foldInto(st, curV, delta, cfg, fullSync = false,
                expectedLast = lastV))
              return ("incremental", lastV, curV)
            return ("current", lastV, st.txnVersion(AppId))
          } else return fullRecompute()
        } finally {
          // free the checkpointed blocks — retries (and long sessions
          // running many refreshes) must not accumulate executor storage
          changes.unpersist()
          ()
        }
      } catch {
        // a concurrent refresh advanced the anchor past the lastV this
        // delta was computed from — folding it would double-count the
        // overlap; recompute from the NEW anchor
        case e: graft.operators.StaleTxnAnchorException =>
          if (attempt >= MaxAttempts) throw e
          attempt += 1
        // the base (or a dim) evolved out from under the view's
        // definition — a dropped/renamed column referenced by keys,
        // measures, filter or join surfaces as a resolution failure
        // deep in the fold; rethrow NAMING the mview with the action
        // (ADD COLUMN and type WIDENING refresh fine and never land
        // here — those are spec'd compatible)
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"refresh_mview($viewRef): the view's definition no longer " +
              s"resolves against base '${cfg.base}'" +
              (if (cfg.dims.nonEmpty)
                cfg.dims.map(_.ref).mkString(" (dims ", ", ", ")")
              else "") +
              s" — keys [${cfg.keys.mkString(", ")}], measures [" +
              cfg.measures.map(_.spec).mkString("; ") + "]" +
              cfg.filter.map(f => s", filter [$f]").getOrElse("") +
              ". A referenced column was likely DROPPED or RENAMED: " +
              "drop_mview and recreate against the new schema. " +
              s"Original: ${e.getMessage}", e)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Every materialized view registered under the catalog (ident of
    * the FINISH view, derived by stripping the `_state` suffix from
    * state tables carrying the mview config), optionally restricted to
    * those over `base`. Discovery is a metadata walk — namespace
    * listing + one config-file existence probe per table, no jobs.
    */
  def list(cat: GraftCatalog, base: Option[String]): Seq[String] = {
    val suffix = "_state"
    cat.listNamespaces().toSeq.flatMap { ns =>
      cat.listTables(ns).toSeq
        .filter(_.name.endsWith(suffix))
        .flatMap { st =>
          val dir = scala.util.Try(cat.openTable(st).path).toOption
          dir.filter(d => Files.isRegularFile(configPath(d))).flatMap { d =>
            val cfg = readConfig(d)
            if (base.forall(_ == cfg.base))
              Some((st.namespace.toSeq :+
                st.name.stripSuffix(suffix)).mkString("."))
            else None
          }
        }
    }.sorted
  }

  /** The registered materialized views over `base`, WITH their parsed
    * configs — the transparent-rewrite rule's discovery probe
    * ([[graft.ext.GraftMviewRewrite]]): one namespace walk + one
    * config read per mview, metadata-only. A state table whose config
    * fails to parse is skipped (the rewrite must never fail a user
    * query over catalog debris).
    */
  def registered(cat: GraftCatalog, base: String): Seq[(String, Config)] =
    list(cat, Some(base)).flatMap { viewRef =>
      scala.util.Try(
        viewRef -> readConfig(cat.openTable(split(stateRef(viewRef))).path))
        .toOption
    }

  /** The state table's txn anchor = the base version the state was
    * last refreshed to. The rewrite fires ONLY when this equals the
    * base's current version (fully fresh ⇒ provably identical
    * results).
    */
  def stateAnchor(cat: GraftCatalog, viewRef: String): Long =
    cat.openTable(split(stateRef(viewRef))).txnVersion(AppId)

  /** The state table's name parts for `viewRef` (`<ns…>, <name>_state`). */
  def stateTableParts(viewRef: String): Seq[String] =
    stateRef(viewRef).split('.').toSeq

  /** REFRESH every registered materialized view (of `base`, when
    * given): the operational tick after a base mutation — two mviews
    * over one base stay consistent because each refresh anchors on its
    * own state's txn marker. Returns one (view, mode, from, to) per
    * mview.
    */
  def refreshAll(cat: GraftCatalog, base: Option[String])
      : Seq[(String, String, Long, Long)] =
    list(cat, base).map { viewRef =>
      val (mode, from, to) = refresh(cat, viewRef)
      (viewRef, mode, from, to)
    }

  /** DROP: remove the finish view and the state table (with its
    * config + txn anchor). Returns whether anything existed. Refuses
    * unless the state table CARRIES the mview config — a user table
    * that merely happens to be named `<view>_state` (or a plain view
    * with no state at all) is never destroyed through this path.
    */
  def drop(cat: GraftCatalog, viewRef: String): Boolean = {
    val vIdent = split(viewRef)
    val stIdent = split(stateRef(viewRef))
    val stExists = cat.tableExists(stIdent)
    val vExists = GraftViews.exists(catRoot(cat), vIdent)
    if (!stExists && !vExists) return false
    require(stExists,
      s"$viewRef is not a materialized view (no state table " +
        s"'${stateRef(viewRef)}') — a plain view of this name can be " +
        "dropped with drop_view")
    // readConfig throws (clear message) when the directory carries no
    // _graft_mview.json — i.e. the table was NOT created by create_mview
    readConfig(cat.openTable(stIdent).path)
    val v = cat.dropView(vIdent)
    val t = cat.dropTable(stIdent)
    v || t
  }

  private def catRoot(cat: GraftCatalog): String = cat.rootDir
}
