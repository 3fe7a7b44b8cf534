package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Sampling}

/** Temporal-relational + sampling surface: as-of join, interval (range)
  * join, SCD-2 history build, and deterministic hash-keyed sampling —
  * operators an analytics/training-data engine needs that Spark has no
  * builtin for, each implemented shuffle-minimal (see [[Relational]] and
  * [[Sampling]] for the scale arguments).
  */
object RelQueries {

  val all: Seq[QuerySpec] = Seq(

    // Backward as-of join: each click gets the user's latest prior (or
    // simultaneous) purchase. Union + one ordered window per key — no
    // range-predicate join, no n·m candidate blowup.
    QuerySpec("q53_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        // right side unique per (user_id, ts): asof carry is deterministic
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("value").as("pv"))
        Relational.asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("pv"))
      },
      Some("""
        WITH l AS (
          SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, ts AS asof_ts, max(value) AS asof_pv
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ts, l.value, r.asof_ts, r.asof_pv
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.asof_ts""")),

    // Interval (range) join, keyless: clicks landing in the 5-minute
    // window after each error, via time-bin bucketing (equi-join on the
    // bin + exact refine — never a nested loop). max(), not sum(), over
    // the double: order-independent, so the result is engine-exact.
    QuerySpec("q54_range_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("err_start"),
            (col("ts") + expr("INTERVAL 5 MINUTES")).as("err_end"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts").as("click_ts"), col("value").as("click_value"))
        Relational.rangeJoinPairs(errors, "err_start", "err_end", clicks, "click_ts", 300L)
          .groupBy("err_id")
          .agg(count(lit(1)).as("n_clicks"), max("click_value").as("max_value"))
      },
      Some("""
        WITH e AS (
          SELECT event_id AS err_id, ts AS s, ts + INTERVAL 5 MINUTE AS en
          FROM events WHERE event_type = 'error'),
        c AS (
          SELECT ts AS ct, value AS cv FROM events WHERE event_type = 'click')
        SELECT err_id, count(*) AS n_clicks, max(cv) AS max_value
        FROM e JOIN c ON c.ct >= e.s AND c.ct < e.en
        GROUP BY 1""")),

    // INTERVAL-OVERLAP join, keyless: error windows × signup windows
    // that overlap in time, via the same bin-bucketed equi-join plan
    // (both sides explode to bins; each pair kept once at its overlap-
    // start bin — never a nested loop, never a distinct pass). Overlap
    // duration in exact integer micros.
    QuerySpec("q150_interval_overlap",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("ts").as("e_s"),
            (col("ts") + expr("INTERVAL 10 MINUTES")).as("e_e"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("sg_id"), col("ts").as("s_s"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("s_e"))
        Relational.intervalOverlapPairs(errors, "e_s", "e_e",
            signups, "s_s", "s_e", binSeconds = 600L)
          .select(col("err_id"), col("sg_id"),
            (unix_micros(least(col("e_e"), col("s_e"))) -
              unix_micros(greatest(col("e_s"), col("s_s")))).as("overlap_us"))
      },
      Some("""
        WITH e AS (
          SELECT event_id AS err_id, CAST(ts AS TIMESTAMP) AS es,
            CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS ee
          FROM events WHERE event_type = 'error'),
        g AS (
          SELECT event_id AS sg_id, CAST(ts AS TIMESTAMP) AS gs,
            CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS ge
          FROM events WHERE event_type = 'signup')
        SELECT err_id, sg_id,
          CAST(epoch_us(least(ee, ge)) - epoch_us(greatest(es, gs)) AS BIGINT) AS overlap_us
        FROM e JOIN g ON es < ge AND gs < ee""")),

    // SCD-2 dimension build: each customer's order-price history as
    // half-open validity intervals. One shuffle on the key, one window.
    QuerySpec("q55_scd2_history",
      (s, dir) => Relational.scd2Intervals(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey"),
      Some("""
        WITH dedup AS (
          SELECT o_custkey, o_orderdate AS valid_from,
                 max_by(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2),
        iv AS (
          SELECT o_custkey, valid_from,
                 lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from) AS valid_to,
                 o_totalprice
          FROM dedup)
        SELECT o_custkey, valid_from, valid_to, o_totalprice,
               (valid_to IS NULL) AS is_current
        FROM iv""")),

    // Deterministic Bernoulli-by-hash sample (~10% at threshold '1a'):
    // pure filter, no shuffle, reproducible across engines and runs.
    QuerySpec("q56_hash_sample",
      (s, dir) => Sampling.hashSample(
        Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
        "doc_id", "1a"),
      Some("""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE md5(CAST(doc_id AS VARCHAR)) < '1a'""")),

    // Fixed-size stratified sample: 20 docs per language, by min-k over
    // md5(doc_id) — bounded-buffer aggregate, no per-stratum sort/window.
    QuerySpec("q57_stratified_sample",
      (s, dir) => Sampling.stratifiedSample(Tables.documents(s, dir), "lang", "doc_id", 20),
      Some("""
        SELECT lang, doc_id, rn FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
        WHERE rn <= 20""")),

    // Forward as-of join: each click gets the user's EARLIEST
    // at-or-after purchase — same union + ordered window plan as q53,
    // sorted descending (the next-quote-after shape).
    QuerySpec("q64_asof_forward",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts", "value")
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("value").as("pv"))
        Relational.asofJoin(clicks, purchases, "user_id", "ts", "ts", Seq("pv"),
          forward = true)
      },
      Some("""
        WITH l AS (
          SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        r AS (
          SELECT user_id, ts AS asof_ts, max(value) AS asof_pv
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ts, l.value, r.asof_ts, r.asof_pv
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.asof_ts""")),

    // Context-window chunking: 50-token chunks on a 40-token stride
    // (10-token overlap) — the corpus → training-sequences pass. Pure
    // row-local codegen'd work, no shuffle.
    QuerySpec("q65_chunk_tokens",
      (s, dir) => graft.operators.Chunking.chunkByTokens(
        Tables.documents(s, dir), "doc_id", "text", chunkSize = 50, stride = 40),
      Some("""
        WITH words AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                        x -> len(x) > 0) AS w
          FROM documents)
        SELECT doc_id, d.s AS chunk_start,
          least(50, len(w) - d.s) AS n_tokens,
          array_to_string(w[d.s + 1 : d.s + 50], ' ') AS chunk_text
        FROM words, UNNEST(range(0, len(w), 40)) AS d(s)""")),

    // Deterministic train/val/test split (~90/5/5 by md5 hash range):
    // row-local, reproducible, and stable under corpus growth — a doc
    // keeps its split when new data arrives.
    QuerySpec("q69_dataset_split",
      (s, dir) => Sampling.splitByHash(
        Tables.documents(s, dir).select("doc_id", "lang"),
        "doc_id", Seq("train" -> "e6", "val" -> "f3"), "test"),
      Some("""
        SELECT doc_id, lang,
          CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'train'
               WHEN md5(CAST(doc_id AS VARCHAR)) < 'f3' THEN 'val'
               ELSE 'test' END AS split
        FROM documents""")),

    // Snapshot diff (CDC between table versions — the Delta-CDF /
    // audit feature): two declaratively derived orders snapshots
    // (disjoint key drops + two update rules, so inserts, deletes,
    // single- and double-column updates all occur) diffed by one
    // co-partitioned full-outer join with per-column null-safe
    // comparison — no rendered digests, no float-to-string traps.
    QuerySpec("q161_snapshot_diff",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
        val oldSnap = orders.filter(col("o_orderkey") % 11 =!= 3)
        val newSnap = orders.filter(col("o_orderkey") % 13 =!= 5)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 17 === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
        operators.Relational.tableDiff(oldSnap, newSnap, Seq("o_orderkey"))
      },
      Some {
        val vcols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        val anyDiff = vcols.map(c => s"o.$c IS DISTINCT FROM n.$c").mkString(" OR ")
        val nChanged = vcols.map(c =>
          s"CASE WHEN o.$c IS DISTINCT FROM n.$c THEN 1 ELSE 0 END").mkString(" + ")
        s"""
        WITH o AS (SELECT * FROM orders WHERE o_orderkey % 11 <> 3),
        n AS (
          SELECT o_orderkey, o_custkey,
            CASE WHEN o_orderkey % 17 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
            CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
            o_orderdate, o_orderpriority
          FROM orders WHERE o_orderkey % 13 <> 5)
        SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
          CASE WHEN n.o_orderkey IS NULL THEN 'delete'
               WHEN o.o_orderkey IS NULL THEN 'insert'
               ELSE 'update' END AS change,
          CAST(CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN 0
               ELSE $nChanged END AS BIGINT) AS n_changed
        FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR $anyDiff"""
      })
  )
}
