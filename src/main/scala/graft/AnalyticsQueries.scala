package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Sketches}

/** Behavioral analytics + mergeable-sketch surface (round 3 batch 3):
  * ordered funnels, cohort retention, and the HLL / count-min sketches —
  * each with a full DuckDB oracle (the sketches are engine-portable by
  * construction, so even their estimates hash-match).
  */
object AnalyticsQueries {

  val all: Seq[QuerySpec] = Seq(

    // Ordered 3-step funnel (view → click → purchase) with a 24 h
    // per-step conversion window.
    QuerySpec("q79_funnel",
      (s, dir) => Analytics.funnel(Tables.events(s, dir),
        "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), windowSec = 86400L),
      Some("""
        WITH v AS (
          SELECT user_id, min(CAST(ts AS TIMESTAMP)) FILTER (event_type = 'view') AS t1
          FROM events GROUP BY 1),
        c AS (
          SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.t1
            AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 86400 SECOND
          GROUP BY 1),
        p AS (
          SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t2
            AND CAST(e.ts AS TIMESTAMP) <= c.t2 + INTERVAL 86400 SECOND
          GROUP BY 1)
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
          (SELECT count(*) FROM v WHERE t1 IS NOT NULL) AS n_users
        UNION ALL
        SELECT 2, 'click', (SELECT count(*) FROM c)
        UNION ALL
        SELECT 3, 'purchase', (SELECT count(*) FROM p)""")),

    // Cohort retention matrix: first-seen-day cohorts × day offset.
    QuerySpec("q80_cohort_retention",
      (s, dir) => Analytics.cohortRetention(Tables.events(s, dir), "user_id", "ts"),
      Some("""
        WITH f AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1)
        SELECT f.cohort,
          CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
          count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN f ON e.user_id = f.user_id
        GROUP BY 1, 2""")),

    // HyperLogLog distinct count over order keys (b=10 → 1024 buckets):
    // integer harmonic sum, so state AND estimate are engine-exact.
    QuerySpec("q81_hll_distinct",
      (s, dir) => Sketches.hllEstimate(
        Sketches.hllState(Tables.orders(s, dir), "o_orderkey", b = 10), b = 10),
      Some("""
        WITH h AS (
          SELECT CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
          FROM orders),
        st AS (
          SELECT h % 1024 AS bucket,
            max(CASE WHEN h // 1024 = 0 THEN 51 ELSE 51 - length(bin(h // 1024)) END) AS rho
          FROM h GROUP BY 1),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS m_used,
            CAST(sum(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS s_used
          FROM st)
        SELECT m_used,
          s_used + (1024 - m_used) * (CAST(1 AS BIGINT) << 51) AS s,
          0.7213 / (1 + 1.079 / 1024.0) * 1024 * 1024 * 2251799813685248.0
            / (s_used + (1024 - m_used) * (CAST(1 AS BIGINT) << 51)) AS est_distinct
        FROM agg""")),

    // Count-min frequency estimates for every user (d=4 × w=256): the
    // min-over-rows upper bound, alongside the exact count.
    QuerySpec("q82_cms_freq",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val st = Sketches.cmsState(ev, "user_id", d = 4, w = 256)
        Sketches.cmsLookup(st, ev.select("user_id").distinct(), "user_id", d = 4, w = 256)
          .withColumnRenamed("key", "user_id")
          .join(ev.groupBy("user_id").agg(count(lit(1)).as("exact")), Seq("user_id"))
      },
      Some("""
        WITH pos AS (
          SELECT user_id,
            i AS r,
            CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS c
          FROM events, UNNEST(range(0, 4)) AS t(i)),
        st AS (SELECT r, c, count(*) AS cnt FROM pos GROUP BY 1, 2),
        k AS (SELECT DISTINCT user_id FROM events),
        kp AS (
          SELECT user_id,
            i AS r,
            CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 256 AS c
          FROM k, UNNEST(range(0, 4)) AS t(i)),
        est AS (
          SELECT kp.user_id, min(COALESCE(st.cnt, 0)) AS est
          FROM kp LEFT JOIN st ON kp.r = st.r AND kp.c = st.c
          GROUP BY 1),
        ex AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1)
        SELECT est.user_id, est.est, ex.exact
        FROM est JOIN ex ON est.user_id = ex.user_id""")),

    // First-order event-type transition matrix along each user's
    // time-ordered stream (event_id breaks timestamp ties).
    QuerySpec("q91_transition_matrix",
      (s, dir) => Analytics.transitionMatrix(Tables.events(s, dir),
        "user_id", "event_type", "ts", "event_id"),
      Some("""
        WITH d AS (
          SELECT event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
          FROM events)
        SELECT prev AS from_type, event_type AS to_type, count(*) AS n_transitions
        FROM d WHERE prev IS NOT NULL GROUP BY 1, 2""")),

    // Dense hourly re-grid per event type: gap hours 0-filled, the last
    // observed hourly max forward-filled (LOCF).
    QuerySpec("q93_gap_fill",
      (s, dir) => Analytics.gapFill(Tables.events(s, dir),
        "event_type", "ts", "value", unit = "hour"),
      Some("""
        WITH b AS (
          SELECT event_type AS k, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb, value AS v
          FROM events),
        agg AS (SELECT k, hb, count(*) AS n_events, max(v) AS vmax FROM b GROUP BY 1, 2),
        span AS (SELECT min(hb) AS lo, max(hb) AS hi FROM b),
        cal AS (
          SELECT k, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hb
          FROM (SELECT DISTINCT k FROM b) keys, span),
        j AS (
          SELECT cal.k, cal.hb, COALESCE(agg.n_events, 0) AS n_events, agg.vmax
          FROM cal LEFT JOIN agg ON cal.k = agg.k AND cal.hb = agg.hb)
        SELECT k AS event_type, hb AS bucket, n_events,
          last_value(vmax IGNORE NULLS) OVER (
            PARTITION BY k ORDER BY hb
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        FROM j""")),

    // Row-frame moving aggregate: 4-event trailing sum/avg of value per
    // user in (ts, event_id) order. The frame order is a total order,
    // and the sum accumulates in exact DECIMAL over the ≤4-row frame,
    // so the float average is engine-identical. Per-USER window — no
    // global sort.
    QuerySpec("q99_moving_avg",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_in_frame"),
            sum(Agg.dec4(col("value"))).over(w).cast("double").as("sum_4"))
          .select(col("user_id"), col("event_id"), col("n_in_frame"),
            col("sum_4"), (col("sum_4") / col("n_in_frame")).as("avg_4"))
      },
      Some("""
        WITH x AS (
          SELECT user_id, event_id,
            count(*) OVER w AS n_in_frame,
            CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_4
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, n_in_frame, sum_4,
          sum_4 / n_in_frame AS avg_4
        FROM x""")),

    // Inter-arrival gaps per user in EXACT integer microseconds: lag
    // diff on the epoch-micro timeline, per-user mean gap by integer
    // floor division — no float time arithmetic anywhere.
    QuerySpec("q100_interarrival",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_gaps"),
            max(col("gap")).as("max_gap_us"),
            expr("sum(gap) div count(1)").as("mean_gap_us"))
      },
      Some("""
        WITH x AS (
          SELECT user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) -
              lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap
          FROM events)
        SELECT user_id, count(*) AS n_gaps,
          CAST(max(gap) AS BIGINT) AS max_gap_us,
          CAST(sum(gap) // count(*) AS BIGINT) AS mean_gap_us
        FROM x WHERE gap IS NOT NULL GROUP BY 1""")),

    // Histogram-sketch quantiles of order value (1000 buckets over
    // [0, 500000)): bounded mergeable state, answers exact to one
    // bucket width — the sketch tier above q58's exact order statistics.
    QuerySpec("q94_histogram_quantile",
      (s, dir) => Sketches.histogramQuantile(
        Sketches.histogramState(Tables.orders(s, dir), "o_totalprice",
          lo = 0.0, hi = 500000.0, n = 1000),
        lo = 0.0, hi = 500000.0, n = 1000, ps = Seq(0.5, 0.9, 0.99)),
      Some {
        // CAST(p AS DOUBLE): a bare 0.5 literal is DECIMAL in DuckDB and
        // renders "0.50" — the round-1 decimal trap in miniature
        val body = Seq(0.5, 0.9, 0.99).map(p => s"""
          SELECT CAST($p AS DOUBLE) AS p, b.bucket, 0.0 + b.bucket * (500000.0 - 0.0) / 1000 AS edge
          FROM (SELECT min(bucket) AS bucket FROM cum, tot
                WHERE cum >= ceil($p * n_rows)) b""").mkString(" UNION ALL ")
        s"""
        WITH st AS (
          SELECT CAST(least(greatest(floor((o_totalprice - 0.0) * 1000 / (500000.0 - 0.0)), 0.0), 999.0) AS BIGINT) AS bucket,
            count(*) AS cnt
          FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        cum AS (
          SELECT bucket, SUM(cnt) OVER (ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM st),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows FROM st)
        $body"""
      }),

    // One-pass data profiling (the ANALYZE-TABLE / data-catalog
    // feature): per column — rows, nulls, exact distinct, min/max, and
    // the modal value with frequency, through canonical string
    // rendering (identical in both engines; binary collation both
    // sides). The data is touched exactly once; per-column stats run
    // over DISTINCT values only.
    QuerySpec("q153_profile",
      (s, dir) => graft.operators.Profiler.profile(
        Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")),
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        val lf = cols.map(c =>
          s"SELECT '$c' AS col_name, CAST($c AS VARCHAR) AS v FROM orders")
          .mkString("\n          UNION ALL ")
        s"""
        WITH lf AS (
          $lf),
        bv AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY 1, 2),
        st AS (
          SELECT col_name, CAST(SUM(cnt) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_nulls,
            count(CASE WHEN v IS NOT NULL THEN 1 END) AS n_distinct,
            min(v) AS min_v, max(v) AS max_v
          FROM bv GROUP BY 1),
        tp AS (
          SELECT col_name, v AS top_v, cnt AS top_n FROM (
            SELECT *, row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, v) AS rn
            FROM bv WHERE v IS NOT NULL) x WHERE rn = 1)
        SELECT st.col_name, st.n_rows, st.n_nulls, st.n_distinct,
          st.min_v, st.max_v, tp.top_v, tp.top_n
        FROM st JOIN tp ON st.col_name = tp.col_name"""
      }),

    // Cross-corpus overlap via HLL inclusion–exclusion (b=10): two
    // overlapping corpus slices sketch INDEPENDENTLY (no join between
    // them, 2·1024 rows of state), the union estimate comes from the
    // bucket-wise-max merge, and |A∩B| ≈ est_a + est_b − est_union —
    // the cheap pre-flight before any cross-corpus dedup /
    // decontamination pass. Integer harmonic sums make even the
    // estimates engine-exact.
    QuerySpec("q157_hll_overlap",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Sketches.hllIntersect(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 3 > 0),
          "text", bits = 10)
      },
      Some {
        // one q81-style state→estimate chain per corpus; the union
        // state sketches the concatenated input (≡ hllMerge)
        def chain(p: String, src: String) = s"""
        h_$p AS (
          SELECT CAST(concat('0x', substr(md5(k), 1, 15)) AS BIGINT) AS h
          FROM $src),
        st_$p AS (
          SELECT h % 1024 AS bucket,
            max(CASE WHEN h // 1024 = 0 THEN 51 ELSE 51 - length(bin(h // 1024)) END) AS rho
          FROM h_$p GROUP BY 1),
        e_$p AS (
          SELECT CAST(count(*) AS BIGINT) AS m_$p,
            0.7213 / (1 + 1.079 / 1024.0) * 1024 * 1024 * 2251799813685248.0
              / (sum(CAST(1 AS BIGINT) << (51 - rho))
                 + (1024 - count(*)) * (CAST(1 AS BIGINT) << 51)) AS est_$p
          FROM st_$p)"""
        s"""
        WITH a_keys AS (SELECT text AS k FROM documents WHERE doc_id % 2 = 0),
        b_keys AS (SELECT text AS k FROM documents WHERE doc_id % 3 > 0),
        u_keys AS (SELECT k FROM a_keys UNION ALL SELECT k FROM b_keys),
        ${chain("a", "a_keys")},
        ${chain("b", "b_keys")},
        ${chain("union", "u_keys")}
        SELECT m_a, est_a, m_b, est_b, m_union, est_union,
          est_a + est_b - est_union AS est_intersect
        FROM e_a, e_b, e_union"""
      }),

    // Heavy hitters by sketch→exact escalation: CMS (d=4, w=64 —
    // collisions on purpose) screens rows map-side; only candidate
    // keys reach the exact count, which drops the sketch's false
    // positives. Output is exact; the shuffle carries candidates only.
    QuerySpec("q162_heavy_hitters",
      (s, dir) => Sketches.heavyHitters(Tables.events(s, dir), "user_id",
        d = 4, w = 64, minCount = 80L),
      Some("""
        WITH pos AS (
          SELECT user_id, i AS r,
            CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':'
              || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) % 64 AS c
          FROM events, UNNEST(range(0, 4)) AS t(i)),
        st AS (SELECT r, c, count(*) AS cnt FROM pos GROUP BY 1, 2),
        kp AS (SELECT DISTINCT user_id, r, c FROM pos),
        est AS (
          SELECT kp.user_id, CAST(min(COALESCE(st.cnt, 0)) AS BIGINT) AS est
          FROM kp LEFT JOIN st ON kp.r = st.r AND kp.c = st.c
          GROUP BY 1),
        ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact
               FROM events GROUP BY 1)
        SELECT est.user_id, est.est, ex.exact
        FROM est JOIN ex ON est.user_id = ex.user_id
        WHERE est.est >= 80 AND ex.exact >= 80""")),

    // EXACT milli-quantile profiling — q153's other half (the ANALYZE
    // histogram): q‰ = the smallest value whose cumulative count
    // reaches q·n/1000 (type-1 quantile — a value FROM the data, no
    // interpolation, so every engine lands on the identical double);
    // the integer cross-multiplied rank compare and distinct-value-only
    // windows keep it exact and scale-shaped like the profiler.
    QuerySpec("q195_profile_quantiles",
      (s, dir) => graft.operators.Profiler.quantiles(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        qMilli = Seq(250, 500, 900, 990)),
      Some {
        val lf = Seq("l_quantity", "l_extendedprice", "l_discount").map(c =>
          s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS v FROM lineitem")
          .mkString("\n          UNION ALL ")
        s"""
        WITH lf AS (
          $lf),
        vc AS (
          SELECT col_name, v, CAST(count(*) AS BIGINT) AS cnt
          FROM lf WHERE v IS NOT NULL GROUP BY 1, 2),
        cum AS (
          SELECT col_name, v,
            SUM(cnt) OVER (PARTITION BY col_name ORDER BY v) AS cum,
            SUM(cnt) OVER (PARTITION BY col_name) AS n
          FROM vc)
        SELECT col_name, CAST(q AS BIGINT) AS q_milli, min(v) AS v
        FROM cum, UNNEST([250, 500, 900, 990]) AS t(q)
        WHERE cum * 1000 >= q * n
        GROUP BY 1, 2"""
      }),

    // Q-DIGEST quantile sketch (Shrivastava 2004) — the rank-space tier
    // next to q195's exact quantiles and q94's value-space histogram:
    // 2^16-leaf dyadic tree, deterministic bottom-up compression
    // (parent absorbs children while the combined count stays below
    // n/k), answers from the cumulative over the sketch's upper-bound
    // order. The oracle replays ALL 16 compression levels as CTEs —
    // one mis-merged node anywhere breaks the hash.
    QuerySpec("q198_qdigest_quantiles",
      (s, dir) => {
        val st = Sketches.qdigestState(Tables.lineitem(s, dir),
          "l_extendedprice", lo = 0.0, hi = 200000.0, k = 256)
        Sketches.qdigestQuantile(st, lo = 0.0, hi = 200000.0,
          qMilli = Seq(250, 500, 900, 990))
      },
      Some {
        val passes = (16 to 1 by -1).map { l =>
          val loId = 1L << l
          val hiId = 1L << (l + 1)
          s"""
        g$l AS (
          SELECT c.pid, c.ccnt + COALESCE(p.cnt, 0) AS comb
          FROM (SELECT id // 2 AS pid, CAST(SUM(cnt) AS BIGINT) AS ccnt
                FROM cur$l WHERE id >= $loId AND id < $hiId GROUP BY 1) c
          LEFT JOIN cur$l p ON p.id = c.pid),
        cur${l - 1} AS MATERIALIZED (
          SELECT id, cnt FROM cur$l
          WHERE (id < $loId OR id >= $hiId)
            AND id NOT IN (SELECT pid FROM g$l WHERE comb < (SELECT t FROM thr))
          UNION ALL
          SELECT id, cnt FROM cur$l
          WHERE id >= $loId AND id < $hiId
            AND (id // 2) IN (SELECT pid FROM g$l WHERE comb >= (SELECT t FROM thr))
          UNION ALL
          SELECT pid AS id, comb AS cnt FROM g$l
          WHERE comb < (SELECT t FROM thr)),"""
        }.mkString
        s"""
        WITH lf AS (
          SELECT CAST(least(greatest(floor((l_extendedprice - 0.0) * 65536
              / (200000.0 - 0.0)), 0.0), 65535.0) AS BIGINT) + 65536 AS id
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
        cur16 AS MATERIALIZED (
          SELECT id, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY 1),
        thr AS (
          SELECT greatest(CAST(sum(cnt) AS BIGINT) // 256, 1) AS t FROM cur16),
        ntot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cur16),
        $passes
        nodes AS (
          SELECT id, cnt,
            (id + 1) * (65536 // CAST(pow(2.0, CAST(length(bin(id)) - 1
              AS DOUBLE)) AS BIGINT)) - 65536 AS ub,
            CAST(length(bin(id)) - 1 AS BIGINT) AS lvl
          FROM cur0),
        cq AS (
          SELECT ub, SUM(cnt) OVER (ORDER BY ub, lvl DESC, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM nodes)
        SELECT CAST(q_milli AS BIGINT) AS q_milli,
          CAST(min(ub) AS BIGINT) AS ub,
          0.0 + CAST(min(ub) AS DOUBLE) * (200000.0 - 0.0) / 65536 AS v_est
        FROM cq, UNNEST([250, 500, 900, 990]) AS tq(q_milli), ntot
        WHERE cum * 1000 >= q_milli * ntot.n
        GROUP BY 1"""
      }),

    // Per-GROUP HLL — "distinct users per event type" at corpus scale
    // (the classic distinct-per-day shape): one sketch row-set per
    // group, ≤ |groups|·1024 state rows, one map-side-combining
    // aggregate; estimates from the same exact-integer harmonic sum as
    // q81/q157, now grouped.
    QuerySpec("q201_hll_by_group",
      (s, dir) => Sketches.hllEstimateBy(
        Sketches.hllStateBy(Tables.events(s, dir), "event_type", "user_id",
          b = 10), b = 10),
      Some("""
        WITH h AS (
          SELECT event_type AS grp,
            CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
          FROM events),
        st AS (
          SELECT grp, h % 1024 AS bucket,
            max(CASE WHEN h // 1024 = 0 THEN 51
                ELSE 51 - length(bin(h // 1024)) END) AS rho
          FROM h GROUP BY 1, 2),
        e AS (
          SELECT grp, CAST(count(*) AS BIGINT) AS m_used,
            CAST(sum(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS s_used
          FROM st GROUP BY 1)
        SELECT grp, m_used,
          CAST(s_used + (1024 - m_used) * (CAST(1 AS BIGINT) << 51) AS BIGINT) AS s,
          0.7213 / (1 + 1.079 / 1024.0) * 1024 * 1024 * 2251799813685248.0
            / (s_used + (1024 - m_used) * (CAST(1 AS BIGINT) << 51)) AS est_distinct
        FROM e""")),

    // Per-GROUP q-digest — q198's sketch per group key (quantity
    // quantiles per returnflag): per-group thresholds n_g/k drive the
    // same deterministic 16-level compression, every window partitioned
    // by group. The oracle replays all 16 grouped levels.
    QuerySpec("q202_qdigest_by_group",
      (s, dir) => Sketches.qdigestQuantileBy(
        Sketches.qdigestStateBy(Tables.lineitem(s, dir), "l_returnflag",
          "l_quantity", lo = 0.0, hi = 64.0, k = 64),
        lo = 0.0, hi = 64.0, qMilli = Seq(250, 500, 900, 990)),
      Some {
        val passes = (16 to 1 by -1).map { l =>
          val loId = 1L << l
          val hiId = 1L << (l + 1)
          s"""
        g$l AS (
          SELECT c.grp, c.pid, c.ccnt + COALESCE(p.cnt, 0) AS comb, t.t
          FROM (SELECT grp, id // 2 AS pid, CAST(SUM(cnt) AS BIGINT) AS ccnt
                FROM cur$l WHERE id >= $loId AND id < $hiId GROUP BY 1, 2) c
          LEFT JOIN cur$l p ON p.grp = c.grp AND p.id = c.pid
          JOIN thr t ON t.grp = c.grp),
        cur${l - 1} AS MATERIALIZED (
          SELECT s.grp, s.id, s.cnt FROM cur$l s
          WHERE (s.id < $loId OR s.id >= $hiId)
            AND NOT EXISTS (SELECT 1 FROM g$l g
              WHERE g.comb < g.t AND g.grp = s.grp AND g.pid = s.id)
          UNION ALL
          SELECT s.grp, s.id, s.cnt FROM cur$l s
          WHERE s.id >= $loId AND s.id < $hiId
            AND EXISTS (SELECT 1 FROM g$l g
              WHERE g.comb >= g.t AND g.grp = s.grp AND g.pid = s.id // 2)
          UNION ALL
          SELECT grp, pid AS id, comb AS cnt FROM g$l WHERE comb < t),"""
        }.mkString
        s"""
        WITH lf AS (
          SELECT l_returnflag AS grp,
            CAST(least(greatest(floor((l_quantity - 0.0) * 65536
              / (64.0 - 0.0)), 0.0), 65535.0) AS BIGINT) + 65536 AS id
          FROM lineitem WHERE l_quantity IS NOT NULL),
        cur16 AS MATERIALIZED (
          SELECT grp, id, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY 1, 2),
        thr AS (
          SELECT grp, greatest(CAST(sum(cnt) AS BIGINT) // 64, 1) AS t
          FROM cur16 GROUP BY 1),
        ntot AS (
          SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM cur16 GROUP BY 1),
        $passes
        nodes AS (
          SELECT grp, id, cnt,
            (id + 1) * (65536 // CAST(pow(2.0, CAST(length(bin(id)) - 1
              AS DOUBLE)) AS BIGINT)) - 65536 AS ub,
            CAST(length(bin(id)) - 1 AS BIGINT) AS lvl
          FROM cur0),
        cq AS (
          SELECT grp, ub, SUM(cnt) OVER (PARTITION BY grp
            ORDER BY ub, lvl DESC, id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM nodes)
        SELECT cq.grp, CAST(q_milli AS BIGINT) AS q_milli,
          CAST(min(ub) AS BIGINT) AS ub,
          0.0 + CAST(min(ub) AS DOUBLE) * (64.0 - 0.0) / 65536 AS v_est
        FROM cq
        JOIN ntot ON ntot.grp = cq.grp,
          UNNEST([250, 500, 900, 990]) AS tq(q_milli)
        WHERE cum * 1000 >= q_milli * ntot.n
        GROUP BY 1, 2"""
      }),

    // Grouped simple OLS regression — the regression sibling of q96's
    // grouped Pearson: exact fixed-point moment sums, closed-form
    // slope / intercept / r² as one identical IEEE chain per engine.
    QuerySpec("q216_grouped_ols",
      (s, dir) => Analytics.groupedOls(Tables.lineitem(s, dir),
        "l_returnflag", col("l_quantity"), col("l_extendedprice")),
      Some("""
        WITH b AS (
          SELECT l_returnflag,
            CAST(floor(l_quantity * 10000.0) AS BIGINT) AS xi,
            CAST(floor(l_extendedprice * 10000.0) AS BIGINT) AS yi
          FROM lineitem),
        a AS (
          SELECT l_returnflag, count(*) AS n_rows,
            CAST(SUM(xi) AS DOUBLE) AS sx, CAST(SUM(yi) AS DOUBLE) AS sy,
            CAST(SUM(xi * xi) AS DOUBLE) AS sxx,
            CAST(SUM(yi * yi) AS DOUBLE) AS syy,
            CAST(SUM(xi * yi) AS DOUBLE) AS sxy
          FROM b GROUP BY 1)
        SELECT l_returnflag, n_rows,
          (n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx) AS slope,
          (sy - (n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx) * sx)
            / n_rows AS intercept,
          (n_rows * sxy - sx * sy) * (n_rows * sxy - sx * sy)
            / ((n_rows * sxx - sx * sx) * (n_rows * syy - sy * sy)) AS r2
        FROM a""")),

    // Time-decayed feature sums (the feature-store EWMA shape) in the
    // exact bucket-granular integer form: per (key, 6h bucket), every
    // source bucket's exact sum contributes >>(elapsed buckets) — the
    // oracle replays the whole decay triangle as a banded self-join.
    QuerySpec("q217_decayed_sums",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(
          (col("user_id") % 32).as("k"), unix_micros(col("ts")).as("tus"),
          expr("abs(CAST(round(value * 100) AS BIGINT))").as("cents"))
        Analytics.decayedSums(ev, "k", "tus", "cents",
          bucketMicros = 21600000000L, maxLookback = 40)
      },
      Some("""
        WITH e AS (
          SELECT CAST(user_id % 32 AS BIGINT) AS k,
            epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
            abs(CAST(round(value * 100) AS BIGINT)) AS cents
          FROM events),
        b AS (
          SELECT k, tus // 21600000000 AS b, CAST(sum(cents) AS BIGINT) AS s
          FROM e GROUP BY 1, 2)
        SELECT t.k, t.b AS bucket,
          CAST(sum(s.s >> CAST(t.b - s.b AS INT)) AS BIGINT) AS decayed
        FROM b t JOIN b s ON s.k = t.k AND s.b BETWEEN t.b - 40 AND t.b
        GROUP BY 1, 2""")),

    // Distribution DRIFT between two VERSIONS of a GraftTable — the PSI
    // monitor composed with time travel: tick 2 shifts a third of the
    // cents values, and the drift report buckets BOTH snapshots over
    // the reference's range (integer ppm + milli-bit log2, engine-exact
    // even though PSI is classically a float). user_id doesn't shift —
    // its contributions must come out (near-)zero; the oracle replays
    // snapshots, bucketing, smoothing, and the integer scoring.
    QuerySpec("q223_distribution_drift",
      (s, dir) => {
        GraftSession.tune(s)
        val base = java.nio.file.Files.createTempDirectory("graft_q223_").toString
        val ev = Tables.events(s, dir)
        val rows = ev.select(col("event_id"), col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .withColumn("pk", col("user_id") % 4)
        val t = new graft.operators.GraftTable(s, s"$base/t", Seq("event_id"), "pk")
        t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, cents BIGINT, pk BIGINT"))
        t.upsertReplace(rows)
        val v1 = t.currentVersion
        t.upsertReplace(rows.filter(col("user_id") % 3 === 0)
          .withColumn("cents", col("cents") + 2500))
        val out = graft.operators.Profiler.distributionDrift(
          t.readAt(v1), t.read, Seq("cents", "user_id"), buckets = 10)
        val snap = out.localCheckpoint(true)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(base))
        snap
      },
      Some {
        def mlog2(x: String) =
          s"(CAST(length(bin($x)) - 1 AS BIGINT) * 1000 + (($x - (CAST(1 AS BIGINT) << " +
            s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << " +
            s"(length(bin($x)) - 1)))"
        s"""
        WITH e AS (
          SELECT event_id, user_id,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        cur AS (
          SELECT user_id,
            CASE WHEN user_id % 3 = 0 THEN cents + 2500 ELSE cents END AS cents
          FROM e),
        lr AS (
          SELECT 'cents' AS col_name, CAST(cents AS DOUBLE) AS v FROM e
          UNION ALL SELECT 'user_id', CAST(user_id AS DOUBLE) FROM e),
        lc AS (
          SELECT 'cents' AS col_name, CAST(cents AS DOUBLE) AS v FROM cur
          UNION ALL SELECT 'user_id', CAST(user_id AS DOUBLE) FROM cur),
        rng AS (
          SELECT col_name, min(v) AS lo, max(v) AS hi
          FROM lr WHERE v IS NOT NULL GROUP BY 1),
        cr AS (
          SELECT l.col_name,
            CAST(CASE WHEN r.hi <= r.lo THEN 0.0
                 ELSE least(greatest(floor((l.v - r.lo) * 10 / (r.hi - r.lo)),
                   0.0), 9.0) END AS BIGINT) AS bk,
            CAST(count(*) AS BIGINT) AS c
          FROM lr l JOIN rng r ON l.col_name = r.col_name
          WHERE l.v IS NOT NULL GROUP BY 1, 2),
        cc AS (
          SELECT l.col_name,
            CAST(CASE WHEN r.hi <= r.lo THEN 0.0
                 ELSE least(greatest(floor((l.v - r.lo) * 10 / (r.hi - r.lo)),
                   0.0), 9.0) END AS BIGINT) AS bk,
            CAST(count(*) AS BIGINT) AS c
          FROM lc l JOIN rng r ON l.col_name = r.col_name
          WHERE l.v IS NOT NULL GROUP BY 1, 2),
        grid AS (
          SELECT r.col_name, CAST(b.range AS BIGINT) AS bk
          FROM rng r, range(10) b),
        tp AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS t FROM cr GROUP BY 1),
        tq AS (SELECT col_name, CAST(SUM(c) AS BIGINT) AS t FROM cc GROUP BY 1),
        pp AS (
          SELECT g.col_name, g.bk,
            greatest(((COALESCE(cr.c, 0) + 1) * 1000000)
              // (COALESCE(tp.t, 0) + 10), 1) AS p_ppm
          FROM grid g
          LEFT JOIN cr ON g.col_name = cr.col_name AND g.bk = cr.bk
          LEFT JOIN tp ON g.col_name = tp.col_name),
        qq AS (
          SELECT g.col_name, g.bk,
            greatest(((COALESCE(cc.c, 0) + 1) * 1000000)
              // (COALESCE(tq.t, 0) + 10), 1) AS q_ppm
          FROM grid g
          LEFT JOIN cc ON g.col_name = cc.col_name AND g.bk = cc.bk
          LEFT JOIN tq ON g.col_name = tq.col_name)
        SELECT p.col_name, p.bk, p.p_ppm, q.q_ppm,
          (p.p_ppm - q.q_ppm) * (${mlog2("p.p_ppm")} - ${mlog2("q.q_ppm")})
            AS contrib
        FROM pp p JOIN qq q ON p.col_name = q.col_name AND p.bk = q.bk"""
      })
  )
}
