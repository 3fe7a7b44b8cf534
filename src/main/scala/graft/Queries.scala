package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SafeCastFns, TextFns}
import graft.operators.KeyedTable

/** One oracle-checked query: a Spark implementation plus (usually) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Numeric aggregates go through exact DECIMAL arithmetic so the
  * result is bit-identical regardless of engine or summation order;
  * doubles appear only in row-level deterministic IEEE ops.
  */
object Queries {

  import Agg.{dec4, sumDec4 => sum4}
  import Tables._

  /** Core relational surface — SURVEY §2.A–§2.H over the TPC-H-ish corpus. */
  val core: Seq[QuerySpec] = Seq(

    // §2.E aggregations + §2.C filter + decimal arithmetic (TPC-H Q1 shape)
    QuerySpec("q01_pricing_summary",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_shipdate") < lit("2000-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("count_order"),
          sum4(col("l_quantity")).as("sum_qty"),
          sum4(col("l_extendedprice")).as("sum_base_price"),
          Agg.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          (sum(dec4(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS count_order,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
        FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-06-01'
        GROUP BY l_returnflag, l_linestatus""")),

    // §2.A S8: filter + projection + limit, all pushed into the scan; §2.F T3
    QuerySpec("q02_filter_project_limit",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_quantity") >= 49)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        FROM lineitem WHERE l_quantity >= 49
        ORDER BY l_orderkey, l_linenumber LIMIT 100""")),

    // §2.A S7: keyed point lookup (partition-prunable at scale)
    QuerySpec("q03_point_lookup",
      (s, dir) => orders(s, dir).filter(col("o_orderkey") === 42L),
      Some("SELECT * FROM orders WHERE o_orderkey = 42")),

    // §2.D J1: broadcast dimension enrich with default on miss ('Sonstiges')
    QuerySpec("q04_dim_enrich_default",
      (s, dir) => KeyedTable.lookupEnrich(
          customer(s, dir),
          nation(s, dir).filter(col("n_regionkey") <= 2),
          "c_nationkey", "n_nationkey", "n_name", "nation_name", "Sonstiges")
        .groupBy("nation_name")
        .agg(count(lit(1)).as("n_customers"), sum4(col("c_acctbal")).as("total_acctbal")),
      Some("""
        SELECT COALESCE(n_name, 'Sonstiges') AS nation_name, count(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
        FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_regionkey <= 2) n
          ON c_nationkey = n_nationkey
        GROUP BY 1""")),

    // §2.D multi-way star join: facts shuffle once, dims broadcast
    QuerySpec("q05_star_revenue",
      (s, dir) => {
        val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
        val n = nation(s, dir); val r = region(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .filter(col("r_name").isin("ASIA", "EUROPE") && year(col("o_orderdate")).between(1996, 1998))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("order_year"))
          .agg(
            Agg.sumDiscounted(col("l_extendedprice"), col("l_discount")).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""
        SELECT n_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
          count(*) AS n_lines
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA','EUROPE') AND year(o_orderdate) BETWEEN 1996 AND 1998
        GROUP BY 1, 2""")),

    // §2.D J2: semi-join (EXISTS)
    QuerySpec("q06_semi_join",
      (s, dir) => orders(s, dir).join(
          lineitem(s, dir).filter(col("l_quantity") >= 49)
            .select(col("l_orderkey").as("o_orderkey")),
          Seq("o_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice", "o_orderdate"),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""")),

    // §2.D J4: anti-join (NOT EXISTS)
    QuerySpec("q07_anti_join",
      (s, dir) => customer(s, dir).join(
          orders(s, dir).filter(col("o_orderstatus") === "P")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""")),

    // §2.D J3 + §2.H F2/F7: equi-join on DERIVED keys
    // (date_format 'yy.MM.dd' + lower/strip-space normalization, the
    // torrent↔recording join-key recipe, reference server/etl.py:206,251)
    QuerySpec("q08_derived_key_join",
      (s, dir) => {
        val keyed = orders(s, dir).withColumn("jk",
          concat_ws("|", date_format(col("o_orderdate"), "yy.MM.dd"),
            TextFns.normalizeKey(col("o_orderpriority"))))
        val dim = keyed.filter(col("o_orderstatus") === "F").select("jk").distinct()
        keyed.join(dim, Seq("jk"))
          .groupBy("jk")
          .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price"))
      },
      Some("""
        WITH keyed AS (
          SELECT *, strftime(o_orderdate, '%y.%m.%d') || '|' || lower(replace(o_orderpriority, ' ', '')) AS jk
          FROM orders),
        dim AS (SELECT DISTINCT jk FROM keyed WHERE o_orderstatus = 'F')
        SELECT k.jk AS jk, count(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM keyed k JOIN dim USING (jk) GROUP BY 1""")),

    // §2.B K4 + §2.G U3: upsert-REPLACE, last-writer-wins by version
    QuerySpec("q09_upsert_replace",
      (s, dir) => {
        val l = lineitem(s, dir)
        val base = l.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice"), lit(1).as("_version"))
        val upd = l.filter(col("l_quantity") >= 48)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            (col("l_extendedprice") * 2).as("l_extendedprice"), lit(2).as("_version"))
        KeyedTable.upsertReplace(base, upd, Seq("l_orderkey", "l_linenumber"), "_version",
          tiebreak = Seq("l_returnflag", "l_extendedprice"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"), sum4(col("l_extendedprice")).as("sum_price"))
      },
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, 1 AS _version FROM lineitem),
        upd AS (
          SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice * 2 AS l_extendedprice, 2 AS _version
          FROM lineitem WHERE l_quantity >= 48),
        u AS (
          SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber ORDER BY _version DESC, l_returnflag, l_extendedprice) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd) x)
        SELECT l_returnflag, count(*) AS n_rows,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM u WHERE rn = 1 GROUP BY 1""")),

    // §2.B K3 + §1.4: upsert-MERGE — only non-default update columns win
    QuerySpec("q10_upsert_merge",
      (s, dir) => {
        val o = orders(s, dir)
        val upd = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), lit(0.0).as("o_totalprice"), lit("0-TOUCHED").as("o_orderpriority"))
        KeyedTable.upsertMerge(
            o.select("o_orderkey", "o_totalprice", "o_orderpriority"),
            upd, Seq("o_orderkey"),
            Map("o_totalprice" -> 0.0, "o_orderpriority" -> ""))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price"))
      },
      Some("""
        WITH upd AS (
          SELECT o_orderkey, CAST(0.0 AS DOUBLE) AS o_totalprice, '0-TOUCHED' AS o_orderpriority
          FROM orders WHERE o_orderstatus = 'O')
        SELECT COALESCE(CASE WHEN u.o_orderpriority <> '' THEN u.o_orderpriority END, b.o_orderpriority, '') AS o_orderpriority,
          count(*) AS n_orders,
          CAST(SUM(CAST(COALESCE(CASE WHEN u.o_totalprice <> 0.0 THEN u.o_totalprice END, b.o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders b FULL OUTER JOIN upd u ON b.o_orderkey = u.o_orderkey
        GROUP BY 1""")),

    // §2.B K5: keyed DELETE via anti-join rewrite
    QuerySpec("q11_delete_by_keys",
      (s, dir) => KeyedTable.deleteByKeys(
          lineitem(s, dir),
          orders(s, dir).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), sum4(col("l_quantity")).as("sum_qty")),
      Some("""
        SELECT l_returnflag, count(*) AS n_rows,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
        GROUP BY 1""")),

    // §2.B K8: insert-if-absent (left-anti against target keys, then append)
    QuerySpec("q12_insert_if_absent",
      (s, dir) => {
        val c = customer(s, dir)
        val target = c.join(orders(s, dir).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        val inserts = c.filter(col("c_acctbal") > 0)
        KeyedTable.insertIfAbsent(target, inserts, Seq("c_custkey"))
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) OR c_acctbal > 0
        GROUP BY 1""")),

    // §2.G U1/U2 + §2.I R3: partition-grain import-once idempotency
    QuerySpec("q13_import_once",
      (s, dir) => {
        val o = orders(s, dir).withColumn("yr", year(col("o_orderdate")))
        val target = o.filter(col("yr") <= 1997).withColumn("batch", lit("old"))
        val incoming = o.withColumn("batch", lit("new"))
        KeyedTable.importOnce(target, incoming, "yr")
          .groupBy("yr", "batch").agg(count(lit(1)).as("n_orders"))
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
          CASE WHEN year(o_orderdate) <= 1997 THEN 'old' ELSE 'new' END AS batch,
          count(*) AS n_orders
        FROM orders GROUP BY 1, 2""")),

    // §2.F T1: deterministic top-k (total order: value desc, key asc)
    QuerySpec("q14_topk",
      (s, dir) => orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20),
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // window function: per-group top-n (distributed rank, no driver loop)
    QuerySpec("q15_window_rank",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, dir).withColumn("rank_in_cust", row_number().over(w))
          .filter(col("rank_in_cust") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rank_in_cust FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
        WHERE rn <= 3""")),

    // grouping sets (free from Catalyst; declared engine surface, SURVEY §2.E)
    QuerySpec("q16_rollup",
      (s, dir) => lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), sum4(col("l_quantity")).as("sum_qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // distinct aggregates
    QuerySpec("q17_distinct_agg",
      (s, dir) => lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
          count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
        FROM lineitem GROUP BY 1""")),

    // set ops — INTERSECT / EXCEPT (SURVEY §2.G)
    QuerySpec("q18_intersect",
      (s, dir) => {
        val o = orders(s, dir)
        o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
          .intersect(o.filter(year(col("o_orderdate")) === 1997).select("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997""")),

    QuerySpec("q19_except",
      (s, dir) => {
        val o = orders(s, dir)
        o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
          .except(o.filter(year(col("o_orderdate")) === 1997).select("o_custkey"))
      },
      Some("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997""")),

    // §2.C P6: existence probe — bounded LIMIT-1 scans, never full counts
    QuerySpec("q20_exists_probe",
      (s, dir) => {
        val o = orders(s, dir)
        val hasUrgent = KeyedTable.exists(o.filter(col("o_orderpriority") === "1-URGENT"))
        val hasImpossible = KeyedTable.exists(o.filter(col("o_totalprice") < 0))
        s.range(1).select(
          lit(if (hasUrgent) 1L else 0L).as("has_urgent"),
          lit(if (hasImpossible) 1L else 0L).as("has_negative_price"))
      },
      Some("""
        SELECT CAST(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_orderpriority = '1-URGENT') THEN 1 ELSE 0 END AS BIGINT) AS has_urgent,
               CAST(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_totalprice < 0) THEN 1 ELSE 0 END AS BIGINT) AS has_negative_price""")),

    // §2.H F9: chained CASE WHEN classifier with default (resolution-class shape)
    QuerySpec("q21_case_classifier",
      (s, dir) => part(s, dir)
        .withColumn("size_class",
          when(col("p_type") === "PROMO" && col("p_size") >= 25, "PROMO_LARGE")
            .when(col("p_type") === "PROMO", "PROMO_SMALL")
            .when(col("p_type") === "ECONOMY", "ECONOMY")
            .when(col("p_size") >= 40, "XL")
            .when(col("p_size") >= 20, "L")
            .otherwise("AVI"))
        .groupBy("size_class")
        .agg(count(lit(1)).as("n_parts"), sum4(col("p_retailprice")).as("sum_price")),
      Some("""
        SELECT CASE WHEN p_type = 'PROMO' AND p_size >= 25 THEN 'PROMO_LARGE'
                    WHEN p_type = 'PROMO' THEN 'PROMO_SMALL'
                    WHEN p_type = 'ECONOMY' THEN 'ECONOMY'
                    WHEN p_size >= 40 THEN 'XL'
                    WHEN p_size >= 20 THEN 'L'
                    ELSE 'AVI' END AS size_class,
          count(*) AS n_parts,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM part GROUP BY 1""")),

    // §2.B K7: COPY re-key — rows duplicated under the 'top' partition,
    // originals kept (reference copyto, azurestoragewrapper.py:303-317)
    QuerySpec("q41_rekey_copy",
      (s, dir) => KeyedTable.copyTo(
          orders(s, dir).withColumn("pk", date_format(col("o_orderdate"), "yyyy_MM_dd")),
          col("o_orderstatus") === "P", "pk", lit("top"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price")),
      Some("""
        SELECT pk, count(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM (
          SELECT strftime(o_orderdate, '%Y_%m_%d') AS pk, o_totalprice FROM orders
          UNION ALL
          SELECT 'top' AS pk, o_totalprice FROM orders WHERE o_orderstatus = 'P'
        ) t GROUP BY 1""")),

    // §2.B K6: MOVE re-key — delete + insert under the new key
    // (reference moveto, azurestoragewrapper.py:286-301)
    QuerySpec("q42_rekey_move",
      (s, dir) => KeyedTable.moveTo(
          orders(s, dir).withColumn("pk", date_format(col("o_orderdate"), "yyyy_MM_dd")),
          col("o_orderstatus") === "P", "pk", lit("top"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price")),
      Some("""
        SELECT pk, count(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM (
          SELECT strftime(o_orderdate, '%Y_%m_%d') AS pk, o_totalprice FROM orders
          WHERE o_orderstatus <> 'P'
          UNION ALL
          SELECT 'top' AS pk, o_totalprice FROM orders WHERE o_orderstatus = 'P'
        ) t GROUP BY 1""")),

    // §2.H F1/F10 + §1.2: safe_cast semantics — try-cast with defaults,
    // German date-format round trip, permissive bool token set
    QuerySpec("q22_safe_cast",
      (s, dir) => orders(s, dir)
        .select(
          SafeCastFns.safeInt(substring(col("o_orderpriority"), 1, 1)).as("prio_num"),
          SafeCastFns.safeBool(col("o_orderstatus")).as("open_flag"),
          month(SafeCastFns.safeTimestamp(
            date_format(col("o_orderdate"), "dd.MM.yyyy"), "dd.MM.yyyy",
            lit("1900-01-01").cast("timestamp"))).as("parsed_month"),
          SafeCastFns.safeTimestamp(col("o_orderpriority"), "dd.MM.yyyy",
            lit("1900-01-01").cast("timestamp")).as("fallback_ts"))
        .groupBy("prio_num", "open_flag", "parsed_month", "fallback_ts")
        .agg(count(lit(1)).as("n_rows")),
      Some("""
        SELECT COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER), 0) AS prio_num,
          lower(trim(o_orderstatus)) IN ('yes','true','t','1') AS open_flag,
          CAST(month(COALESCE(try_strptime(strftime(o_orderdate, '%d.%m.%Y'), '%d.%m.%Y'), TIMESTAMP '1900-01-01')) AS INTEGER) AS parsed_month,
          COALESCE(try_strptime(o_orderpriority, '%d.%m.%Y'), TIMESTAMP '1900-01-01') AS fallback_ts,
          count(*) AS n_rows
        FROM orders GROUP BY 1, 2, 3, 4""")),

    // full cube over two dimensions (q16's rollup sibling): Catalyst
    // expands grouping sets with partial aggregation — one pass, no
    // per-set rescan
    QuerySpec("q66_cube",
      (s, dir) => lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), sum4(col("l_quantity")).as("sum_qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    // unpivot/melt: wide metric columns → (key, metric, value) rows —
    // row-local, no shuffle; the long-format feed for per-metric
    // aggregation/feature pipelines
    QuerySpec("q67_unpivot",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_orderkey") % 100 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value"),
      Some("""
        WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 100 = 0)
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM f
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM f
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM f
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM f""")),

    // Feature bucketization: per-group quartile edges by integer-exact
    // rank (the q58 order-statistic trick), broadcast back, bin =
    // count of edges strictly below the value — monotone and
    // deterministic under ties. The two-phase compute-edges →
    // broadcast-assign shape is how a 100 TB bucketizer avoids a
    // global sort: the window is per-group, the assignment row-local.
    QuerySpec("q68_bucketize",
      (s, dir) => {
        val wq = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
        val wn = Window.partitionBy("o_orderpriority")
        val ranked = orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("rn", row_number().over(wq))
          .withColumn("n", count(lit(1)).over(wn))
        val edges = ranked.groupBy("o_orderpriority").agg(
          max(when(col("rn") === expr("(n-1) div 4") + 1, col("o_totalprice"))).as("e1"),
          max(when(col("rn") === expr("(n-1) div 2") + 1, col("o_totalprice"))).as("e2"),
          max(when(col("rn") === expr("(3*(n-1)) div 4") + 1, col("o_totalprice"))).as("e3"))
        orders(s, dir).join(broadcast(edges), Seq("o_orderpriority"))
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            ((col("o_totalprice") > col("e1")).cast("long") +
             (col("o_totalprice") > col("e2")).cast("long") +
             (col("o_totalprice") > col("e3")).cast("long")).as("bin"))
      },
      Some("""
        WITH r AS (
          SELECT o_orderpriority, o_totalprice,
            row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders),
        e AS (
          SELECT o_orderpriority,
            max(CASE WHEN rn = (n-1)//4 + 1 THEN o_totalprice END) AS e1,
            max(CASE WHEN rn = (n-1)//2 + 1 THEN o_totalprice END) AS e2,
            max(CASE WHEN rn = (3*(n-1))//4 + 1 THEN o_totalprice END) AS e3
          FROM r GROUP BY 1)
        SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
          CAST(o.o_totalprice > e.e1 AS BIGINT) + CAST(o.o_totalprice > e.e2 AS BIGINT)
            + CAST(o.o_totalprice > e.e3 AS BIGINT) AS bin
        FROM orders o JOIN e USING (o_orderpriority)"""))
  )

  /** Registry assembled by [[SparkEntry]]. */
  def all: Seq[QuerySpec] =
    core ++ EventQueries.all ++ ExtQueries.all ++ IngestQueries.all ++
      RelQueries.all ++ CurateQueries.all ++ AnalyticsQueries.all ++ TokenQueries.all ++
      FilterQueries.all ++ MlQueries.all
}
