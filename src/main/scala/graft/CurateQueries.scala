package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.NfcNormalize
import graft.functions.TextFns
import graft.operators.{Bloom, Contamination, Dedup, Incremental, Layout, Outliers, Sampling, Tokenize}

/** Corpus-curation surface, round 3 batch 2: the remaining operations a
  * large-scale training-data pipeline runs between "raw crawl" and
  * "training shards" — benchmark decontamination, fuzzy (edit-distance)
  * dedup, robust outlier filtering, repetition quality signals, Bloom
  * join pruning, incremental aggregate maintenance, Z-order layout,
  * Unicode normalization, and PII redaction. Every query carries a full
  * DuckDB oracle; hashes/arithmetic are engine-portable by construction
  * (md5, integer ranks, row-local IEEE ops).
  */
object CurateQueries {

  import Agg.{sumDec4 => sum4}
  import ExtQueries.{SHINGLES_FROM_WORDS_SQL, SHINGLES_SQL, WORDS_SQL}

  val all: Seq[QuerySpec] = Seq(

    // Benchmark decontamination: corpus docs sharing any word 4-gram
    // with the "benchmark" slice (doc_id % 20 == 0 stands in for the
    // eval suite). Benchmark shingles broadcast; the corpus never
    // self-joins.
    QuerySpec("q70_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.ngramOverlap(
            docs.filter(col("doc_id") % 20 =!= 0),
            docs.filter(col("doc_id") % 20 === 0),
            "doc_id", "text", n = 4)
          .select(col("id").as("doc_id"), col("n_shingles"), col("n_hits"),
            col("contaminated"))
      },
      Some(s"""
        WITH $SHINGLES_SQL,
        bench AS (SELECT DISTINCT sh AS bsh FROM sh WHERE doc_id % 20 = 0),
        corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 20 <> 0),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY 1),
        hits AS (
          SELECT doc_id, count(*) AS n_hits
          FROM corp JOIN bench ON sh = bsh GROUP BY 1)
        SELECT s.doc_id, s.n_shingles, COALESCE(h.n_hits, 0) AS n_hits,
          COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id""")),

    // FUZZY decontamination: corpus docs that are NEAR-dups of a bench
    // item (here: 4/5-word-prefix truncations of every 37th doc stand
    // in for paraphrased eval items — exact-match probes like q70 can
    // miss them). Cross-corpus MinHash-LSH (the q32 band construction)
    // then exact-Jaccard verify at 7/10. Bench bands + postings
    // broadcast; the corpus never self-joins.
    QuerySpec("q124_fuzzy_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val bench = docs.filter(col("doc_id") % 37 === 0)
          .withColumn("tk", graft.functions.TextFns.tokens(col("text")))
          .select(col("doc_id"),
            array_join(expr("slice(tk, 1, (size(tk) * 4) div 5)"), " ").as("text"))
        Contamination.fuzzyOverlap(docs, bench, "doc_id", "text",
            n = 4, k = 12, rowsPerBand = 3, num = 7, den = 10)
          .select(col("id").as("doc_id"), col("bench_id"), col("shared"),
            col("n_doc"), col("n_bench"), col("jaccard"))
      },
      Some(s"""
        WITH $WORDS_SQL, $SHINGLES_FROM_WORDS_SQL,
        bw AS (
          SELECT doc_id AS bench_id, w[1:CAST((len(w) * 4) // 5 AS INTEGER)] AS bwl
          FROM words WHERE doc_id % 37 = 0),
        bsh AS MATERIALIZED (
          SELECT DISTINCT bench_id, array_to_string(bwl[i:i+3], ' ') AS sh
          FROM bw, UNNEST(range(1, len(bwl) - 2)) AS t(i)
          WHERE len(bwl) >= 4),
        cmh AS (
          SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
          FROM sh, UNNEST(range(0, 12)) AS t(i) GROUP BY 1, 2),
        cbands AS (
          SELECT doc_id, i // 3 AS band, md5(string_agg(mh, ',' ORDER BY i)) AS sig
          FROM cmh GROUP BY 1, 2),
        bmh AS (
          SELECT bench_id, i, min(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
          FROM bsh, UNNEST(range(0, 12)) AS t(i) GROUP BY 1, 2),
        bbands AS (
          SELECT bench_id, i // 3 AS band, md5(string_agg(mh, ',' ORDER BY i)) AS sig
          FROM bmh GROUP BY 1, 2),
        cand AS (
          SELECT DISTINCT c.doc_id, b.bench_id
          FROM cbands c JOIN bbands b ON c.band = b.band AND c.sig = b.sig),
        shr AS (
          SELECT s.doc_id, b.bench_id, count(*) AS shared
          FROM sh s JOIN bsh b ON s.sh = b.sh GROUP BY 1, 2),
        csz AS (SELECT doc_id, count(*) AS n_doc FROM sh GROUP BY 1),
        bsz AS (SELECT bench_id, count(*) AS n_bench FROM bsh GROUP BY 1)
        SELECT c.doc_id, c.bench_id, CAST(s2.shared AS BIGINT) AS shared,
          CAST(cz.n_doc AS BIGINT) AS n_doc, CAST(bz.n_bench AS BIGINT) AS n_bench,
          CAST(s2.shared AS DOUBLE) / (cz.n_doc + bz.n_bench - s2.shared) AS jaccard
        FROM cand c
        JOIN shr s2 ON c.doc_id = s2.doc_id AND c.bench_id = s2.bench_id
        JOIN csz cz ON c.doc_id = cz.doc_id
        JOIN bsz bz ON c.bench_id = bz.bench_id
        WHERE s2.shared * 10 >= (cz.n_doc + bz.n_bench - s2.shared) * 7""")),

    // Fuzzy dedup by bounded edit distance over short strings, blocked
    // on (brand, head token): the near-identical-title pass.
    QuerySpec("q71_fuzzy_editdist",
      (s, dir) => Dedup.editDistancePairs(
          Tables.part(s, dir), "p_partkey", "p_name",
          struct(col("p_brand"), regexp_extract(col("p_name"), "([^ ]+)$", 1)),
          maxDist = 3)
        .select(col("id_a").as("key_a"), col("id_b").as("key_b"),
          col("t_a").as("name_a"), col("t_b").as("name_b"), col("dist")),
      Some("""
        WITH p AS (
          SELECT p_partkey, p_name, p_brand,
            regexp_extract(p_name, '([^ ]+)$', 1) AS blk
          FROM part)
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
          a.p_name AS name_a, b.p_name AS name_b,
          CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM p a JOIN p b
          ON a.p_brand = b.p_brand AND a.blk = b.blk AND a.p_partkey < b.p_partkey
        WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
          AND levenshtein(a.p_name, b.p_name) <= 3""")),

    // Robust outlier rows by exact rank-based median + MAD per group —
    // no float aggregates in the thresholds.
    QuerySpec("q72_mad_outliers",
      (s, dir) => Outliers.madOutliers(
        Tables.orders(s, dir).select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"), "o_totalprice", "o_orderkey", k = 2.0),
      Some("""
        WITH r AS (
          SELECT o_orderpriority, o_totalprice, o_orderkey,
            row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders),
        med AS (
          SELECT o_orderpriority, max(CASE WHEN rn = (n-1)//2 + 1 THEN o_totalprice END) AS med
          FROM r GROUP BY 1),
        d AS (
          SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice, m.med,
            abs(o.o_totalprice - m.med) AS dev
          FROM orders o JOIN med m USING (o_orderpriority)),
        r2 AS (
          SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY dev, o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM d),
        mad AS (
          SELECT o_orderpriority, max(CASE WHEN rn = (n-1)//2 + 1 THEN dev END) AS mad
          FROM r2 GROUP BY 1)
        SELECT d.o_orderpriority, d.o_orderkey, d.o_totalprice, d.med, mad.mad, d.dev
        FROM d JOIN mad USING (o_orderpriority)
        WHERE d.dev > 2.0 * mad.mad""")),

    // Repetition quality signal (the Gopher-rule family): most frequent
    // word bigram per document and its share of all bigrams.
    QuerySpec("q73_repetition",
      (s, dir) => {
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val bigrams = Tables.documents(s, dir)
          .select(col("doc_id"), posexplode(TextFns.tokens(col("text"))).as(Seq("pos", "t")))
          .withColumn("t2", lead(col("t"), 1).over(w))
          .filter(col("t2").isNotNull)
          .select(col("doc_id"), concat_ws(" ", col("t"), col("t2")).as("bg"))
        val counts = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
        val totals = counts.groupBy("doc_id").agg(sum(col("cnt")).as("n_bigrams"))
        val wt = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("bg"))
        counts.withColumn("rk", row_number().over(wt)).filter(col("rk") === 1)
          .join(totals, Seq("doc_id"))
          .select(col("doc_id"), col("n_bigrams"), col("bg").as("top_bigram"),
            col("cnt").as("top_cnt"),
            (col("cnt").cast("double") / col("n_bigrams")).as("top_frac"),
            (col("cnt").cast("double") / col("n_bigrams") > 0.05).as("repetitive"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        bg AS (
          SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg
          FROM words, UNNEST(range(1, len(w))) AS t(i)
          WHERE len(w) >= 2),
        c AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
        nb AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM c GROUP BY 1),
        top AS (
          SELECT doc_id, bg, cnt FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg) AS rk
            FROM c) x WHERE rk = 1)
        SELECT t.doc_id, nb.n_bigrams, t.bg AS top_bigram, t.cnt AS top_cnt,
          CAST(t.cnt AS DOUBLE) / nb.n_bigrams AS top_frac,
          CAST(t.cnt AS DOUBLE) / nb.n_bigrams > 0.05 AS repetitive
        FROM top t JOIN nb ON t.doc_id = nb.doc_id""")),

    // Bloom-prefiltered semi-join: result ≡ the plain semi-join (the
    // oracle), the bitmap just cuts probe rows before the shuffle.
    QuerySpec("q74_bloom_semijoin",
      (s, dir) => Bloom.semiJoin(
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir).filter(col("c_acctbal") > 9000), "c_custkey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price")),
      Some("""
        SELECT o_orderstatus, count(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey = o_custkey AND c_acctbal > 9000)
        GROUP BY 1""")),

    // Incremental aggregate maintenance: per-key algebraic state built
    // from history and delta separately, merged — oracle is the full
    // recompute, which the merged state must equal exactly.
    QuerySpec("q75_incremental_agg",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val keys = Seq("o_orderpriority")
        val ms = Seq("o_totalprice")
        val merged = Incremental.merge(Seq(
          Incremental.state(o.filter(year(col("o_orderdate")) <= 1997), keys, ms),
          Incremental.state(o.filter(year(col("o_orderdate")) > 1997), keys, ms)), keys, ms)
        Incremental.finish(merged, keys, ms)
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_rows,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_o_totalprice,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_o_totalprice
        FROM orders GROUP BY 1""")),

    // Incremental JOIN-VIEW maintenance (q75's sibling for joins): the
    // orders⋈lineitem view built from a first tick plus the delta-join
    // rule Δ(A⋈B) = ΔA⋈B_new ∪ A_old⋈ΔB — A_old⋈B_old is never
    // re-run. Splits are deliberately CROSSWISE (orders by key parity,
    // lineitem by line number) so all three delta quadrants are
    // non-empty. The aggregated view must equal the one-shot join.
    QuerySpec("q207_incremental_join",
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority"))
        val l = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
            col("l_quantity"))
        val (o1, o2) = (o.filter(col("o_orderkey") % 2 === 0),
          o.filter(col("o_orderkey") % 2 === 1))
        val (l1, l2) = (l.filter(col("l_linenumber") <= 2),
          l.filter(col("l_linenumber") > 2))
        val view = o1.join(l1, Seq("o_orderkey"))
          .unionByName(operators.Incremental.joinDelta(
            o1, o2, l1, l2, Seq("o_orderkey")))
        view.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("sum_qty"))
      },
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1""")),

    // Z-order (Morton) layout key over price band × day-of-cycle: the
    // two-dimensional file-clustering key, pure row-local arithmetic.
    QuerySpec("q76_zorder_layout",
      (s, dir) => {
        val buck = Tables.orders(s, dir).select(col("o_orderkey"),
          least(floor(col("o_totalprice") * 256.0 / 500000.0), lit(255L)).cast("long").as("xb"),
          pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")), lit(256))
            .cast("long").as("yb"))
        buck.withColumn("z", Layout.zValue(col("xb"), col("yb"), 8))
      },
      Some {
        val interleave = (0 until 8).map(b =>
          s"(((xb >> $b) & 1) << ${2 * b}) + (((yb >> $b) & 1) << ${2 * b + 1})")
          .mkString(" + ")
        s"""
        WITH b AS (
          SELECT o_orderkey,
            CAST(least(floor(o_totalprice * 256.0 / 500000.0), 255.0) AS BIGINT) AS xb,
            CAST(((date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256) + 256) % 256 AS BIGINT) AS yb
          FROM orders)
        SELECT o_orderkey, xb, yb, $interleave AS z FROM b"""
      }),

    // Unicode NFC normalization via the custom codegen expression: a
    // decomposed suffix (e+U+0301, a+U+0308) is appended so the
    // normalizer provably composes — lengths shrink by exactly 2.
    QuerySpec("q77_nfc_normalize",
      (s, dir) => {
        val raw = concat(substring(col("text"), 1, 12), lit(" café plän"))
        Tables.documents(s, dir).select(col("doc_id"),
          length(raw).cast("long").as("n_raw"),
          length(NfcNormalize.nfcCol(raw)).cast("long").as("n_nfc"),
          md5(NfcNormalize.nfcCol(raw)).as("nfc_md5"))
      },
      Some("""
        WITH b AS (
          SELECT doc_id, substr(text, 1, 12) || ' cafe""" + "́" + """ pla""" + "̈" + """n' AS raw
          FROM documents)
        SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
          CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
          md5(nfc_normalize(raw)) AS nfc_md5
        FROM b""")),

    // PII redaction: deterministic synthetic emails/phones injected into
    // the text, then scrubbed and counted — row-local regex chain.
    // HTML → text extraction over a synthesized page per doc: the real
    // text embeds in a full document with script/style payloads (the
    // script body even contains a bare '<'), comments, entities, and an
    // attribute-bearing div. Both engines build the IDENTICAL bytes and
    // run the IDENTICAL RE2-safe pipeline (TextFns.stripHtml), so the
    // cleaned-text md5 catches any stage slipping — tag-vs-entity
    // order, non-greedy spans, whitespace collapse.
    QuerySpec("q125_html_extract",
      (s, dir) => {
        val p1 = "<html><head><title>doc</title><style>p{color:red}</style>" +
          "<script>if(1<2)alert(1)</script></head><body><h1>H &amp; T</h1><p>"
        val p2 = "</p><!-- hidden --><div class=\"f\">&lt;tag&gt; " +
          "&#39;q&#39;&nbsp;end</div></body></html>"
        Tables.documents(s, dir)
          .select(col("doc_id"), concat(lit(p1), col("text"), lit(p2)).as("html"))
          .select(col("doc_id"), length(col("html")).as("n_chars_html"),
            TextFns.stripHtml(col("html")).as("clean"))
          .select(col("doc_id"), col("n_chars_html"),
            length(col("clean")).as("n_chars_text"), md5(col("clean")).as("text_md5"))
      },
      Some("""
        WITH h AS (
          SELECT doc_id,
            '<html><head><title>doc</title><style>p{color:red}</style>' ||
            '<script>if(1<2)alert(1)</script></head><body><h1>H &amp; T</h1><p>' ||
            text ||
            '</p><!-- hidden --><div class="f">&lt;tag&gt; ' ||
            '&#39;q&#39;&nbsp;end</div></body></html>' AS html
          FROM documents),
        c AS (
          SELECT doc_id, html,
            trim(regexp_replace(
              replace(replace(replace(replace(replace(replace(
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g'),
                  '<[^>]+>', ' ', 'g'),
                '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
              '\s+', ' ', 'g')) AS clean
          FROM h)
        SELECT doc_id, CAST(length(html) AS INTEGER) AS n_chars_html,
          CAST(length(clean) AS INTEGER) AS n_chars_text, md5(clean) AS text_md5
        FROM c""")),

    // MAIN-CONTENT block extraction (the trafilatura/jusText role,
    // between q125's tag strip and the text filters): pages synthesized
    // with nav/menu/footer blocks that are nearly ALL anchor text plus
    // one real content block; blocks split at block-tag boundaries,
    // scored by text length and integer link density, kept blocks
    // digest in page order. Both engines build identical bytes and run
    // the identical RE2-safe split/strip/extract pipeline.
    QuerySpec("q205_main_content",
      (s, dir) => {
        val p1 = "<div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About us</a> <a href=\"/contact\">Contact</a>" +
          "</div><p>"
        val p2 = "</p><ul><li><a href=\"/a\">Archive</a></li>" +
          "<li><a href=\"/b\">Blog</a></li></ul><div>tiny</div>" +
          "<footer><a href=\"/legal\">Legal notice terms</a></footer>"
        operators.CorpusText.mainContentBlocks(
          Tables.documents(s, dir).select(col("doc_id"),
            concat(lit(p1), col("text"), lit(p2)).as("html")),
          "doc_id", "html", minChars = 10, maxLinkMilli = 300)
      },
      Some {
        def strip(x: String) =
          s"""trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(regexp_replace(regexp_replace(regexp_replace($x,
                '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                '(?s)<!--.*?-->', ' ', 'g'),
                '<[^>]+>', ' ', 'g'),
              '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
              '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
            '\\s+', ' ', 'g'))"""
        s"""
        WITH pages AS (
          SELECT doc_id,
            '<div class="nav"><a href="/">Home</a> <a href="/about">About us</a> <a href="/contact">Contact</a></div><p>'
            || text ||
            '</p><ul><li><a href="/a">Archive</a></li><li><a href="/b">Blog</a></li></ul><div>tiny</div><footer><a href="/legal">Legal notice terms</a></footer>'
            AS html
          FROM documents),
        sp AS (
          SELECT doc_id, regexp_split_to_array(html,
            '(?i)</?(?:p|div|li|h[1-6]|br|td|th|tr|ul|ol|table|section|article|header|footer|nav)[^>]*>') AS f
          FROM pages),
        b AS (
          SELECT doc_id, i AS pos, f[CAST(i + 1 AS INTEGER)] AS raw
          FROM sp, UNNEST(range(0, len(f))) AS t(i)),
        c AS (
          SELECT doc_id, pos, ${strip("raw")} AS btext,
            ${strip("COALESCE(array_to_string(regexp_extract_all(raw, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), '')")} AS ltext
          FROM b),
        k AS (
          SELECT doc_id, pos, btext,
            CAST(length(btext) AS BIGINT) AS tlen,
            CAST(length(ltext) AS BIGINT) AS llen
          FROM c),
        kk AS (
          SELECT *, tlen >= 10 AND llen * 1000 <= 300 * tlen AS kept FROM k)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
          CAST(count(*) FILTER (kept) AS BIGINT) AS n_kept,
          CAST(COALESCE(sum(tlen) FILTER (kept), 0) AS BIGINT) AS kept_chars,
          md5(COALESCE(string_agg(btext, ' ' ORDER BY pos) FILTER (kept), ''))
            AS content_md5
        FROM kk GROUP BY 1"""
      }),

    QuerySpec("q78_pii_redact",
      (s, dir) => {
        val synth = concat(lit("contact "), substring(md5(col("text")), 1, 6),
          lit("@mail.example.com or call 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" :: "), substring(col("text"), 1, 48))
        Tables.documents(s, dir).select(col("doc_id"),
          regexp_count(synth, lit(TextFns.EmailRe)).cast("long").as("n_emails"),
          regexp_count(synth, lit(TextFns.PhoneRe)).cast("long").as("n_phones"),
          TextFns.redactPii(synth).as("redacted"))
      },
      Some("""
        WITH b AS (
          SELECT doc_id,
            'contact ' || substr(md5(text), 1, 6) || '@mail.example.com or call 555-' ||
            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' :: ' || substr(text, 1, 48) AS s
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(s, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
          regexp_replace(
            regexp_replace(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
        FROM b""")),

    // Declarative data-quality report: five expectation checks over the
    // orders table, each one aggregate/anti-join, one report row per
    // check — the publish gate of a lakehouse pipeline.
    QuerySpec("q87_dq_report",
      (s, dir) => operators.Quality.validate(Tables.orders(s, dir), Seq(
        operators.Quality.NotNull("o_custkey"),
        operators.Quality.Unique(Seq("o_orderkey")),
        operators.Quality.InRange("o_totalprice", 0.0, 400000.0),
        operators.Quality.InSet("o_orderstatus", Seq("F", "O")),
        operators.Quality.RefIntegrity("o_custkey", Tables.customer(s, dir),
          "c_custkey", "customer"))),
      Some("""
        SELECT 'not_null(o_custkey)' AS check_name,
          CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS n_violations,
          count(*) FILTER (o_custkey IS NULL) = 0 AS passed
        FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
          count(*) - count(DISTINCT o_orderkey),
          count(*) = count(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'in_range(o_totalprice,0.0,400000.0)',
          CAST(count(*) FILTER (o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) AS BIGINT),
          count(*) FILTER (o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)) = 0
        FROM orders
        UNION ALL
        SELECT 'in_set(o_orderstatus)',
          CAST(count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O')) AS BIGINT),
          count(*) FILTER (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O')) = 0
        FROM orders
        UNION ALL
        SELECT 'ref(o_custkey->customer.c_custkey)',
          CAST(count(*) AS BIGINT),
          count(*) = 0
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""")),

    // Lexical diversity as Gini impurity of the per-doc unigram
    // distribution, in EXACT integer arithmetic (1 − Σp² rendered as
    // parts-per-million: ((n² − Σcnt²)·10⁶) div n²) — the
    // entropy-style quality signal without a cross-engine log(). Long
    // arithmetic holds to ~3M tokens per document (n²·10⁶ < 2^63).
    QuerySpec("q95_gini_diversity",
      (s, dir) => {
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("t"))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
        tf.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_tokens"), sum(col("cnt") * col("cnt")).as("sq"))
          .select(col("doc_id"), col("n_tokens"),
            expr("((n_tokens * n_tokens - sq) * 1000000) div (n_tokens * n_tokens)")
              .as("gini_ppm"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        tf AS (
          SELECT doc_id, t, count(*) AS cnt
          FROM (SELECT doc_id, UNNEST(w) AS t FROM words) x GROUP BY 1, 2),
        m AS (
          SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
            CAST(sum(cnt * cnt) AS BIGINT) AS sq
          FROM tf GROUP BY 1)
        SELECT doc_id, n_tokens,
          CAST(((n_tokens * n_tokens - sq) * 1000000) // (n_tokens * n_tokens) AS BIGINT) AS gini_ppm
        FROM m""")),

    // Grouped Pearson correlation with EXACT moment sums: values
    // quantize to fixed-point longs (floor(x·10⁴) — one deterministic
    // IEEE op; correlation is scale-invariant so the 10⁴ cancels),
    // per-element products stay in long range, the five sums accumulate
    // exactly (DECIMAL(38,0) / HUGEINT — order-independent), and the
    // final expression is the same chain of single IEEE ops in both
    // engines — so even a float statistic hash-matches. (Elementwise
    // DECIMAL products overflow DuckDB's int64-backed DECIMAL(18) —
    // hence the integer route.)
    QuerySpec("q96_correlation",
      (s, dir) => {
        val qi = floor(col("l_quantity") * 10000.0).cast("long")
        val pi = floor(col("l_extendedprice") * 10000.0).cast("long")
        def exact(c: org.apache.spark.sql.Column) =
          sum(c.cast("decimal(38,0)")).cast("double")
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), qi.as("qi"), pi.as("pi"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"),
            exact(col("qi")).as("sx"), exact(col("pi")).as("sy"),
            exact(col("qi") * col("qi")).as("sxx"),
            exact(col("pi") * col("pi")).as("syy"),
            exact(col("qi") * col("pi")).as("sxy"))
          .select(col("l_returnflag"), col("n_rows"),
            ((col("n_rows") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n_rows") * col("sxx") - col("sx") * col("sx")) *
                (col("n_rows") * col("syy") - col("sy") * col("sy")))).as("corr"))
      },
      Some("""
        WITH b AS (
          SELECT l_returnflag,
            CAST(floor(l_quantity * 10000.0) AS BIGINT) AS qi,
            CAST(floor(l_extendedprice * 10000.0) AS BIGINT) AS pi
          FROM lineitem),
        a AS (
          SELECT l_returnflag, count(*) AS n_rows,
            CAST(SUM(qi) AS DOUBLE) AS sx, CAST(SUM(pi) AS DOUBLE) AS sy,
            CAST(SUM(qi * qi) AS DOUBLE) AS sxx,
            CAST(SUM(pi * pi) AS DOUBLE) AS syy,
            CAST(SUM(qi * pi) AS DOUBLE) AS sxy
          FROM b GROUP BY 1)
        SELECT l_returnflag, n_rows,
          (n_rows * sxy - sx * sy) /
          sqrt((n_rows * sxx - sx * sx) * (n_rows * syy - sy * sy)) AS corr
        FROM a""")),

    // Real container-header parsing (no codec library): every 10th doc
    // carries a JPEG SOI payload, the rest a synthesized PNG header with
    // dimensions derived from doc_id. The Spark side must SNIFF the
    // format from magic bytes and PARSE width/height out of the IHDR
    // bytes; the oracle derives the expected values independently from
    // doc_id — a parse(synthesize(w,h)) == (w,h) round trip.
    QuerySpec("q97_media_headers",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val w = lit(100L) + col("doc_id") % 900
        val h = lit(100L) + (col("doc_id") * 7) % 900
        val payload = when(col("doc_id") % 10 === 0,
            concat(unhex(lit("FFD8FFE0")), encode(substring(col("text"), 1, 16), "UTF-8")))
          .otherwise(Multimodal.synthPngHeader(w, h))
        Tables.documents(s, dir).select(col("doc_id"),
          Multimodal.sniffMime(payload).as("mime"),
          Multimodal.pngWidth(payload).as("width"),
          Multimodal.pngHeight(payload).as("height"))
      },
      Some("""
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN 'image/jpeg' ELSE 'image/png' END AS mime,
          CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 100 + doc_id % 900 END AS width,
          CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 100 + (doc_id * 7) % 900 END AS height
        FROM documents""")),

    // REAL audio decode, end-to-end: each doc synthesizes a complete
    // valid mono 16-bit PCM WAV file (RIFF+fmt+data, LE two's-complement
    // samples from a closed-form generator), the JVM codec
    // (WavCodec.decode) walks the chunks and decodes the sample stream,
    // and per-frame integer stats come off the DECODED samples. The
    // oracle replays the generator arithmetic directly — so a hash match
    // proves build → parse → decode → window is lossless, not stubbed.
    QuerySpec("q103_wav_decode",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
        val n = (col("doc_id") % 50 + 20).cast("int")
        val samples = transform(sequence(lit(0), n - 1),
          i => (pmod(col("doc_id") * 31 + i * 17, lit(65536)) - 32768).cast("int"))
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthWavPcm16(lit(8000), samples)),
          "doc_id", "payload", "audio/wav")
        Multimodal.wavFrameStats(media, frameSize = 16, stride = 16).toDF()
      },
      Some("""
        WITH s AS (
          SELECT doc_id, i AS pos,
            ((doc_id * 31 + i * 17) % 65536) - 32768 AS v
          FROM documents, UNNEST(range(0, doc_id % 50 + 20)) AS t(i))
        SELECT doc_id, CAST(8000 AS INTEGER) AS sample_rate,
          CAST(16 AS INTEGER) AS bits,
          CAST(pos // 16 AS BIGINT) AS frame_id,
          CAST(count(*) AS BIGINT) AS n_samples,
          CAST(sum(v) AS BIGINT) AS s_sum,
          CAST(min(v) AS INTEGER) AS s_min,
          CAST(max(v) AS INTEGER) AS s_max
        FROM s GROUP BY 1, 4""")),

    // SILENCE SEGMENTATION over real decoded WAV (the ASR-pipeline
    // silence-trim / clip-extraction step): amplitude-modulated synth
    // clips (every third 8-sample frame quiet), frames classified by
    // integer mean-abs threshold, consecutive active frames merged to
    // maximal segments (gaps-and-islands). The oracle replays the
    // generator, framing, threshold, and island merge — a hash match
    // proves the codec round-trip AND the segmentation.
    QuerySpec("q204_wav_silence_segments",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
        val n = (col("doc_id") % 50 + 20).cast("int")
        val samples = transform(sequence(lit(0), n - 1), i =>
          ((pmod(col("doc_id") * 31 + i * 17, lit(400)) - 200) *
            when(pmod(shiftright(i, 3).cast("long") + col("doc_id"), lit(3)) === 0,
              lit(1)).otherwise(lit(50))).cast("int"))
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthWavPcm16(lit(8000), samples)),
          "doc_id", "payload", "audio/wav")
        Multimodal.wavSilenceSegments(media, frameSize = 8, thrMilli = 1000000L)
      },
      Some("""
        WITH s AS (
          SELECT doc_id, i AS pos,
            (((doc_id * 31 + i * 17) % 400) - 200)
              * (CASE WHEN (i // 8 + doc_id) % 3 = 0 THEN 1 ELSE 50 END) AS v
          FROM documents, UNNEST(range(0, doc_id % 50 + 20)) AS t(i)),
        f AS (
          SELECT doc_id, pos // 8 AS frame_id,
            CAST(count(*) AS BIGINT) AS n, CAST(sum(abs(v)) AS BIGINT) AS abs_sum
          FROM s GROUP BY 1, 2),
        act AS (SELECT * FROM f WHERE abs_sum * 1000 >= 1000000 * n),
        isl AS (
          SELECT doc_id, frame_id, abs_sum,
            frame_id - row_number() OVER (PARTITION BY doc_id ORDER BY frame_id)
              AS island
          FROM act)
        SELECT doc_id, CAST(min(frame_id) AS BIGINT) AS start_frame,
          CAST(max(frame_id) AS BIGINT) AS end_frame,
          CAST(count(*) AS BIGINT) AS n_frames,
          CAST(sum(abs_sum) AS BIGINT) AS energy
        FROM isl GROUP BY doc_id, island""")),

    // Line-level dedup (CCNet/RefinedWeb boilerplate removal) at word
    // granularity on this corpus: segments occurring in > 390 of the
    // docs are dropped everywhere, surviving segments reassemble in
    // order. (With newline-delimited web text the same operator strips
    // shared nav/footer lines; CorpusTextSpec covers that shape.)
    QuerySpec("q105_segment_dedup",
      (s, dir) => operators.CorpusText.dropRepeatedSegments(
        Tables.documents(s, dir), "doc_id", "text", " ", maxDf = 390),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        kept AS (
          SELECT t.doc_id, t.pos, t.term
          FROM tok t JOIN dft d ON t.term = d.term WHERE d.df <= 390),
        orig AS (SELECT doc_id, count(*) AS n_orig FROM tok GROUP BY 1)
        SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
          CAST(any_value(o.n_orig) - count(*) AS BIGINT) AS n_dropped,
          md5(string_agg(k.term, ' ' ORDER BY k.pos)) AS clean_md5
        FROM kept k JOIN orig o ON k.doc_id = o.doc_id GROUP BY 1""")),

    // EXACT-SUBSTRING span dedup (Lee et al. ExactSubstr): any 20-char
    // window occurring >= 4 times anywhere in the corpus marks a span;
    // chained marks merge to maximal spans, spans cut from the text.
    // Catches boilerplate at ANY offset — no delimiter alignment needed
    // (q105's limitation). The oracle replays positions → dup hashes →
    // island merge → ordered string_agg reassembly; the cleaned-text
    // md5 breaks if any span boundary, merge, or cut is off by one.
    QuerySpec("q121_substring_dedup",
      (s, dir) => operators.CorpusText.dropDuplicatedSpans(
          Tables.documents(s, dir), "doc_id", "text", k = 20, minCount = 4)
        .select(col("id").as("doc_id"), col("n_spans"), col("dup_chars"),
          col("n_chars_clean"), col("clean_digest")),
      Some("""
        WITH d AS (SELECT doc_id AS id, text AS t FROM documents),
        p AS (
          SELECT id, i AS pos, substr(md5(substr(t, CAST(i AS INTEGER), 20)), 1, 16) AS h
          FROM d, UNNEST(range(1, length(t) - 19 + 1)) AS u(i)
          WHERE length(t) >= 20),
        dh AS (SELECT h FROM p GROUP BY h HAVING count(*) >= 4),
        m AS (SELECT id, pos FROM p WHERE h IN (SELECT h FROM dh)),
        mk AS (
          SELECT id, pos,
            CASE WHEN lag(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY id ORDER BY pos) + 19
                 THEN 1 ELSE 0 END AS newi
          FROM m),
        gi AS (
          SELECT *, SUM(newi) OVER (PARTITION BY id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS isl
          FROM mk),
        sp AS (SELECT id, isl, min(pos) AS s, max(pos) + 19 AS e FROM gi GROUP BY 1, 2),
        sg AS (
          SELECT id, coalesce(lag(e) OVER (PARTITION BY id ORDER BY s), 0) + 1 AS fp,
            s - 1 AS tp
          FROM sp),
        tails AS (SELECT id, max(e) + 1 AS fp FROM sp GROUP BY 1),
        pieces AS (
          SELECT sg.id, sg.fp,
            substr(d.t, CAST(sg.fp AS INTEGER), CAST(sg.tp - sg.fp + 1 AS INTEGER)) AS piece
          FROM sg JOIN d ON sg.id = d.id WHERE sg.tp >= sg.fp
          UNION ALL
          SELECT tl.id, tl.fp,
            substr(d.t, CAST(tl.fp AS INTEGER), CAST(length(d.t) - tl.fp + 1 AS INTEGER))
          FROM tails tl JOIN d ON tl.id = d.id WHERE tl.fp <= length(d.t)),
        cleaned AS (SELECT id, string_agg(piece, '' ORDER BY fp) AS clean FROM pieces GROUP BY 1),
        agg AS (SELECT id, CAST(count(*) AS INTEGER) AS n_spans,
                  CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars
                FROM sp GROUP BY 1)
        SELECT d.id AS doc_id,
          coalesce(a.n_spans, 0) AS n_spans,
          CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars,
          CAST(length(CASE WHEN a.n_spans IS NULL THEN d.t ELSE coalesce(c.clean, '') END) AS INTEGER) AS n_chars_clean,
          md5(CASE WHEN a.n_spans IS NULL THEN d.t ELSE coalesce(c.clean, '') END) AS clean_digest
        FROM d LEFT JOIN agg a ON d.id = a.id LEFT JOIN cleaned c ON d.id = c.id""")),

    // Bigram LM surprisal scoring — the LM quality filter, trained on
    // the corpus itself, in integer log2 units (bit lengths, no floats
    // in any aggregate) so the score hash-matches cross-engine.
    QuerySpec("q106_lm_surprisal",
      (s, dir) => operators.CorpusText.bigramSurprisal(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        uni AS (SELECT term AS w1, count(*) AS c1 FROM tok GROUP BY 1),
        voc AS (SELECT count(*) AS v FROM uni),
        big AS (
          SELECT doc_id, term AS w1,
            lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM tok QUALIFY w2 IS NOT NULL),
        pair AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        sc AS (
          SELECT b.doc_id,
            (length(bin(u.c1 + v.v)) - 1) - (length(bin(p.c12 + 1)) - 1) AS bits
          FROM big b
          JOIN pair p ON b.w1 = p.w1 AND b.w2 = p.w2
          JOIN uni u ON b.w1 = u.w1
          CROSS JOIN voc v)
        SELECT doc_id, count(*) AS n_bigrams,
          CAST(SUM(bits) AS BIGINT) AS surprise_bits,
          CAST(SUM(bits) AS DOUBLE) / count(*) AS bits_per_bigram
        FROM sc GROUP BY 1""")),

    // Character-distribution entropy in integer milli-bits — the cheap
    // garbage detector (binary/base64 → near-uniform high entropy;
    // padding/mashing → low; natural text in a stable band). One char
    // explode + two aggregates + a doc-keyed join; hash-exact.
    QuerySpec("q133_char_entropy",
      (s, dir) => operators.CorpusText.charEntropy(
        Tables.documents(s, dir), "doc_id", "text"),
      Some {
        def mlog2(x: String) =
          s"((length(bin($x)) - 1) * 1000 + (($x - (CAST(1 AS BIGINT) << (length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << (length(bin($x)) - 1)))"
        s"""
        WITH hist AS (
          SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT doc_id, UNNEST(list_filter(string_split(text, ''), x -> x <> '')) AS ch
            FROM documents) GROUP BY 1, 2),
        tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM hist GROUP BY 1),
        mb AS (
          SELECT h.doc_id, t.n, h.c * (${mlog2("t.n")} - ${mlog2("h.c")}) AS mb
          FROM hist h JOIN tot t ON h.doc_id = t.doc_id)
        SELECT doc_id, CAST(max(n) AS BIGINT) AS n_chars,
          CAST(SUM(mb) AS BIGINT) AS ent_mb,
          CAST(SUM(mb) // max(n) AS BIGINT) AS mb_per_char
        FROM mb GROUP BY 1"""
      }),

    // Johnson-Lindenstrauss ±1 random projection over the embedding
    // column, fixed-point exact: 64 dims → 8 coordinates p_k =
    // Σ_i sign(i,k)·floor(v_i·1e9) with the sign matrix derived from
    // md5("i_k") (Achlioptas-style Rademacher projection — engine-
    // portable: any SQL engine regenerates the same matrix from its own
    // md5). Row-local map over the scan — at 100 TB the projection
    // shrinks vectors BEFORE any LSH shuffle. The sign-bucket code of
    // the projected coords doubles as the coarse ANN partitioner.
    QuerySpec("q134_jl_projection",
      (s, dir) => {
        import graft.functions.VectorFns
        val k = 8
        val proj = (0 until k).map(j =>
          VectorFns.jlCoord(col("embedding"), dIn = 64, k = j).as(s"p$j"))
        val bucket = (0 until k).map(j =>
          when(col(s"p$j") > 0, 1 << j).otherwise(0)).reduce(_ + _)
        Tables.embeddings(s, dir)
          .select(col("vec_id") +: proj: _*)
          .withColumn("bucket", bucket)
      },
      Some {
        val pCols = (0 until 8).map(j =>
          s"CAST(max(CASE WHEN k = $j THEN p END) AS BIGINT) AS p$j").mkString(",\n          ")
        val bExpr = (0 until 8).map(j =>
          s"CASE WHEN max(CASE WHEN k = $j THEN p END) > 0 THEN ${1 << j} ELSE 0 END")
          .mkString(" + ")
        s"""
        WITH el AS (
          SELECT vec_id, i, CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
          FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)),
        sgn AS (
          SELECT i, k,
            CASE WHEN substr(md5(i || '_' || k), 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS s
          FROM UNNEST(range(0, 64)) AS u(i), UNNEST(range(0, 8)) AS v(k)),
        pr AS (
          SELECT vec_id, k, SUM(CAST(floor(x * 1e9) AS BIGINT) * s) AS p
          FROM el JOIN sgn ON el.i = sgn.i GROUP BY 1, 2)
        SELECT vec_id,
          $pCols,
          CAST($bExpr AS INTEGER) AS bucket
        FROM pr GROUP BY 1"""
      }),

    // ANN THROUGH the JL projection — q134 put to work: the q35 bucketed
    // probe with buckets from 8 Rademacher projections instead of the
    // first 8 raw axes (axis planes hash badly when leading dims are
    // correlated; JL planes mix all 64). Same ~2^bits candidate cut,
    // same co-located join; the oracle replays projection, bucketing,
    // and the fixed-point cosine ranking end to end.
    QuerySpec("q136_knn_jl_bucketed",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        operators.SimilaritySearch.jlBucketedTopK(
          e.filter(col("vec_id") < 32), e, "vec_id", "embedding",
          k = 3, bits = 8, dIn = 64)
      },
      Some("""
        WITH el AS (
          SELECT vec_id, i, CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
          FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)),
        sgn AS (
          SELECT i, k,
            CASE WHEN substr(md5(i || '_' || k), 1, 1) IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS s
          FROM UNNEST(range(0, 64)) AS u(i), UNNEST(range(0, 8)) AS v(k)),
        pr AS (
          SELECT vec_id, k, SUM(CAST(floor(x * 1e9) AS BIGINT) * s) AS p
          FROM el JOIN sgn ON el.i = sgn.i GROUP BY 1, 2),
        b AS (
          SELECT e.vec_id, e.embedding, bk.bucket
          FROM embeddings e JOIN (
            SELECT vec_id,
              SUM(CASE WHEN p > 0 THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER) ELSE 0 END) AS bucket
            FROM pr GROUP BY 1) bk ON e.vec_id = bk.vec_id),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        pairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM b q JOIN b e ON q.bucket = e.bucket
          WHERE q.vec_id < 32 AND e.vec_id <> q.vec_id),
        pel AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM pairs),
        dots AS (SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot FROM pel GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 3""")),

    // Interpolated KNESER-NEY bigram LM surprisal (D=3/4) — the
    // production smoothing behind CCNet-style LM quality filters (q106's
    // add-one badly underestimates rare-but-real continuations; KN backs
    // off to the novel-continuation probability). Exact rational
    // formulation multiplied through to integers, milli-bit log2, so the
    // per-doc scores hash cross-engine. The oracle replays discounting,
    // both continuation-count tables, and the interpolated log.
    QuerySpec("q130_kn_surprisal",
      (s, dir) => operators.CorpusText.knSurprisal(
        Tables.documents(s, dir), "doc_id", "text", dQuarters = 3),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        ${operators.CorpusText.knOracleCtes(3)}
        SELECT doc_id, n_bigrams, kn_mb, mb_per_bigram FROM kn""")),

    // CCNet's head/middle/tail split: per language, rank docs by the KN
    // score and cut at EXACT integer terciles (rank·3 vs n) — the bucket
    // boundaries CCNet mixes with different sampling rates. Composes
    // q130's scorer; the oracle replays the shared KN chain + window.
    QuerySpec("q137_perplexity_buckets",
      (s, dir) => operators.CorpusText.perplexityBuckets(
        Tables.documents(s, dir), "doc_id", "text", "lang", dQuarters = 3),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        ${operators.CorpusText.knOracleCtes(3)},
        sc AS (
          SELECT d.lang, k.doc_id, k.mb_per_bigram
          FROM kn k JOIN documents d ON k.doc_id = d.doc_id),
        r AS (
          SELECT lang, mb_per_bigram,
            row_number() OVER (PARTITION BY lang ORDER BY mb_per_bigram, doc_id) AS rn,
            count(*) OVER (PARTITION BY lang) AS n
          FROM sc)
        SELECT lang,
          CASE WHEN rn * 3 <= n THEN 'head'
               WHEN rn * 3 <= n * 2 THEN 'middle'
               ELSE 'tail' END AS bucket,
          count(*) AS n_docs,
          CAST(min(mb_per_bigram) AS BIGINT) AS min_mb,
          CAST(max(mb_per_bigram) AS BIGINT) AS max_mb,
          CAST(SUM(mb_per_bigram) AS BIGINT) AS sum_mb
        FROM r GROUP BY 1, 2""")),

    // BM25 keyword retrieval in fixed-point integer arithmetic (k1=1.2,
    // b=0.75 as milli-units, IDF as integer log2 bits): 'dup' is the
    // rare high-idf term, 'spark'/'key' are near-stopwords — the top-k
    // must surface the dup-bearing docs first.
    QuerySpec("q107_bm25_topk",
      (s, dir) => operators.CorpusText.bm25TopK(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "dup", "key"), k = 20),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT doc_id, UNNEST(w) AS term FROM words),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
            (SUM(dl) * 1000) // count(*) AS avgdl_m FROM dl),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN ('spark', 'dup', 'key') GROUP BY 1, 2),
        dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        sc AS (
          SELECT t.doc_id, t.tf,
            ((s.n_docs - d.df + 1) * 1048576) // (d.df + 1) AS r,
            (l.dl * 1000000) // s.avgdl_m AS rel_m
          FROM tf t
          JOIN dft d ON t.term = d.term
          JOIN dl l ON t.doc_id = l.doc_id
          CROSS JOIN stats s),
        scm AS (
          SELECT doc_id, tf, rel_m,
            CAST(length(bin(r)) - 1 AS BIGINT) AS lb,
            CAST(1 AS BIGINT) << (length(bin(r)) - 1) AS pw, r
          FROM sc),
        sci AS (
          SELECT doc_id, tf, rel_m,
            GREATEST(lb * 1000 + ((r - pw) * 1000) // pw - 20000, 0) AS idf_mb
          FROM scm),
        sc2 AS (
          SELECT doc_id,
            idf_mb * ((tf * 2200 * 1000000) //
              (tf * 1000 + (1200 * (1000 - 750 + (750 * rel_m) // 1000)) // 1000)) // 1000 AS score_u
          FROM sci)
        SELECT doc_id, CAST(SUM(score_u) AS BIGINT) AS score_u,
          count(*) AS n_terms
        FROM sc2 GROUP BY 1
        ORDER BY 2 DESC, 1 LIMIT 20""")),

    // REAL image decode, end-to-end (the raster counterpart of q103):
    // each doc synthesizes a complete 24-bit BI_RGB BMP (bottom-up BGR
    // rows, 4-byte padding) from a closed-form pixel generator, the JVM
    // codec decodes it, and per-image channel sums PLUS a position-
    // weighted red sum come off the DECODED pixels — the weighted sum is
    // the stat that breaks if row order (bottom-up) or byte order (BGR)
    // is decoded wrong. The oracle replays the generator directly.
    QuerySpec("q111_bmp_decode",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("w", (col("doc_id") % 5 + 2).cast("int"))
          .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
        // stored row j = logical row h-1-j; pixels BGR; rows padded to 4
        val pixelData = expr("""
          aggregate(
            transform(sequence(0, h - 1), j ->
              concat(
                aggregate(
                  transform(sequence(0, w - 1), x -> concat(
                    unhex(lpad(hex(pmod(doc_id * 3 + x * 7  + (h - 1 - j) * 11, 256)), 2, '0')),
                    unhex(lpad(hex(pmod(doc_id * 5 + x * 13 + (h - 1 - j) * 17, 256)), 2, '0')),
                    unhex(lpad(hex(pmod(doc_id * 7 + x * 19 + (h - 1 - j) * 23, 256)), 2, '0')))),
                  X'', (acc, e) -> concat(acc, e)),
                substring(unhex('00000000'), 1, (4 - (w * 3) % 4) % 4))),
            X'', (acc, e) -> concat(acc, e))""")
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthBmp24(col("w"), col("h"), pixelData)),
          "doc_id", "payload", "image/bmp")
        Multimodal.bmpPixelStats(media).toDF()
      },
      Some("""
        WITH g AS (
          SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 4 + 2 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, x, y,
            (doc_id * 7 + x * 19 + y * 23) % 256 AS r,
            (doc_id * 5 + x * 13 + y * 17) % 256 AS gg,
            (doc_id * 3 + x * 7  + y * 11) % 256 AS b
          FROM g, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        SELECT doc_id,
          CAST(any_value(w) AS INTEGER) AS width,
          CAST(any_value(h) AS INTEGER) AS height,
          CAST(count(*) AS BIGINT) AS n_pixels,
          CAST(SUM(r) AS BIGINT) AS sum_r,
          CAST(SUM(gg) AS BIGINT) AS sum_g,
          CAST(SUM(b) AS BIGINT) AS sum_b,
          CAST(SUM(r * (x + w * y)) AS BIGINT) AS wsum_r
        FROM px GROUP BY 1""")),

    // Image RESIZE — the missing member of the multimodal quartet
    // (decode / feature-extract / RESIZE / frame-sample): same
    // synthesized BMPs as q111, decoded then nearest-neighbor resized
    // to a fixed 4x3 thumbnail; the position-weighted stats run over
    // the RESIZED pixels, and the oracle replays the NN source-index
    // rule (floor(x2*w/w2), floor(y2*h/h2)) against the closed-form
    // generator — no decode needed on the SQL side, which is exactly
    // why the closed-form synthesis pattern exists.
    QuerySpec("q178_bmp_resize",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("w", (col("doc_id") % 5 + 2).cast("int"))
          .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
        val pixelData = expr("""
          aggregate(
            transform(sequence(0, h - 1), j ->
              concat(
                aggregate(
                  transform(sequence(0, w - 1), x -> concat(
                    unhex(lpad(hex(pmod(doc_id * 3 + x * 7  + (h - 1 - j) * 11, 256)), 2, '0')),
                    unhex(lpad(hex(pmod(doc_id * 5 + x * 13 + (h - 1 - j) * 17, 256)), 2, '0')),
                    unhex(lpad(hex(pmod(doc_id * 7 + x * 19 + (h - 1 - j) * 23, 256)), 2, '0')))),
                  X'', (acc, e) -> concat(acc, e)),
                substring(unhex('00000000'), 1, (4 - (w * 3) % 4) % 4))),
            X'', (acc, e) -> concat(acc, e))""")
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthBmp24(col("w"), col("h"), pixelData)),
          "doc_id", "payload", "image/bmp")
        Multimodal.bmpResizedStats(media, w2 = 4, h2 = 3).toDF()
      },
      Some("""
        WITH g AS (
          SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 4 + 2 AS h FROM documents),
        px2 AS (
          SELECT doc_id, w, h, x2, y2,
            (x2 * w) // 4 AS sx, (y2 * h) // 3 AS sy
          FROM g, UNNEST(range(0, 4)) AS tx(x2), UNNEST(range(0, 3)) AS ty(y2)),
        pv AS (
          SELECT doc_id, x2, y2,
            (doc_id * 7 + sx * 19 + sy * 23) % 256 AS r,
            (doc_id * 5 + sx * 13 + sy * 17) % 256 AS gg,
            (doc_id * 3 + sx * 7  + sy * 11) % 256 AS b
          FROM px2)
        SELECT doc_id,
          CAST(4 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
          CAST(count(*) AS BIGINT) AS n_pixels,
          CAST(SUM(r) AS BIGINT) AS sum_r,
          CAST(SUM(gg) AS BIGINT) AS sum_g,
          CAST(SUM(b) AS BIGINT) AS sum_b,
          CAST(SUM(r * (x2 + 4 * y2)) AS BIGINT) AS wsum_r
        FROM pv GROUP BY 1""")),

    // IMAGE PERCEPTUAL NEAR-DUP (dHash) under the oracle — the visual
    // member of the near-dup family next to MinHash/SimHash/embedding
    // text dedup: each doc synthesizes an 18×16 grayscale BMP whose
    // pattern is shared by its GROUP (doc_id div 5 — constant group
    // size, so the near-dup pair count scales LINEARLY with the
    // corpus, the shape a real curation run has) plus a ~3-pixel
    // per-doc perturbation, the decoder + dHash compress it to a 64-bit
    // gradient fingerprint (9×8 box means, exact integer
    // cross-multiplied comparisons), and banded blocking (4×16-bit
    // bands) generates candidate pairs whose full Hamming distance ≤ 3
    // marks near-duplicates — same-group variants cluster, different
    // groups don't (whatever pairs the arithmetic yields, the oracle
    // replays bit-for-bit from the closed-form generator: box sums,
    // bits, band packing, banded self-join, xor popcount).
    QuerySpec("q235_image_dhash_neardup",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("g", expr("doc_id DIV 5"))
          .withColumn("w", lit(18).cast("int"))
          .withColumn("h", lit(16).cast("int"))
        // grayscale: r = g = b = v (so the oracle's gray is 1000·v);
        // stored row j = logical row h-1-j (bottom-up), BGR, padded
        // group-dependent GRADIENT STRUCTURE (coefficients, not just an
        // offset): distinct groups must differ in >6 of the 64 gradient
        // signs or everything cross-pairs
        val vExpr = (xE: String, yE: String) =>
          s"pmod(g * 37 + ($xE) * ($xE) * (pmod(g, 7) + 3) + " +
            s"($yE) * (pmod(g, 11) + 5) + " +
            s"($xE) * ($yE) * (pmod(g, 5) + 1), 200) + " +
            s"(CASE WHEN pmod(doc_id * 31 + ($xE) * 17 + ($yE) * 19, 97) = 0 " +
            "THEN 3 ELSE 0 END)"
        // grayscale ⇒ one v per pixel, REPEATED as the 3 equal BGR hex
        // bytes; rows join as hex strings and decode with ONE unhex —
        // ~6× fewer interpreted-HOF evaluations than per-channel
        // concat chains (the q146 lesson)
        val pixelData = expr(s"""
          unhex(array_join(
            transform(sequence(0, h - 1), j ->
              concat(
                array_join(
                  transform(sequence(0, w - 1), x ->
                    repeat(lpad(hex(${vExpr("x", "h - 1 - j")}), 2, '0'), 3)),
                  ''),
                repeat('00', (4 - (w * 3) % 4) % 4))),
            ''))""")
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthBmp24(col("w"), col("h"), pixelData)),
          "doc_id", "payload", "image/bmp")
        Multimodal.dHashNearDupPairs(Multimodal.bmpDHash(media), maxDist = 3)
      },
      Some("""
        WITH d AS (SELECT doc_id, doc_id // 5 AS g FROM documents),
        px AS (
          SELECT doc_id, x, y,
            (g * 37 + x * x * (g % 7 + 3) + y * (g % 11 + 5)
              + x * y * (g % 5 + 1)) % 200
              + CASE WHEN (doc_id * 31 + x * 17 + y * 19) % 97 = 0
                     THEN 3 ELSE 0 END AS v
          FROM d, UNNEST(range(0, 18)) AS tx(x), UNNEST(range(0, 16)) AS ty(y)),
        box AS (
          SELECT doc_id, x // 2 AS bx, y // 2 AS by, SUM(1000 * v) AS sm
          FROM px GROUP BY 1, 2, 3),
        bits AS (
          SELECT l.doc_id, l.bx AS gx, l.by AS gy,
            CASE WHEN l.sm < r.sm THEN 1 ELSE 0 END AS bit
          FROM box l JOIN box r
            ON l.doc_id = r.doc_id AND l.by = r.by AND r.bx = l.bx + 1
          WHERE l.bx < 8),
        bands AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN gy IN (0, 1) THEN bit << (gx + 8 * (gy % 2)) ELSE 0 END) AS INTEGER) AS b0,
            CAST(SUM(CASE WHEN gy IN (2, 3) THEN bit << (gx + 8 * (gy % 2)) ELSE 0 END) AS INTEGER) AS b1,
            CAST(SUM(CASE WHEN gy IN (4, 5) THEN bit << (gx + 8 * (gy % 2)) ELSE 0 END) AS INTEGER) AS b2,
            CAST(SUM(CASE WHEN gy IN (6, 7) THEN bit << (gx + 8 * (gy % 2)) ELSE 0 END) AS INTEGER) AS b3
          FROM bits GROUP BY 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND
            (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        SELECT c.doc_a, c.doc_b,
          CAST(bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
             + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
             + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
             + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT)) AS INTEGER) AS dist
        FROM cand c
        JOIN bands a ON a.doc_id = c.doc_a
        JOIN bands b ON b.doc_id = c.doc_b
        WHERE bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
            + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
            + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
            + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT)) <= 3""")),

    // AUDIO PERCEPTUAL NEAR-DUP (envelope dHash) — the audio member of
    // the near-dup family, completing text/image/audio: each doc
    // synthesizes a 1040-sample PCM16 WAV (group-shared wrapped
    // quadratic envelope + sparse per-doc amplitude pokes), the REAL
    // RIFF codec decodes it, the 65-frame amplitude envelope compresses
    // to 64 gradient-sign bits (gain-invariant, integer
    // cross-multiplied), and the SAME banded pairing as the image path
    // (the DHash band encoding is modality-agnostic) yields near-dup
    // pairs the oracle replays end to end: frame sums → bits → bands →
    // banded join → xor popcount.
    QuerySpec("q238_audio_envelope_neardup",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("g", expr("doc_id DIV 5"))
          .withColumn("samples", expr("""
            transform(sequence(0, 1039), i -> CAST(
              pmod(g * 31 + i * i * (pmod(g, 5) + 1) + i * (pmod(g, 9) + 2), 20000)
              + (CASE WHEN pmod(doc_id * 37 + i * 13, 257) = 0
                      THEN 500 ELSE 0 END) AS INT))"""))
        val media = Multimodal.asMediaTable(
          docs.withColumn("payload",
            Multimodal.synthWavPcm16(lit(16000), col("samples"))),
          "doc_id", "payload", "audio/wav")
        Multimodal.dHashNearDupPairs(
          Multimodal.wavEnvelopeDHash(media), maxDist = 3)
      },
      Some("""
        WITH d AS (SELECT doc_id, doc_id // 5 AS g FROM documents),
        sm AS (
          SELECT doc_id, i // 16 AS f,
            SUM((g * 31 + i * i * (g % 5 + 1) + i * (g % 9 + 2)) % 20000
              + CASE WHEN (doc_id * 37 + i * 13) % 257 = 0
                     THEN 500 ELSE 0 END) AS sm
          FROM d, UNNEST(range(0, 1040)) AS t(i) GROUP BY 1, 2),
        bits AS (
          SELECT l.doc_id, l.f AS b,
            CASE WHEN l.sm < r.sm THEN 1 ELSE 0 END AS bit
          FROM sm l JOIN sm r ON l.doc_id = r.doc_id AND r.f = l.f + 1
          WHERE l.f < 64),
        bands AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN b < 16 THEN bit << (b % 16) ELSE 0 END) AS INTEGER) AS b0,
            CAST(SUM(CASE WHEN b >= 16 AND b < 32 THEN bit << (b % 16) ELSE 0 END) AS INTEGER) AS b1,
            CAST(SUM(CASE WHEN b >= 32 AND b < 48 THEN bit << (b % 16) ELSE 0 END) AS INTEGER) AS b2,
            CAST(SUM(CASE WHEN b >= 48 THEN bit << (b % 16) ELSE 0 END) AS INTEGER) AS b3
          FROM bits GROUP BY 1),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.doc_id < b.doc_id AND
            (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        SELECT c.doc_a, c.doc_b,
          CAST(bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
             + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
             + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
             + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT)) AS INTEGER) AS dist
        FROM cand c
        JOIN bands a ON a.doc_id = c.doc_a
        JOIN bands b ON b.doc_id = c.doc_b
        WHERE bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
            + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
            + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
            + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT)) <= 3""")),

    // REAL PNG decode, end-to-end (BMP's compressed counterpart): each
    // doc generates closed-form pixels DECLARATIVELY (so the oracle can
    // replay the generator), the JVM encoder writes a complete valid
    // PNG — real zlib, real CRCs, scanline filter type cycling
    // (doc_id + y) % 5 so all five PNG filters appear — and
    // PngCodec.decode (Inflater + the five inverse filters) must
    // recover the exact pixels: the position-weighted red sum breaks on
    // any filter, row-order, or byte-order mistake. PngCodecSpec
    // independently cross-checks the decoder against ImageIO-written
    // PNGs (real encoder, its own filter heuristics).
    QuerySpec("q115_png_decode",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("w", (col("doc_id") % 5 + 2).cast("int"))
          .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
          .withColumn("pixels", expr("""
            transform(sequence(0, w * h - 1), i ->
              cast(pmod(doc_id * 7 + pmod(i, w) * 19 + (i div w) * 23, 256) * 65536
                 + pmod(doc_id * 5 + pmod(i, w) * 13 + (i div w) * 17, 256) * 256
                 + pmod(doc_id * 3 + pmod(i, w) * 7  + (i div w) * 11, 256) as int))"""))
        Multimodal.pngPixelStats(Multimodal.synthPngMedia(docs)).toDF()
      },
      Some("""
        WITH g AS (
          SELECT doc_id, doc_id % 5 + 2 AS w, doc_id % 4 + 2 AS h FROM documents),
        px AS (
          SELECT doc_id, w, h, x, y,
            (doc_id * 7 + x * 19 + y * 23) % 256 AS r,
            (doc_id * 5 + x * 13 + y * 17) % 256 AS gg,
            (doc_id * 3 + x * 7  + y * 11) % 256 AS b
          FROM g, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
        SELECT doc_id,
          CAST(any_value(w) AS INTEGER) AS width,
          CAST(any_value(h) AS INTEGER) AS height,
          CAST(count(*) AS BIGINT) AS n_pixels,
          CAST(SUM(r) AS BIGINT) AS sum_r,
          CAST(SUM(gg) AS BIGINT) AS sum_g,
          CAST(SUM(b) AS BIGINT) AS sum_b,
          CAST(SUM(r * (x + w * y)) AS BIGINT) AS wsum_r
        FROM px GROUP BY 1""")),

    // REAL video-container metadata decode — the video member of the
    // multimodal family (audio decodes samples, images decode pixels;
    // video's honest decode surface is the ISO-BMFF container): each doc
    // synthesizes a complete valid MP4 (ftyp + free + moov/mvhd +
    // trak/tkhd per track + largesize mdat) with header VERSIONS varying
    // by row — mvhd v1 on every 3rd doc, tkhd v1 on alternating tracks —
    // and the box walker must recover brand, timescale, duration and
    // per-track 16.16 dimensions from all four layouts. The oracle
    // replays the closed-form generator; duration_ms is integer-exact.
    QuerySpec("q129_mp4_meta",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 2 === 0, "isom").otherwise("mp42").as("brand"),
          (lit(600L) + (col("doc_id") % 5) * 400).as("timescale"),
          (lit(1000L) + (col("doc_id") * 37) % 100000).as("duration"),
          (col("doc_id") % 3 === 0).as("mvhd_v1"),
          expr("transform(sequence(0, cast(doc_id % 3 as int)), t -> " +
            "cast(16 * (4 + pmod(doc_id + 7 * t, 100)) as int))").as("tk_w"),
          expr("transform(sequence(0, cast(doc_id % 3 as int)), t -> " +
            "cast(9 * (4 + pmod(doc_id + 11 * t, 100)) as int))").as("tk_h"))
        Multimodal.mp4TrackMeta(Multimodal.synthMp4Media(docs)).toDF()
      },
      Some("""
        WITH g AS (
          SELECT doc_id,
            CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
            600 + (doc_id % 5) * 400 AS timescale,
            1000 + (doc_id * 37) % 100000 AS duration
          FROM documents)
        SELECT doc_id, brand, CAST(timescale AS BIGINT) AS timescale,
          CAST(duration AS BIGINT) AS duration_ticks,
          CAST(duration * 1000 // timescale AS BIGINT) AS duration_ms,
          CAST(t + 1 AS BIGINT) AS track_id,
          CAST(16 * (4 + (doc_id + 7 * t) % 100) AS INTEGER) AS width,
          CAST(9 * (4 + (doc_id + 11 * t) % 100) AS INTEGER) AS height
        FROM g, UNNEST(range(0, doc_id % 3 + 1)) AS u(t)""")),

    // REAL JPEG frame-header decode — the marker-walk metadata surface
    // (the entropy-coded scan needs a Huffman/DCT stack; dimensions,
    // component count and baseline-vs-progressive live in the marker
    // stream): each doc synthesizes a structurally valid JFIF stream
    // (SOI/APP0/DQT/SOF/SOS/EOI) with baseline vs progressive SOF and
    // 1- vs 3-component frames varying by row; the walker recovers all
    // of it. The oracle replays the closed-form generator. The decoder
    // is additionally cross-checked against ImageIO-written REAL JPEGs
    // in JpegMetaSpec (independent encoder, real Huffman tables).
    QuerySpec("q152_jpeg_meta",
      (s, dir) => {
        import graft.multimodal.Multimodal
        val docs = Tables.documents(s, dir).select(col("doc_id"),
          expr("CAST(16 * (1 + doc_id % 200) AS INT)").as("w"),
          expr("CAST(9 * (1 + doc_id % 150) AS INT)").as("h"),
          expr("CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INT)").as("ncomp"),
          (col("doc_id") % 3 === 0).as("progressive"))
        Multimodal.jpegMeta(Multimodal.synthJpegMedia(docs)).toDF()
      },
      Some("""
        SELECT doc_id,
          CAST(16 * (1 + doc_id % 200) AS INTEGER) AS width,
          CAST(9 * (1 + doc_id % 150) AS INTEGER) AS height,
          CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS n_components,
          doc_id % 3 = 0 AS progressive,
          CAST(16 * (1 + doc_id % 200) AS BIGINT) * (9 * (1 + doc_id % 150)) AS n_pixels
        FROM documents""")),

    // BPE tokenizer TRAINING (the learn side of q84/q85's apply side):
    // 8 byte-pair merges learned from corpus word frequencies, leftmost-
    // non-overlapping merge semantics, (count desc, pair) tie order. The
    // oracle replays all 8 rounds as generated chained CTEs with the
    // same window formulation — the iterative trainer itself is under
    // the hash gate, not just one step.
    QuerySpec("q108_bpe_train",
      (s, dir) => operators.Bpe.trainBpe(
        Tables.documents(s, dir), "doc_id", "text", merges = 8),
      Some(s"WITH $WORDS_SQL, ${operators.Bpe.oracleSql(8)}")),

    // BATCHED BPE training — the production 30k-merge path: top-F pairs
    // per round, anti-join admission (no conflict with any higher-
    // ranked candidate's symbols or concat), ONE multi-pair rewrite per
    // round. The oracle replays all rounds — ranking, admission rule,
    // and rewrite — as generated chained CTEs; BpeSpec proves F=1
    // degenerates to the sequential trainer exactly.
    QuerySpec("q116_bpe_batch",
      (s, dir) => operators.Bpe.trainBpeBatched(
        Tables.documents(s, dir), "doc_id", "text", rounds = 3, f = 4),
      Some(s"WITH $WORDS_SQL, ${operators.Bpe.oracleBatchSql(3, 4)}")),

    // BPE ENCODE — the tokenizer APPLY side: merges learned on this
    // corpus (8 rounds), every word's post-merge symbol sequence cached
    // at VOCABULARY scale, one join back to the corpus token stream.
    // The oracle replays training AND the apply join; the per-doc
    // toks_md5 digests the exact segmentation, so a wrong merge, a
    // mis-ordered word, or a boundary slip all break the hash.
    QuerySpec("q122_bpe_encode",
      (s, dir) => operators.Bpe.encodeBpe(
        Tables.documents(s, dir), "doc_id", "text", merges = 8),
      Some(s"WITH $WORDS_SQL, ${operators.Bpe.oracleEncodeSql(8)}")),

    // UNIGRAM-LM tokenizer (SentencePiece family) — BPE's counterpart:
    // per word, the MINIMUM-total-cost piece segmentation (Viterbi over
    // the position DAG) under milli-bit unigram piece costs; vocab =
    // all chars ∪ top-300 substrings (≤4 chars) by weighted count.
    // State packs (cost, n_pieces) into one integer so min() IS the
    // deterministic tie-break. The oracle replays candidate counting,
    // vocab selection, costs, and ALL 16 DP rounds as chained
    // MATERIALIZED CTEs — the dynamic program itself is under the hash
    // gate. Words >16 chars are excluded by documented cap (both sides).
    QuerySpec("q132_unigram_segment",
      (s, dir) => operators.Unigram.unigramSegment(
        Tables.documents(s, dir), "doc_id", "text",
        vExtra = 300, maxPieceLen = 4, maxWordLen = 16),
      Some(s"WITH $WORDS_SQL, ${operators.Unigram.oracleSql(300, 4, 16)}")),

    // ONE HARD-EM TRAINING ROUND of the unigram tokenizer — the
    // SentencePiece trainer loop body: Viterbi E-step (path recovered by
    // min-j predecessor reconstruction from the best table alone),
    // usage-count M-step with add-one re-cost over the same vocabulary,
    // then re-segmentation under the new costs. The oracle replays the
    // ENTIRE loop — both DP chains, the ≤16 walk rounds, and the
    // re-estimation — as one generated CTE program (~60 materialized
    // CTEs), so the training iteration itself is under the hash gate.
    QuerySpec("q139_unigram_em",
      (s, dir) => operators.Unigram.unigramEmRound(
        Tables.documents(s, dir), "doc_id", "text",
        vExtra = 300, maxPieceLen = 4, maxWordLen = 16),
      Some(s"WITH $WORDS_SQL, ${operators.Unigram.oracleEmSql(300, 4, 16)}")),

    // Capstone v2 — the ROUND-4 operator chain composed end to end:
    // segment dedup (boilerplate stripping) → length floor → bigram-LM
    // surprisal filter (≤ 6.5 bits/bigram, integer-exact compare) →
    // LEAKAGE-SAFE train split (near-dup clusters over the CLEANED
    // corpus draw one ticket) → fixed-length sequence packing. The
    // oracle replays the whole chain — the minhash/CC fragment runs over
    // a `words` CTE built from the kept tokens, proving the fragments
    // compose over derived corpora, not just the raw table.
    QuerySpec("q114_curation_v2",
      (s, dir) => {
        val segs = operators.CorpusText.cleanSegments(
          Tables.documents(s, dir), "doc_id", "text", " ", maxDf = 390)
        val cleaned = segs.filter(size(col("segs")) >= 30)
          .select(col("id").as("doc_id"), array_join(col("segs"), " ").as("text"))
        val surp = operators.CorpusText.bigramSurprisal(cleaned, "doc_id", "text")
        val good = cleaned.join(
          surp.filter(col("surprise_bits") * 10 <= col("n_bigrams") * 65)
            .select("doc_id"), Seq("doc_id"), "left_semi")
        val pairs = Dedup.minhashLshPairs(good, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        val train = Sampling.splitByCluster(good, "doc_id", pairs,
            "doc_a", "doc_b", Seq("train" -> "e6", "val" -> "f3"), "test")
          .filter(col("split") === "train").select("doc_id", "text")
        Tokenize.packSequences(train, "doc_id", "text", ctx = 128)
      },
      Some(s"""
        WITH RECURSIVE $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        ktok AS (
          SELECT t.doc_id, t.pos, t.term
          FROM tok t JOIN dft d ON t.term = d.term WHERE d.df <= 390),
        cw AS (SELECT doc_id, list(term ORDER BY pos) AS w FROM ktok GROUP BY 1),
        lw AS (SELECT * FROM cw WHERE len(w) >= 30),
        ltok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM lw, UNNEST(range(0, len(w))) AS t(i)),
        uni AS (SELECT term AS w1, count(*) AS c1 FROM ltok GROUP BY 1),
        voc AS (SELECT count(*) AS v FROM uni),
        big AS (
          SELECT doc_id, term AS w1,
            lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM ltok QUALIFY w2 IS NOT NULL),
        pair AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        docsur AS (
          SELECT b.doc_id, count(*) AS nb,
            SUM((length(bin(u.c1 + v.v)) - 1) - (length(bin(p.c12 + 1)) - 1)) AS sb
          FROM big b
          JOIN pair p ON b.w1 = p.w1 AND b.w2 = p.w2
          JOIN uni u ON b.w1 = u.w1
          CROSS JOIN voc v
          GROUP BY 1),
        goodids AS (SELECT doc_id FROM docsur WHERE sb * 10 <= nb * 65),
        -- REDEFINE the corpus the shared minhash/CC fragment consumes:
        -- the cleaned, filtered token arrays (fragments read doc_id + w)
        cwords AS (
          SELECT l.doc_id, l.w FROM lw l JOIN goodids g ON l.doc_id = g.doc_id),
        ${ExtQueries.CC_FROM_WORDS_SQL.replace("FROM words", "FROM cwords")},
        train AS (
          SELECT c.doc_id AS did, CAST(len(c.w) AS BIGINT) AS n
          FROM cwords c LEFT JOIN lbl l ON c.doc_id = l.doc_id
          WHERE md5(CAST(COALESCE(l.cluster_id, c.doc_id) AS VARCHAR)) < 'e6'),
        sp AS (
          SELECT did, n,
            CAST(COALESCE(SUM(n) OVER (ORDER BY did
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
          FROM train),
        b AS (
          SELECT did, n, start, seq_id
          FROM sp, UNNEST(range(start // 128, (start + n - 1) // 128 + 1)) AS t(seq_id))
        SELECT CAST(seq_id AS BIGINT) AS seq_id,
          CAST(SUM(LEAST(start + n, (seq_id + 1) * 128) - GREATEST(start, seq_id * 128)) AS BIGINT) AS n_tokens,
          count(*) AS n_docs,
          min(did) AS first_doc, max(did) AS last_doc
        FROM b GROUP BY 1""")),

    // Capstone: the END-TO-END corpus curation pipeline as one composed
    // dataflow — quality filter (q37's criteria) → exact-dedup keepers
    // (q30) → deterministic train split (q69) → fixed-length sequence
    // packing (q86) — raw crawl in, training-shard manifest out. Every
    // stage is the already-verified operator; the oracle replays the
    // whole chain in SQL, so composition (not just the parts) is
    // hash-checked.
    QuerySpec("q98_curation_pipeline",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val good = docs
          .withColumn("__w", TextFns.tokens(col("text")))
          .filter(size(col("__w")) >= 40 &&
            size(array_distinct(col("__w"))).cast("double") / size(col("__w")) >= 0.3)
          .drop("__w")
        val keepers = Dedup.fingerprintClusters(good, "doc_id", "text")
          .select(col("keeper_id").as("doc_id"))
        val kept = good.join(keepers, Seq("doc_id"), "left_semi")
        val train = Sampling.splitByHash(kept, "doc_id",
            Seq("train" -> "e6", "val" -> "f3"), "test")
          .filter(col("split") === "train").drop("split")
        Tokenize.packSequences(train, "doc_id", "text", ctx = 128)
      },
      Some(s"""
        WITH $WORDS_SQL,
        good AS (
          SELECT doc_id, text, w FROM words
          WHERE len(w) >= 40 AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.3),
        fp AS (
          SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f,
            min(doc_id) AS keeper
          FROM good GROUP BY 1),
        kept AS (SELECT g.doc_id, g.w FROM good g JOIN fp ON g.doc_id = fp.keeper),
        train AS (
          SELECT doc_id, w FROM kept
          WHERE md5(CAST(doc_id AS VARCHAR)) < 'e6'),
        lens AS (SELECT doc_id AS did, CAST(len(w) AS BIGINT) AS n
                 FROM train WHERE len(w) > 0),
        sp AS (
          SELECT did, n,
            CAST(COALESCE(SUM(n) OVER (ORDER BY did
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
          FROM lens),
        b AS (
          SELECT did, n, start, seq_id
          FROM sp, UNNEST(range(start // 128, (start + n - 1) // 128 + 1)) AS t(seq_id))
        SELECT CAST(seq_id AS BIGINT) AS seq_id,
          CAST(SUM(LEAST(start + n, (seq_id + 1) * 128) - GREATEST(start, seq_id * 128)) AS BIGINT) AS n_tokens,
          count(*) AS n_docs,
          min(did) AS first_doc, max(did) AS last_doc
        FROM b GROUP BY 1""")),

    // Deterministic weighted sample: 50 documents drawn without
    // replacement proportional to length (weight = n_chars/100 + 1,
    // min-of-w-draws priorities — reproducible and engine-portable).
    QuerySpec("q101_weighted_sample",
      (s, dir) => Sampling.weightedSample(
        Tables.documents(s, dir)
          .select(col("doc_id"), (col("n_chars") / lit(100) + 1).cast("long").as("w")),
        "doc_id", "w", k = 50, wCap = 64),
      Some("""
        WITH d AS (
          SELECT doc_id, CAST(n_chars // 100 + 1 AS BIGINT) AS weight
          FROM documents WHERE n_chars // 100 + 1 >= 1),
        draws AS (
          SELECT doc_id, weight,
            md5(CAST(j AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
          FROM d, UNNEST(range(0, least(weight, 64))) AS t(j)),
        pri AS (
          SELECT doc_id, weight, min(h) AS priority
          FROM draws GROUP BY 1, 2)
        SELECT doc_id, weight, priority FROM pri
        ORDER BY priority, doc_id LIMIT 50""")),

    // SHARD MANIFEST — the last-mile artifact of a corpus release: docs
    // assigned to 8 shards by a deterministic md5 draw (expected-
    // balanced, no global sort), each shard summarized by count, char
    // volume, and an XOR-of-row-hashes content digest (commutative →
    // map-side combine; flips if any doc's membership, id, or text
    // changes anywhere in the corpus).
    QuerySpec("q193_shard_manifest",
      (s, dir) => operators.Layout.shardManifest(
        Tables.documents(s, dir), "doc_id", "text", k = 8),
      Some("""
        SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
          CAST(bit_xor(h) AS BIGINT) AS xor_digest
        FROM (
          SELECT CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS shard,
            text,
            CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)), 1, 15)) AS BIGINT) AS h
          FROM documents) x
        GROUP BY 1"""))
  )
}
