package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Chunking, Classifier, ContentFilter, Curriculum, CorpusText, Dedup, Graph, Pii, SimilaritySearch, Staging}

/** Round-5 batch 3: the content-gate + corpus-ordering surface — the
  * Gopher/MassiveText quality-rule battery, intra-document repetition
  * rules, weighted blocklist filtering, stride-scheduled curriculum
  * interleaving, k-core extraction on the dedup graph, and hybrid
  * (BM25 × ANN) retrieval fused by reciprocal rank. Every query
  * carries a full DuckDB oracle; all rule arithmetic is integer
  * cross-multiplication so verdicts hash-match across engines.
  */
object FilterQueries {

  import ExtQueries.{MINHASH_PAIRS_SQL, WORDS_SQL}

  /** Both engines synthesize the same multi-line "page" per document
    * (8-word lines; deterministic bullet / ellipsis / hash decoration
    * keyed on doc_id + line index — the q125 declarative-synthesis
    * pattern), so the line-based Gopher rules run against real
    * multi-line text that each engine can reproduce bit-for-bit.
    */
  private val PAGE_SQL = s"""$WORDS_SQL,
    pg AS (
      SELECT doc_id,
        array_to_string(list_transform(range(0, (len(w)+7)//8), i ->
          (CASE WHEN (doc_id + i) % 3 = 0 THEN '- ' ELSE '' END) ||
          array_to_string(w[i*8+1:i*8+8], ' ') ||
          (CASE WHEN (doc_id + i) % 5 = 0 THEN ' ...' ELSE '' END) ||
          (CASE WHEN (doc_id + i) % 7 = 0 THEN ' #' ELSE '' END)),
        chr(10)) AS page
      FROM words)"""

  private def synthPage(docs: org.apache.spark.sql.DataFrame) =
    docs.withColumn("w", TextFns.tokens(col("text")))
      // zero-token guard: sequence(0, -1) is DESCENDING in Spark
      // ([0,-1]) while the oracle's range(0, 0) is empty — an
      // empty/whitespace-only doc must synthesize an empty page
      .withColumn("page", when(size(col("w")) === 0, lit("")).otherwise(array_join(
        transform(sequence(lit(0), expr("((size(w) + 7) div 8) - 1")),
          i => concat(
            when((col("doc_id") + i) % 3 === 0, lit("- ")).otherwise(lit("")),
            array_join(slice(col("w"), i * lit(8) + 1, lit(8)), " "),
            when((col("doc_id") + i) % 5 === 0, lit(" ...")).otherwise(lit("")),
            when((col("doc_id") + i) % 7 === 0, lit(" #")).otherwise(lit("")))),
        "\n")))

  /** DuckDB replay of [[Pii.scrub]]: consumes `src(doc_id, textCol)`,
    * emits CTEs t1..t4 where t4 carries n_email/n_card/n_ip/n_phone and
    * `t` = the fully redacted text. Generated from [[Pii.STEPS]] so the
    * oracle and the engine share the literal patterns and order.
    */
  private def piiChainSql(src: String, textCol: String): String =
    Pii.STEPS.zipWithIndex.map { case ((re, tok, cnt), i) =>
      val prev = if (i == 0) src else s"t$i"
      val tcol = if (i == 0) textCol else "t"
      val carried = Pii.STEPS.take(i).map(_._3) match {
        case Nil => ""; case cs => cs.mkString("", ", ", ",")
      }
      s"""
        t${i + 1} AS (
          SELECT doc_id, $carried
            CAST(len(regexp_extract_all($tcol, '$re')) AS INTEGER) AS $cnt,
            regexp_replace($tcol, '$re', '$tok', 'g') AS t
          FROM $prev)"""
    }.mkString(",")

  private val BLOCKLIST: Seq[(String, Long)] =
    Seq("slow" -> 1L, "dup" -> 2L, "slow merge" -> 4L, "customer data" -> 8L)
  private val BLOCK_THRESHOLD = 6L

  /** Gopher-battery CTE chain (consumes `pg(doc_id, page)`), ending in
    * `gq` — the q140 result shape. Shared with the q146 capstone.
    */
  private val GOPHER_SQL = """gst AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(page)), '\s+'), x -> len(x) > 0) AS pw,
        CAST(length(page) - length(replace(page, chr(10), '')) + 1 AS BIGINT) AS n_lines,
        CAST(length(regexp_replace(page, '\s', '', 'g')) AS BIGINT) AS n_wordchars,
        CAST((length(page) - length(replace(page, '#', '')))
          + ((length(page) - length(replace(page, '...', ''))) // 3) AS BIGINT) AS n_symbols,
        CAST(len(regexp_extract_all(page, '(?m)^- ')) AS BIGINT) AS n_bullet,
        CAST(len(regexp_extract_all(page, '(?m)\.\.\.$')) AS BIGINT) AS n_ellipsis_lines,
        CAST(len(regexp_extract_all(lower(page), '\S*[a-z]\S*')) AS BIGINT) AS n_alpha_words
      FROM pg),
    gst2 AS (
      SELECT doc_id, CAST(len(pw) AS BIGINT) AS n_words, n_lines, n_wordchars,
        n_symbols, n_bullet, n_ellipsis_lines, n_alpha_words,
        CAST(len(list_filter(['the','a','and','to','of','with','that','be'],
          x -> list_contains(pw, x))) AS BIGINT) AS n_stop_found
      FROM gst),
    gq AS (
      SELECT doc_id, n_words, n_lines, n_wordchars, n_symbols, n_bullet,
        n_ellipsis_lines, n_alpha_words, n_stop_found, n_rules_failed,
        n_rules_failed = 0 AS keep
      FROM (
        SELECT *,
          CAST((CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 0 ELSE 1 END)
          + (CASE WHEN 3*n_words <= n_wordchars AND n_wordchars <= 10*n_words THEN 0 ELSE 1 END)
          + (CASE WHEN 1000*n_symbols < 100*n_words THEN 0 ELSE 1 END)
          + (CASE WHEN 1000*n_bullet < 900*n_lines THEN 0 ELSE 1 END)
          + (CASE WHEN 1000*n_ellipsis_lines < 300*n_lines THEN 0 ELSE 1 END)
          + (CASE WHEN 1000*n_alpha_words > 800*n_words THEN 0 ELSE 1 END)
          + (CASE WHEN n_stop_found >= 2 THEN 0 ELSE 1 END) AS BIGINT) AS n_rules_failed
        FROM gst2) x)"""

  /** Repetition-rule CTE chain (consumes `words(doc_id, w)`), ending in
    * `rq` — the q141 result shape. Shared with the q146 capstone.
    */
  private val REP_SQL = {
    val wide = (2 to 4).map(n => s"max(CASE WHEN n = $n THEN top_u END) AS t$n") ++
      (5 to 10).map(n => s"max(CASE WHEN n = $n THEN dup_u END) AS d$n")
    val milli = (2 to 4).map(n => s"(1000 * COALESCE(t$n, 0)) // total AS top${n}_mb") ++
      (5 to 10).map(n => s"(1000 * COALESCE(d$n, 0)) // total AS dup${n}_mb")
    val thr = Map(2 -> 200, 3 -> 180, 4 -> 160, 5 -> 150, 6 -> 140, 7 -> 130,
      8 -> 120, 9 -> 110, 10 -> 100)
    val keep = ((2 to 4).map(n => s"top${n}_mb < ${thr(n)}") ++
      (5 to 10).map(n => s"dup${n}_mb < ${thr(n)}")).mkString(" AND ")
    s"""rbase AS (
      SELECT doc_id, w, CAST(length(array_to_string(w, ' ')) AS BIGINT) AS total
      FROM words WHERE length(array_to_string(w, ' ')) > 0),
    rgrams AS (
      SELECT doc_id, total, n, array_to_string(w[i+1:i+n], ' ') AS g
      FROM rbase,
        UNNEST(range(2, 11)) AS tn(n),
        UNNEST(range(0, greatest(len(w) - n + 1, 0))) AS ti(i)),
    rgc AS (
      SELECT doc_id, total, n, g, CAST(count(*) AS BIGINT) AS cnt
      FROM rgrams GROUP BY 1, 2, 3, 4),
    rpn AS (
      SELECT doc_id, total, n,
        max(cnt * length(g)) AS top_u,
        CAST(sum(CASE WHEN cnt >= 2 THEN cnt * length(g) END) AS BIGINT) AS dup_u
      FROM rgc GROUP BY 1, 2, 3),
    rwide AS (
      SELECT doc_id, total, ${wide.mkString(", ")}
      FROM rpn GROUP BY 1, 2),
    rq AS (
      SELECT *, $keep AS keep FROM (
        SELECT doc_id, ${milli.mkString(", ")} FROM rwide) m)"""
  }

  /** Blocklist CTE chain (consumes `words(doc_id, w)`), ending in `bq`
    * — the q142 result shape. Shared with the q146 capstone.
    */
  private val BLOCK_SQL = {
    val cnts = BLOCKLIST.zipWithIndex.map { case ((p, _), i) =>
      val pat = " " + p.trim.toLowerCase.split("\\s+").mkString("  ") + " "
      s"CAST((length(t) - length(replace(t, '$pat', ''))) // ${pat.length} AS BIGINT) AS c$i"
    }
    val hits = BLOCKLIST.indices.map(i => s"c$i").mkString(" + ")
    val score = BLOCKLIST.zipWithIndex.map { case ((_, w), i) => s"c$i * $w" }.mkString(" + ")
    s"""bt AS (SELECT doc_id, ' ' || array_to_string(w, '  ') || ' ' AS t FROM words),
    bc AS (SELECT doc_id, ${cnts.mkString(", ")} FROM bt),
    bq AS (
      SELECT doc_id, $hits AS n_hits, $score AS score,
        ($score) >= $BLOCK_THRESHOLD AS blocked
      FROM bc)"""
  }

  val all: Seq[QuerySpec] = Seq(

    // The Gopher quality-rule battery (word count, mean word length,
    // symbol ratio, bullet/ellipsis line fractions, alphabetic-word
    // fraction, required stopwords) over synthesized multi-line pages.
    QuerySpec("q140_gopher_rules",
      (s, dir) => ContentFilter.gopherStats(
          synthPage(Tables.documents(s, dir)), "doc_id", "page")
        .withColumnRenamed("id", "doc_id"),
      Some(s"""
        WITH $PAGE_SQL,
        $GOPHER_SQL
        SELECT * FROM gq""")),

    // Gopher intra-document repetition rules: top-coverage n-gram char
    // share (n=2..4) + duplicated n-gram char share (n=5..10), exact
    // milli-fractions, paper thresholds.
    QuerySpec("q141_repetition_rules",
      (s, dir) => ContentFilter.repetitionStats(
          Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id"),
      Some(s"""
        WITH $WORDS_SQL,
        $REP_SQL
        SELECT * FROM rq""")),

    // Weighted blocklist filter: exact word/phrase occurrence counts at
    // token granularity (double-space padding makes adjacent matches
    // non-overlapping), weighted score, threshold verdict.
    QuerySpec("q142_blocklist",
      (s, dir) => ContentFilter.blocklistScore(
          Tables.documents(s, dir), "doc_id", "text", BLOCKLIST, BLOCK_THRESHOLD)
        .withColumnRenamed("id", "doc_id"),
      Some(s"""
        WITH $WORDS_SQL,
        $BLOCK_SQL
        SELECT * FROM bq""")),

    // Stride-scheduled curriculum interleave: per-source hash-shuffled
    // ranks, virtual time r*10^6 div w, global position via the
    // two-phase bucket prefix sum — the oracle checks it EQUALS the
    // naive global row_number over (v, source, rank).
    QuerySpec("q143_interleave",
      (s, dir) => Curriculum.interleaveStride(
        Tables.documents(s, dir), "doc_id", "source",
        expr("CAST(substring(source, 4) AS BIGINT) % 4 + 1"))
        .withColumnRenamed("id", "doc_id"),
      Some("""
        WITH r AS (
          SELECT doc_id, source,
            CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank
          FROM documents),
        v AS (
          SELECT doc_id, source, src_rank, (src_rank * 1000000) // w AS v FROM r)
        SELECT doc_id, source, src_rank, v,
          CAST(row_number() OVER (ORDER BY v, source, src_rank) AS BIGINT) AS pos
        FROM v""")),

    // k-core of the near-dup graph (minhash-LSH pairs at jaccard>=0.2):
    // 5 fixed peeling rounds (idempotent past the fixpoint) replayed as
    // a static chain of materialized CTEs.
    QuerySpec("q144_kcore",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        Graph.kCore(pairs, "doc_a", "doc_b", k = 2, rounds = 5)
          .select(col("id").as("doc_id"), col("core_deg"))
      },
      Some {
        val rounds = (1 to 5).map { r =>
          s"""d$r AS MATERIALIZED (
            SELECT e.u, CAST(count(*) AS BIGINT) AS c FROM und e
            JOIN a${r - 1} x ON e.u = x.u JOIN a${r - 1} y ON e.v = y.u
            GROUP BY 1),
          a$r AS MATERIALIZED (SELECT u FROM d$r WHERE c >= 2)"""
        }.mkString(",\n")
        s"""
        WITH $MINHASH_PAIRS_SQL,
        ce AS (
          SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM mh_pairs WHERE jaccard >= 0.2 AND doc_a <> doc_b),
        und AS (SELECT a AS u, b AS v FROM ce UNION ALL SELECT b AS u, a AS v FROM ce),
        a0 AS MATERIALIZED (SELECT DISTINCT u FROM und),
        $rounds
        SELECT u AS doc_id, c AS core_deg FROM d5 WHERE c >= 2"""
      }),

    // Hybrid retrieval: BM25 top-20 (lexical) × exact-cosine top-20
    // (semantic, query = embedding 7) fused by reciprocal rank
    // (k0=60, integer micro-units), top-10 out.
    QuerySpec("q145_hybrid_rrf",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val e = Tables.embeddings(s, dir)
        // both retriever outputs are already k-bounded (20 rows); the
        // unpartitioned rank window below therefore sorts 20 rows, not
        // the corpus
        val lex = CorpusText.bm25TopK(docs, "doc_id", "text",
            Seq("spark", "slow", "vector"), k = 20)
          .select(col("doc_id"),
            row_number().over(Window.orderBy(col("score_u").desc, col("doc_id"))).as("rank"))
        val sem = SimilaritySearch.bruteForceTopK(
            e.filter(col("vec_id") === 7), e, "vec_id", "embedding", k = 20)
          .select(col("nid").as("doc_id"), col("rank"))
        SimilaritySearch.rrfFuse(lex, sem, "doc_id", k0 = 60, topK = 10)
          .select(col("id"), coalesce(col("rank_a"), lit(0L)).as("rank_a"),
            coalesce(col("rank_b"), lit(0L)).as("rank_b"), col("rrf_u"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT doc_id, UNNEST(w) AS term FROM words),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
            (SUM(dl) * 1000) // count(*) AS avgdl_m FROM dl),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN ('spark', 'slow', 'vector') GROUP BY 1, 2),
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
          FROM sci),
        lexs AS (
          SELECT doc_id, CAST(SUM(score_u) AS BIGINT) AS score_u
          FROM sc2 GROUP BY 1),
        lex AS (
          SELECT doc_id, rank_a FROM (
            SELECT doc_id,
              CAST(row_number() OVER (ORDER BY score_u DESC, doc_id) AS BIGINT) AS rank_a
            FROM lexs) x WHERE rank_a <= 20),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        qpairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM embeddings q, embeddings e
          WHERE q.vec_id = 7 AND e.vec_id <> q.vec_id),
        el AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM qpairs),
        dots AS (
          SELECT qid, nid,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id),
        sem AS (
          SELECT nid AS doc_id, rank_b FROM (
            SELECT nid, CAST(row_number() OVER (ORDER BY sim DESC, nid) AS BIGINT) AS rank_b
            FROM sims) x WHERE rank_b <= 20)
        SELECT COALESCE(a.doc_id, b.doc_id) AS id,
          COALESCE(a.rank_a, 0) AS rank_a, COALESCE(b.rank_b, 0) AS rank_b,
          CAST(COALESCE(1000000 // (60 + a.rank_a), 0)
            + COALESCE(1000000 // (60 + b.rank_b), 0) AS BIGINT) AS rrf_u
        FROM lex a FULL OUTER JOIN sem b ON a.doc_id = b.doc_id
        ORDER BY rrf_u DESC, id LIMIT 10""")),

    // THREE-RETRIEVER fusion — the full retrieval ladder composed:
    // BM25 top-20 (lexical) × exact-cosine top-20 (dense) × MaxSim
    // late-interaction re-rank of the cosine shortlist (q206's tier),
    // fused by N-list reciprocal rank with the agreement count. One
    // wrong rank in ANY retriever breaks the fused hash.
    QuerySpec("q211_hybrid_rrf3",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val e = Tables.embeddings(s, dir)
        val q7 = e.filter(col("vec_id") === 7)
        val lex = CorpusText.bm25TopK(docs, "doc_id", "text",
            Seq("spark", "slow", "vector"), k = 20)
          .select(col("doc_id"),
            row_number().over(Window.orderBy(col("score_u").desc, col("doc_id"))).as("rank"))
        val sem = SimilaritySearch.bruteForceTopK(
            q7, e, "vec_id", "embedding", k = 20)
        val maxsim = SimilaritySearch.lateInteractionRerank(
            q7, e, sem.select("qid", "nid"), "vec_id", "embedding",
            m = 8, subDim = 8, k = 20)
          .select(col("nid").as("doc_id"), col("rank"))
        SimilaritySearch.rrfFuseN(
          Seq(lex, sem.select(col("nid").as("doc_id"), col("rank")), maxsim),
          "doc_id", k0 = 60, topK = 10)
      },
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT doc_id, UNNEST(w) AS term FROM words),
        dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
        stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
            (SUM(dl) * 1000) // count(*) AS avgdl_m FROM dl),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok WHERE term IN ('spark', 'slow', 'vector') GROUP BY 1, 2),
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
          FROM sci),
        lexs AS (
          SELECT doc_id, CAST(SUM(score_u) AS BIGINT) AS score_u
          FROM sc2 GROUP BY 1),
        lex AS (
          SELECT doc_id, rank FROM (
            SELECT doc_id,
              CAST(row_number() OVER (ORDER BY score_u DESC, doc_id) AS BIGINT) AS rank
            FROM lexs) x WHERE rank <= 20),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        qpairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM embeddings q, embeddings e
          WHERE q.vec_id = 7 AND e.vec_id <> q.vec_id),
        el AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM qpairs),
        dots AS (
          SELECT qid, nid,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id),
        sem AS (
          SELECT nid AS doc_id, rank FROM (
            SELECT nid, CAST(row_number() OVER (ORDER BY sim DESC, nid) AS BIGINT) AS rank
            FROM sims) x WHERE rank <= 20),
        sd AS (
          SELECT s.doc_id AS nid, qi, dj,
            CAST(SUM(CAST(floor(
              CAST(q.embedding[CAST(qi * 8 + t + 1 AS INTEGER)] AS DOUBLE)
              * CAST(d.embedding[CAST(dj * 8 + t + 1 AS INTEGER)] AS DOUBLE)
              * 1000000000.0) AS BIGINT)) AS BIGINT) AS sdot
          FROM sem s
          JOIN embeddings q ON q.vec_id = 7
          JOIN embeddings d ON d.vec_id = s.doc_id,
            UNNEST(range(0, 8)) AS a(qi), UNNEST(range(0, 8)) AS b(dj),
            UNNEST(range(0, 8)) AS c(t)
          GROUP BY 1, 2, 3),
        mx AS (SELECT nid, qi, max(sdot) AS mx FROM sd GROUP BY 1, 2),
        lisc AS (SELECT nid, CAST(SUM(mx) AS BIGINT) AS li_score FROM mx GROUP BY 1),
        li AS (
          SELECT nid AS doc_id, rank FROM (
            SELECT nid, CAST(row_number() OVER (ORDER BY li_score DESC, nid) AS BIGINT) AS rank
            FROM lisc) x WHERE rank <= 20)
        SELECT id, CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_u,
          CAST(count(*) AS BIGINT) AS n_lists
        FROM (SELECT doc_id AS id, rank FROM lex
              UNION ALL SELECT doc_id, rank FROM sem
              UNION ALL SELECT doc_id, rank FROM li) u
        GROUP BY 1
        ORDER BY rrf_u DESC, id LIMIT 10""")),

    // Capstone: the CONTENT-GATE chain composed end-to-end — Gopher
    // battery (on the synthesized pages) ∧ repetition rules ∧ blocklist
    // → survivors → stride-scheduled curriculum order. The composition
    // itself is hash-checked: every gate's verdict must agree AND the
    // final interleave runs over exactly the gated subset.
    QuerySpec("q146_content_gate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // materialize the synthesized page BEFORE filtering on the
        // battery verdict: the pushed-down keep predicate re-expands
        // column aliases, and re-synthesizing the page once per count
        // reference per row (interpreted lambdas — no CSE) measured 90×
        // the staged cost. Over the staged page the inlining is
        // attribute references only.
        val paged = graft.operators.Staging.stage(
          synthPage(docs).select(col("doc_id"), col("page")), "q146_pages").df
        val gok = ContentFilter.gopherStats(paged, "doc_id", "page")
          .filter(col("keep")).select(col("id"))
        val bok = ContentFilter.blocklistScore(docs, "doc_id", "text",
            BLOCKLIST, BLOCK_THRESHOLD)
          .filter(!col("blocked")).select(col("id"))
        // CHEAPEST GATES FIRST: the n-gram repetition scan is the
        // expensive stage (one tagged 9-way explode + aggregate), so it
        // runs only over the docs the row-local gates already admit —
        // same AND semantics, ~20× less explode volume on a dirty crawl
        val cheapOk = docs
          .join(gok.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
          .join(bok.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
        val rok = ContentFilter.repetitionStats(cheapOk, "doc_id", "text")
          .filter(col("keep")).select(col("id"))
        val survivors = cheapOk
          .join(rok.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left_semi")
        Curriculum.interleaveStride(survivors, "doc_id", "source",
            expr("CAST(substring(source, 4) AS BIGINT) % 4 + 1"))
          .withColumnRenamed("id", "doc_id")
      },
      Some(s"""
        WITH $PAGE_SQL,
        $GOPHER_SQL,
        $REP_SQL,
        $BLOCK_SQL,
        surv AS (
          SELECT d.doc_id, d.source
          FROM documents d
          JOIN gq g ON d.doc_id = g.doc_id AND g.keep
          JOIN rq r ON d.doc_id = r.doc_id AND r.keep
          JOIN bq b ON d.doc_id = b.doc_id AND NOT b.blocked),
        rr AS (
          SELECT doc_id, source,
            CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS src_rank
          FROM surv),
        vv AS (
          SELECT doc_id, source, src_rank, (src_rank * 1000000) // w AS v FROM rr)
        SELECT doc_id, source, src_rank, v,
          CAST(row_number() OVER (ORDER BY v, source, src_rank) AS BIGINT) AS pos
        FROM vv""")),

    // Multi-source BFS over the near-dup graph: minimum hop distance
    // from the seed set (every 97th doc — stand-in for a trusted
    // curated slice); 4 fixed relaxation rounds replayed as a static
    // CTE chain. Unreached nodes emit no row.
    QuerySpec("q147_bfs_hops",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        Graph.bfsHops(pairs, "doc_a", "doc_b",
            docs.filter(col("doc_id") % 97 === 0), "doc_id", rounds = 4)
          .select(col("id").as("doc_id"), col("hops"))
      },
      Some {
        val rounds = (1 to 4).map { r =>
          s"""bd$r AS MATERIALIZED (
            SELECT id, min(d) AS d FROM (
              SELECT id, d FROM bd${r - 1}
              UNION ALL
              SELECT e.u AS id, x.d + 1 AS d
              FROM bund e JOIN bd${r - 1} x ON e.v = x.id) t
            GROUP BY 1)"""
        }.mkString(",\n")
        s"""
        WITH $MINHASH_PAIRS_SQL,
        bce AS (
          SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM mh_pairs WHERE jaccard >= 0.2 AND doc_a <> doc_b),
        bund AS (SELECT a AS u, b AS v FROM bce UNION ALL SELECT b AS u, a AS v FROM bce),
        bd0 AS MATERIALIZED (
          SELECT DISTINCT doc_id AS id, CAST(0 AS BIGINT) AS d
          FROM documents WHERE doc_id % 97 = 0),
        $rounds
        SELECT id AS doc_id, d AS hops FROM bd4"""
      }),

    // PII scrubbing: each doc embeds in a synthesized page carrying
    // emails, a credit card, IPs, and a phone number (declaratively —
    // both engines build the identical page), then the four RE2-safe
    // category patterns count and redact in fixed order; per-category
    // counts plus the md5 of the fully redacted text pin every match
    // boundary and replacement.
    QuerySpec("q164_pii_scrub",
      (s, dir) => {
        val page = Tables.documents(s, dir).withColumn("page",
          concat(
            col("text"),
            lit(" contact "), col("lang"), col("doc_id").cast("string"),
            lit("@mail.example.com"),
            when(col("doc_id") % 3 === 0, lit(" also bob@ex.org")).otherwise(lit("")),
            lit(" ip "), (col("doc_id") % 256).cast("string"), lit(".0.113."),
            (col("doc_id") % 200).cast("string"),
            when(col("doc_id") % 4 === 1, lit(" 10.0.0.1")).otherwise(lit("")),
            lit(" card 4111 1111 1111 "),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" tel +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        Pii.scrub(page, "page")
          .select(col("doc_id"), col("n_email"), col("n_card"), col("n_ip"),
            col("n_phone"), md5(col("clean")).as("clean_md5"))
      },
      Some {
        s"""
        WITH pg AS (
          SELECT doc_id,
            text || ' contact ' || lang || CAST(doc_id AS VARCHAR)
              || '@mail.example.com'
              || CASE WHEN doc_id % 3 = 0 THEN ' also bob@ex.org' ELSE '' END
              || ' ip ' || CAST(doc_id % 256 AS VARCHAR) || '.0.113.'
              || CAST(doc_id % 200 AS VARCHAR)
              || CASE WHEN doc_id % 4 = 1 THEN ' 10.0.0.1' ELSE '' END
              || ' card 4111 1111 1111 '
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' tel +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS page
          FROM documents),
        ${piiChainSql("pg", "page")}
        SELECT doc_id, n_email, n_card, n_ip, n_phone, md5(t) AS clean_md5
        FROM t4"""
      }),

    // Intra-document line dedup (CCNet's within-page half — q105's
    // segment dedup drops corpus-frequent lines; this drops repeats
    // INSIDE one document, keeping first occurrences in order): docs
    // re-lined into 4-word lines (small vocabulary → real intra-doc
    // repeats), reconstruction digest pins order and content.
    QuerySpec("q165_intradoc_line_dedup",
      (s, dir) => {
        val paged = Tables.documents(s, dir)
          .withColumn("w", TextFns.tokens(col("text")))
          // zero-token guard: Spark's sequence(0, -1) is descending
          // ([0,-1]) vs the oracle's empty range(0, 0)
          .withColumn("page", when(size(col("w")) === 0, lit("")).otherwise(array_join(
            transform(sequence(lit(0), expr("((size(w) + 3) div 4) - 1")),
              i => array_join(slice(col("w"), i * lit(4) + 1, lit(4)), " ")), "\n")))
        CorpusText.dedupLinesWithinDoc(paged.select("doc_id", "page"), "doc_id", "page")
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            md5(col("clean")).as("clean_md5"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        pg AS (
          SELECT doc_id, array_to_string(list_transform(range(0, (len(w)+3)//4),
            i -> array_to_string(w[i*4+1:i*4+4], ' ')), chr(10)) AS page
          FROM words),
        ln AS (
          SELECT doc_id, i AS pos, l[CAST(i + 1 AS INTEGER)] AS line
          FROM (SELECT doc_id, string_split(page, chr(10)) AS l FROM pg),
            UNNEST(range(0, len(l))) AS t(i)),
        k AS (
          SELECT doc_id, pos, line,
            min(pos) OVER (PARTITION BY doc_id, line) AS minp
          FROM ln)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
          CAST(sum(CASE WHEN pos = minp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          md5(string_agg(CASE WHEN pos = minp THEN line END, chr(10)
            ORDER BY pos)) AS clean_md5
        FROM k GROUP BY 1""")),

    // COMPLIANCE + STORAGE capstone (the q114/q146 pattern over this
    // batch's operators): synthesized pages with nav boilerplate + a
    // PII contact line → Pii scrub → intra-doc line dedup (drops the
    // repeated nav) → hashed-classifier gate (keep pred_cls ≠ 3) →
    // CDC chunk-store dedup ratio over the surviving CLEAN corpus.
    // One dataflow; the composition itself is what hash-matches.
    QuerySpec("q168_compliance_capstone",
      (s, dir) => {
        val nav = "home about contact news"
        val docs = Tables.documents(s, dir)
        val paged = docs
          .withColumn("w", TextFns.tokens(col("text")))
          // zero-token guard, same as q165: sequence(0, -1) descends
          .withColumn("body", when(size(col("w")) === 0, lit("")).otherwise(array_join(
            transform(sequence(lit(0), expr("((size(w) + 3) div 4) - 1")),
              i => array_join(slice(col("w"), i * lit(4) + 1, lit(4)), " ")), "\n")))
          .withColumn("page", concat(
            lit(nav), lit("\n"), col("body"), lit("\n"), lit(nav), lit("\n"),
            lit("reach us "), col("lang"), col("doc_id").cast("string"),
            lit("@mail.example.com tel +1 (555) 010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        // stage the SYNTHESIZED page before scrubbing: the page is an
        // interpreted transform/array_join expression, and scrub's
        // chained counts+replaces would re-expand it exponentially
        // (the q146 pushdown-re-expansion lesson — measured 11×/decade
        // before this barrier, ~3×/decade after)
        val pages = Staging.stage(paged.select(col("doc_id"), col("page")), "cap_pages")
        val scrubbed = Staging.stage(Pii.scrub(pages.df, "page"), "cap_scrub")
        val deduped = Staging.stage(
          CorpusText.dedupLinesWithinDoc(
            scrubbed.df.select(col("doc_id"), col("clean")), "doc_id", "clean"),
          "cap_dedup")
        val pred = Classifier.predictFused(deduped.df, "doc_id", "clean",
          Classifier.syntheticModel(s, 4096, 4), 4096)
        val surv = Staging.stage(
          deduped.df.join(pred.filter(col("pred_cls") =!= 3).select("doc_id"),
            Seq("doc_id")).select("doc_id", "clean"),
          "cap_surv")
        val chunks = Staging.stage(
          Chunking.cdcChunksCodegen(surv.df, "doc_id", "clean", maskBits = 6)
            .withColumn("h", md5(col("chunk"))),
          "cap_chunks")
        val out = Staging.stage(
          docs.agg(count(lit(1)).as("n_docs"))
            .crossJoin(broadcast(scrubbed.df.agg(
              sum(col("n_email") + col("n_card") + col("n_ip") + col("n_phone"))
                .as("n_pii"))))
            .crossJoin(broadcast(deduped.df.agg(
              sum(col("n_lines")).as("lines_total"), sum(col("n_kept")).as("lines_kept"))))
            .crossJoin(broadcast(surv.df.agg(count(lit(1)).as("docs_kept"))))
            .crossJoin(broadcast(chunks.df.agg(count(lit(1)).as("n_chunks"),
              countDistinct(col("h")).as("n_unique"), sum(col("len")).as("total_bytes"))))
            .crossJoin(broadcast(chunks.df.groupBy("h").agg(min(col("len")).as("l"))
              .agg(sum(col("l")).as("unique_bytes")))),
          "cap_out")
        Seq(pages, scrubbed, deduped, surv, chunks).foreach(_.delete())
        out.df
      },
      Some(s"""
        WITH $WORDS_SQL,
        pg0 AS (
          SELECT doc_id, lang, array_to_string(list_transform(range(0, (len(w)+3)//4),
            i -> array_to_string(w[i*4+1:i*4+4], ' ')), chr(10)) AS body
          FROM words),
        pg AS (
          SELECT doc_id,
            'home about contact news' || chr(10) || body || chr(10)
              || 'home about contact news' || chr(10)
              || 'reach us ' || lang || CAST(doc_id AS VARCHAR)
              || '@mail.example.com tel +1 (555) 010-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS page
          FROM pg0),
        ${piiChainSql("pg", "page")},
        cln AS (
          SELECT doc_id, i AS pos, ll[CAST(i + 1 AS INTEGER)] AS line
          FROM (SELECT doc_id, string_split(t, chr(10)) AS ll FROM t4),
            UNNEST(range(0, len(ll))) AS u(i)),
        kk AS (
          SELECT doc_id, pos, line,
            min(pos) OVER (PARTITION BY doc_id, line) AS minp
          FROM cln),
        dd AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
            CAST(sum(CASE WHEN pos = minp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
            string_agg(CASE WHEN pos = minp THEN line END, chr(10)
              ORDER BY pos) AS clean
          FROM kk GROUP BY 1),
        cw AS (
          SELECT doc_id,
            list_filter(regexp_split_to_array(lower(trim(clean)), '\\s+'),
              x -> len(x) > 0) AS w
          FROM dd),
        ${MlQueries.classifierSql("cw")},
        surv AS (
          SELECT dd.doc_id, dd.clean FROM dd
          JOIN (SELECT doc_id, cls FROM r WHERE rn = 1) p USING (doc_id)
          WHERE p.cls <> 3),
        ${MlQueries.cdcSql("surv", "clean")}
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
          (SELECT CAST(sum(n_email + n_card + n_ip + n_phone) AS BIGINT) FROM t4) AS n_pii,
          (SELECT CAST(sum(n_lines) AS BIGINT) FROM dd) AS lines_total,
          (SELECT CAST(sum(n_kept) AS BIGINT) FROM dd) AS lines_kept,
          (SELECT CAST(count(*) AS BIGINT) FROM surv) AS docs_kept,
          (SELECT CAST(count(*) AS BIGINT) FROM chunks) AS n_chunks,
          (SELECT CAST(count(DISTINCT md5(chunk)) AS BIGINT) FROM chunks) AS n_unique,
          (SELECT CAST(sum(len) AS BIGINT) FROM chunks) AS total_bytes,
          (SELECT CAST(sum(l2) AS BIGINT) FROM (
            SELECT min(len) AS l2 FROM chunks GROUP BY md5(chunk)) x) AS unique_bytes""")),

    // Text canonicalization for dedup (the CCNet preprocessing pass):
    // docs decorated with doc-dependent accents + punctuation (same
    // underlying text → different raw bytes), then lowercase → explicit
    // translate-table accent fold (NOT a library NFD pass — those
    // differ across engines; a table cannot) → punctuation strip →
    // whitespace collapse. Group sizes under the raw vs canonical key
    // show exactly the duplicates canonicalization recovers.
    QuerySpec("q169_canonicalize_dedup",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // each doc carries its EVEN neighbor's text (pairs share base
        // content — the corpus itself has no exact dups), decorated
        // differently per parity: raw bytes differ, canonical forms
        // collapse, so n_same_norm = 2 where n_same_raw = 1.
        val base = docs.select(col("doc_id"))
          .join(docs.select((col("doc_id")).as("bid"), col("text")),
            col("bid") === expr("(doc_id div 2) * 2"))
        val deco = base.withColumn("raw",
          concat(
            when(col("doc_id") % 2 === 0, translate(col("text"), "ea", "éà"))
              .otherwise(col("text")),
            when(col("doc_id") % 2 === 0, lit(" !!")).otherwise(lit(" ??"))))
        val norm = deco.withColumn("norm", TextFns.canonicalize(col("raw")))
        val wR = Window.partitionBy(col("raw"))
        val wN = Window.partitionBy(col("norm"))
        norm.select(col("doc_id"),
          md5(col("raw")).as("raw_md5"), md5(col("norm")).as("norm_md5"),
          count(lit(1)).over(wR).as("n_same_raw"),
          count(lit(1)).over(wN).as("n_same_norm"))
      },
      Some(s"""
        WITH base AS (
          SELECT a.doc_id, b.text
          FROM documents a JOIN documents b ON b.doc_id = (a.doc_id // 2) * 2),
        deco AS (
          SELECT doc_id,
            (CASE WHEN doc_id % 2 = 0 THEN translate(text, 'ea', 'éà')
                  ELSE text END)
            || (CASE WHEN doc_id % 2 = 0 THEN ' !!' ELSE ' ??' END) AS raw
          FROM base),
        n AS (
          SELECT doc_id, raw,
            trim(regexp_replace(regexp_replace(
              translate(lower(raw), '${TextFns.ACCENT_FROM}', '${TextFns.ACCENT_TO}'),
              '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')) AS norm
          FROM deco)
        SELECT doc_id, md5(raw) AS raw_md5, md5(norm) AS norm_md5,
          CAST(count(*) OVER (PARTITION BY raw) AS BIGINT) AS n_same_raw,
          CAST(count(*) OVER (PARTITION BY norm) AS BIGINT) AS n_same_norm
        FROM n""")),

    // K-ANONYMIZATION (Sweeney) — the privacy release gate next to the
    // q160 PII scrub: quasi-identifiers (user_id, cents) coarsen in
    // lockstep through a 3-level generalization ladder, the smallest
    // level whose minimum class size reaches k=5 is chosen (coarsest as
    // fallback), residual classes below k suppress. The oracle replays
    // all three levels, the minimum-size choice, and the suppression.
    QuerySpec("q227_k_anonymize",
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        Pii.kAnonymize(ev,
          Seq("user_id" -> Seq(1L, 16L, 256L),
            "cents" -> Seq(100L, 1000L, 10000L)), k = 5L)
      },
      Some("""
        WITH e AS (
          SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
          FROM events),
        lv AS (
          SELECT 0 AS level, user_id // 1 AS g_user_id,
            cents // 100 AS g_cents FROM e
          UNION ALL
          SELECT 1, user_id // 16, cents // 1000 FROM e
          UNION ALL
          SELECT 2, user_id // 256, cents // 10000 FROM e),
        sizes AS (
          SELECT level, g_user_id, g_cents,
            CAST(count(*) AS BIGINT) AS n_rows
          FROM lv GROUP BY 1, 2, 3),
        mins AS (SELECT level, min(n_rows) AS mn FROM sizes GROUP BY 1),
        ch AS (
          SELECT COALESCE(min(CASE WHEN mn >= 5 THEN level END), 2) AS lvl
          FROM mins)
        SELECT CAST(s.level AS BIGINT) AS level, s.g_user_id, s.g_cents,
          s.n_rows
        FROM sizes s, ch WHERE s.level = ch.lvl AND s.n_rows >= 5"""))
  )
}
