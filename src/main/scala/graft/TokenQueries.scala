package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Tokenize

/** Training-sequence preparation surface (round 3 batch 4): vocabulary
  * build → token-id encoding → fixed-length sequence packing — the
  * corpus-to-training-shards pipeline, each stage oracle-checked.
  */
object TokenQueries {

  import ExtQueries.WORDS_SQL

  val all: Seq[QuerySpec] = Seq(

    // Frequency-ranked vocabulary, capped at 16 ids (ties broken
    // lexicographically — engine-deterministic).
    QuerySpec("q84_vocab_build",
      (s, dir) => Tokenize.vocabBuild(
        Tables.documents(s, dir)
          .select(explode(TextFns.tokens(col("text"))).as("term")),
        "term", maxSize = 16),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT UNNEST(w) AS term FROM words),
        c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        v AS (SELECT term, cnt,
                CAST(row_number() OVER (ORDER BY cnt DESC, term) - 1 AS BIGINT) AS id
              FROM c)
        SELECT term, cnt, id FROM v WHERE id < 16""")),

    // Documents encoded as vocabulary-id arrays in token order; terms
    // outside the 16-id vocabulary encode as -1 (OOV). The Scala API
    // (`Tokenize.encodeDocs`) returns the real `ids: array<bigint>`; the
    // oracle projection renders it as a CSV string because the driver's
    // canonicalizer can only sort/hash scalar columns.
    QuerySpec("q85_encode_docs",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val vocab = Tokenize.vocabBuild(
          docs.select(explode(TextFns.tokens(col("text"))).as("term")), "term", 16)
        Tokenize.encodeDocs(docs, "doc_id", "text", vocab)
          .select(col("doc_id"), col("n_tokens"),
            array_join(transform(col("ids"), _.cast("string")), ",").as("ids_csv"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        v AS (SELECT term,
                CAST(row_number() OVER (ORDER BY cnt DESC, term) - 1 AS BIGINT) AS id
              FROM c QUALIFY id < 16),
        enc AS (
          SELECT t.doc_id, t.pos, COALESCE(v.id, -1) AS id
          FROM tok t LEFT JOIN v ON t.term = v.term)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
        FROM enc GROUP BY 1""")),

    // The corpus token stream cut into 128-token training sequences:
    // per-sequence manifest row (token count, docs spanned, boundaries).
    QuerySpec("q86_sequence_pack",
      (s, dir) => Tokenize.packSequences(
        Tables.documents(s, dir), "doc_id", "text", ctx = 128),
      Some(s"""
        WITH $WORDS_SQL,
        lens AS (SELECT doc_id AS did, CAST(len(w) AS BIGINT) AS n
                 FROM words WHERE len(w) > 0),
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

    // Inverted index over the corpus: term → df + ordered postings of
    // (doc, position). The df cap is a no-op on this degenerate test
    // vocabulary (every term is near-universal); `TokenizeSpec`
    // exercises the capping semantics on synthetic data.
    QuerySpec("q90_inverted_index",
      (s, dir) => Tokenize.invertedIndex(
          Tables.documents(s, dir), "doc_id", "text", dfCap = 1000000L)
        // the API keeps `postings: array<struct<did,pos>>`; the oracle
        // projection digests the ordered list so the driver can hash it
        .select(col("term"), col("df"), col("n_postings"),
          md5(array_join(transform(col("postings"),
            p => concat_ws(":", p.getField("did").cast("string"),
              p.getField("pos").cast("string"))), ";")).as("postings_md5")),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        dfc AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
          HAVING count(DISTINCT doc_id) <= 1000000),
        kept AS (
          SELECT t.doc_id, t.pos, t.term, d.df
          FROM tok t JOIN dfc d ON t.term = d.term)
        SELECT term, CAST(any_value(df) AS BIGINT) AS df,
          CAST(count(*) AS BIGINT) AS n_postings,
          md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR),
            ';' ORDER BY doc_id, pos)) AS postings_md5
        FROM kept GROUP BY 1""")),

    // OOV-rate sweep — the vocabulary-sizing curve tokenizer selection
    // reads: the corpus token stream scored against the frequency-
    // ranked vocabulary at sizes 8/16/32/64 in ONE pass (rank each
    // token once, explode the size axis), exact integer milli-rates.
    QuerySpec("q176_oov_sweep",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = docs.select(explode(TextFns.tokens(col("text"))).as("term"))
        val vocab = Tokenize.vocabBuild(toks, "term", maxSize = 1000000)
        // left join: a term past the vocab cap is OOV at every sweep
        // size (the oracle ranks the full vocabulary — an inner join
        // would silently deflate n_tokens instead)
        toks.join(broadcast(vocab.select(col("term"), col("id"))), Seq("term"), "left")
          .select(coalesce(col("id"), lit(Long.MaxValue)).as("id"),
            explode(array(lit(8L), lit(16L), lit(32L), lit(64L)))
            .as("vocab_size"))
          .groupBy(col("vocab_size"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("id") >= col("vocab_size"), 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_milli",
            expr("(1000 * n_oov) div n_tokens"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT UNNEST(w) AS term FROM words),
        c AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
        v AS (SELECT term,
                CAST(row_number() OVER (ORDER BY cnt DESC, term) - 1 AS BIGINT) AS id
              FROM c),
        scored AS (
          SELECT v.id, s.vs FROM tok t
          JOIN v ON t.term = v.term,
          UNNEST([8, 16, 32, 64]) AS s(vs))
        SELECT CAST(vs AS BIGINT) AS vocab_size,
          CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN id >= vs THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
          (1000 * CAST(sum(CASE WHEN id >= vs THEN 1 ELSE 0 END) AS BIGINT))
            // CAST(count(*) AS BIGINT) AS oov_milli
        FROM scored GROUP BY 1""")),

    // Co-occurrence + PMI collocations — the GloVe/word2vec-SGNS
    // statistics layer: row-local skip-gram pairs (window 3, unordered),
    // hapax-pruned counts, exact milli-bit PMI against unigram and
    // pair totals, per-word top-3 partners. The oracle replays pair
    // extraction positionally, the pruning, and the integer scoring.
    QuerySpec("q222_pmi_collocations",
      (s, dir) => graft.operators.Cooccur.pmiCollocations(
        Tables.documents(s, dir), "doc_id", "text",
        window = 3, minCount = 5L, k = 3),
      Some {
        def mlog2(x: String) =
          s"(CAST(length(bin($x)) - 1 AS BIGINT) * 1000 + (($x - (CAST(1 AS BIGINT) << " +
            s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << " +
            s"(length(bin($x)) - 1)))"
        s"""
        WITH $WORDS_SQL,
        pos AS MATERIALIZED (
          SELECT doc_id, CAST(i AS BIGINT) AS i, w[CAST(i AS INTEGER)] AS x
          FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)),
        pr AS (
          SELECT least(p1.x, p2.x) AS a, greatest(p1.x, p2.x) AS b
          FROM pos p1 JOIN pos p2 ON p1.doc_id = p2.doc_id
            AND p2.i > p1.i AND p2.i <= p1.i + 3),
        cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                FROM pr GROUP BY 1, 2),
        pp AS (SELECT a, b, c_ab FROM cab WHERE c_ab >= 5),
        uni AS (SELECT x AS t, CAST(count(*) AS BIGINT) AS c_t
                FROM pos GROUP BY 1),
        tot AS (
          SELECT (SELECT CAST(SUM(c_ab) AS BIGINT) FROM pp) AS p_tot,
                 (SELECT CAST(SUM(c_t) AS BIGINT) FROM uni) AS n_tot),
        sc AS (
          SELECT p.a, p.b, p.c_ab,
            ${mlog2("p.c_ab")} + 2 * ${mlog2("t.n_tot")} - ${mlog2("t.p_tot")}
              - ${mlog2("ua.c_t")} - ${mlog2("ub.c_t")} AS pmi_mb
          FROM pp p JOIN uni ua ON p.a = ua.t JOIN uni ub ON p.b = ub.t
          CROSS JOIN tot t),
        sym AS (
          SELECT a, b, c_ab, pmi_mb FROM sc
          UNION ALL
          SELECT b AS a, a AS b, c_ab, pmi_mb FROM sc WHERE a <> b)
        SELECT a, b, c_ab, pmi_mb, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY a
                ORDER BY pmi_mb DESC, b) AS rn FROM sym) z
        WHERE rn <= 3"""
      })
  )
}
