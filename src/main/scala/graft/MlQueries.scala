package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

/** Model-application surface (round 5 batch 4): the pipeline stages
  * that score every document against a broadcast model — hashed linear
  * classification (fastText-shaped quality/langid scoring) and friends.
  * Each stage oracle-checked end to end, model derivation included.
  */
object MlQueries {

  import ExtQueries.WORDS_SQL

  val all: Seq[QuerySpec] = Seq(

    // fastText-shaped classifier inference: uni+bigram features hashed
    // into 4096 buckets, scored against a broadcast (bucket, cls)
    // milli-unit weight table (md5-derived fixture standing in for
    // trained weights — same dataflow), argmax of exact integer sums
    // with the runner-up margin as confidence.
    QuerySpec("q158_hashed_classifier",
      (s, dir) => Classifier.predictFused(
        Tables.documents(s, dir), "doc_id", "text",
        Classifier.syntheticModel(s, buckets = 4096, nClasses = 4),
        buckets = 4096),
      Some(s"""
        WITH $WORDS_SQL,
        ${classifierSql("words")}
        SELECT a.doc_id, a.cls AS pred_cls, a.score AS best_score,
          a.score - b.score AS margin
        FROM r a JOIN r b ON a.doc_id = b.doc_id AND a.rn = 1 AND b.rn = 2""")),

    // WordPiece greedy longest-match segmentation (the BERT tokenizer
    // family — third production tokenizer besides BPE/unigram): role-
    // tagged vocabulary (initial vs ## continuation), 16 greedy rounds
    // replayed as materialized CTEs, per-word cut-position bitmask so
    // the rollup hashes the EXACT piece boundaries of every word.
    QuerySpec("q159_wordpiece",
      (s, dir) => operators.WordPiece.wordPieceSegment(
        Tables.documents(s, dir), "doc_id", "text",
        vExtra = 24, maxPieceLen = 4, maxWordLen = 16),
      Some(wordPieceOracleSql)),

    // SQ8 scalar-quantized ANN (FAISS `SQ8` — the third vector
    // compression besides raw and PQ): per-dimension byte codes from
    // corpus min/max stats, reconstruction, and exact micro-unit
    // squared-L2 against the reconstructed corpus; integral division
    // with non-negative operands so trunc ≡ floor in both engines.
    QuerySpec("q160_knn_sq8",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val st = operators.SimilaritySearch.sq8Stats(e, "embedding")
        val codes = operators.SimilaritySearch.sq8Encode(e, "vec_id", "embedding", st)
        operators.SimilaritySearch.sq8TopK(
          e.filter(col("vec_id") < 8), codes, st, "vec_id", "embedding", k = 5)
      },
      Some("""
        WITH fx AS MATERIALIZED (
          SELECT vec_id, i AS dim,
            CAST(floor(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
              * 1000000000.0) AS BIGINT) AS fx
          FROM embeddings, UNNEST(range(0, 64)) AS t(i)),
        st AS MATERIALIZED (
          SELECT dim, min(fx) AS mn, max(fx) AS mx FROM fx GROUP BY 1),
        rec AS MATERIALIZED (
          SELECT f.vec_id AS nid, f.dim,
            s.mn + ((CASE WHEN s.mx = s.mn THEN 0
                     ELSE ((f.fx - s.mn) * 255) // (s.mx - s.mn) END)
                    * (s.mx - s.mn)) // 255 AS rfx
          FROM fx f JOIN st s ON f.dim = s.dim),
        qv AS (SELECT vec_id AS qid, dim, fx FROM fx WHERE vec_id < 8),
        d AS (
          SELECT q.qid, r.nid,
            SUM(CAST(floor(abs(q.fx - r.rfx) / 1000.0) AS BIGINT)
              * CAST(floor(abs(q.fx - r.rfx) / 1000.0) AS BIGINT)) AS d2
          FROM qv q JOIN rec r ON q.dim = r.dim AND q.qid <> r.nid
          GROUP BY 1, 2)
        SELECT qid, nid, CAST(d2 AS BIGINT) AS d2, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
              FROM d)
        WHERE rn <= 5""")),

    // Content-defined chunking (Gear/FastCDC family): rolling-hash
    // boundaries over the byte stream (h = 2h + gear[b] mod 2^30; cut on
    // the HIGH bits, h < 2^24, the FastCDC rule → ~64-byte chunks). The mod-2^30 self-windowing
    // makes h a 30-term windowed sum, so the oracle replays the
    // recurrence with NO sequential scan. Executor-side loop at the
    // opaque-byte boundary; chunk hashing composes declaratively.
    QuerySpec("q166_cdc_chunks",
      (s, dir) => operators.Chunking.cdcChunksCodegen(
        Tables.documents(s, dir), "doc_id", "text", maskBits = 6)
        .select(col("doc_id"), col("chunk_idx"), col("start"), col("len"),
          md5(col("chunk")).as("chunk_md5")),
      Some("WITH " + cdcSql("documents", "text") + """
        SELECT doc_id, chunk_idx, start, len, md5(chunk) AS chunk_md5
        FROM chunks""")),

    // Chunk-store dedup ratio — what CDC exists FOR: content-defined
    // chunks dedup by content hash across the whole corpus; unique
    // bytes vs total bytes is the storage saving an edit-robust
    // chunk store achieves. One corpus pass + chunk-hash aggregates.
    QuerySpec("q167_cdc_dedup_ratio",
      (s, dir) => {
        val ch = operators.Chunking.cdcChunksCodegen(
          Tables.documents(s, dir), "doc_id", "text", maskBits = 6)
          .withColumn("h", md5(col("chunk")))
        val uniq = ch.groupBy("h").agg(min(col("len")).as("l"))
          .agg(sum(col("l")).as("unique_bytes"))
        ch.agg(count(lit(1)).as("n_chunks"),
            countDistinct(col("h")).as("n_unique"),
            sum(col("len")).as("total_bytes"))
          .crossJoin(broadcast(uniq))
      },
      Some("WITH " + cdcSql("documents", "text") + """
        SELECT CAST(count(*) AS BIGINT) AS n_chunks,
          CAST(count(DISTINCT md5(chunk)) AS BIGINT) AS n_unique,
          CAST(sum(len) AS BIGINT) AS total_bytes,
          (SELECT CAST(sum(l) AS BIGINT) FROM (
            SELECT min(len) AS l FROM chunks GROUP BY md5(chunk))) AS unique_bytes
        FROM chunks""")),

    // Hard-negative mining (the DPR/SimCSE contrastive-training stage):
    // per query, the top-5 most-similar corpus vectors BELOW the 0.95
    // near-duplicate ceiling — hardest candidates that are not copies.
    QuerySpec("q171_hard_negatives",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        operators.SimilaritySearch.hardNegatives(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 5, simCeilingMilli = 950)
      },
      Some(s"""
        WITH $SIMS_SQL
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
              FROM sims WHERE sim * 1000 < 950) r
        WHERE rn <= 5""")),

    // Deterministic random-negative sampling: per query, 4 corpus
    // vectors by an md5 draw over (qid, nid), excluding the query and
    // its top-3 neighbors (random negatives that are secretly
    // near-positives corrupt the contrastive loss). Pure hash ranking
    // — engine- and partitioning-reproducible, no RNG state.
    QuerySpec("q172_sampled_negatives",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        operators.SimilaritySearch.sampleNegatives(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          k = 4, excludeTopM = 3)
      },
      Some(s"""
        WITH $SIMS_SQL,
        near AS (
          SELECT qid, nid FROM (
            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM sims) x WHERE rn <= 3),
        cand AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid
          FROM embeddings q, embeddings e
          WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id),
        an AS (
          SELECT c.qid, c.nid FROM cand c
          LEFT JOIN near n ON c.qid = n.qid AND c.nid = n.nid
          WHERE n.qid IS NULL),
        d AS (
          SELECT qid, nid,
            md5(CAST(qid AS VARCHAR) || ':' || CAST(nid AS VARCHAR)) AS draw
          FROM an)
        SELECT qid, nid, draw, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY draw, nid) AS rn
              FROM d) r
        WHERE rn <= 4""")),

    // Incremental IVF index maintenance: the index is built in TWO
    // batches (even ids first, odd ids appended later) with fixed
    // centroids — assignment is per-vector, so append ≡ full rebuild,
    // and the probe against the unioned index equals q50's one-shot
    // search. The oracle replays assignment over the whole corpus: if
    // the append path touched or re-assigned anything, the hash breaks.
    QuerySpec("q173_ivf_incremental",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cent = e.filter(col("vec_id") < 16)
        val base = operators.SimilaritySearch.ivfAssign(
          e.filter(col("vec_id") % 2 === 0), cent, "vec_id", "embedding", "vec_id")
        val delta = operators.SimilaritySearch.ivfAssign(
          e.filter(col("vec_id") % 2 === 1), cent, "vec_id", "embedding", "vec_id")
        operators.SimilaritySearch.ivfTopKIndexed(
          e.filter(col("vec_id") < 8), base.unionByName(delta), cent,
          "vec_id", "embedding", "vec_id", k = 3, nProbe = 4)
      },
      Some(s"""
        WITH ${ExtQueries.IVF_CAND_SQL},
        el AS (
          SELECT c.qid, c.nid, UNNEST(q.embedding) AS x, UNNEST(e.embedding) AS y
          FROM cand c JOIN embeddings q ON c.qid = q.vec_id
                      JOIN embeddings e ON c.nid = e.vec_id),
        dots AS (
          SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        qsims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM qsims) r
        WHERE rn <= 3""")),

    // Tokenizer BAKE-OFF — the evaluation layer over the production
    // tokenizer triple: BPE (8 learned merges), unigram-LM (Viterbi,
    // 300-piece vocab), and WordPiece (greedy, 24-piece vocab) each
    // encode the SAME corpus; total emitted units = the compression
    // comparison tokenizer selection actually runs on. Each engine
    // replays all three FULL chains (training included); DuckDB scopes
    // each chain's CTEs inside its own parenthesized subquery.
    QuerySpec("q174_tokenizer_bakeoff",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val wp = operators.WordPiece.wordPieceSegment(
          docs, "doc_id", "text", vExtra = 24, maxPieceLen = 4, maxWordLen = 16)
          .agg(sum(col("n_pieces")).as("n_units"))
          .select(lit("wordpiece").as("tokenizer"), col("n_units"))
        val uni = operators.Unigram.unigramSegment(
          docs, "doc_id", "text", vExtra = 300, maxPieceLen = 4, maxWordLen = 16)
          .agg(sum(col("n_pieces")).as("n_units"))
          .select(lit("unigram").as("tokenizer"), col("n_units"))
        val bpe = operators.Bpe.encodeBpe(docs, "doc_id", "text", merges = 8)
          .agg(sum(col("n_tokens")).as("n_units"))
          .select(lit("bpe").as("tokenizer"), col("n_units"))
        wp.unionByName(uni).unionByName(bpe)
      },
      Some(s"""
        SELECT 'wordpiece' AS tokenizer, CAST(sum(n_pieces) AS BIGINT) AS n_units
        FROM ($wordPieceOracleSql) wp
        UNION ALL
        SELECT 'unigram', CAST(sum(n_pieces) AS BIGINT)
        FROM (WITH $WORDS_SQL, ${operators.Unigram.oracleSql(300, 4, 16)}) un
        UNION ALL
        SELECT 'bpe', CAST(sum(n_tokens) AS BIGINT)
        FROM (WITH $WORDS_SQL, ${operators.Bpe.oracleEncodeSql(8)}) bp""")),

    // IVF-SQ8 composed ANN (FAISS `IVFx,SQ8` — q151's sibling at the
    // other compression point: 4× bytes at near-exact fidelity vs PQ's
    // 32×): probed-cell candidates scored by exact micro-unit L2
    // against SQ8-reconstructed codes. Oracle composes the shared IVF
    // candidate chain with the shared SQ8 reconstruction chain.
    QuerySpec("q177_knn_ivfsq8",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val st = operators.SimilaritySearch.sq8Stats(e, "embedding")
        operators.SimilaritySearch.ivfSq8TopK(
          e.filter(col("vec_id") < 8), e, e.filter(col("vec_id") < 16), st,
          "vec_id", "embedding", "vec_id", k = 3, nProbe = 4)
      },
      Some(s"""
        WITH ${ExtQueries.IVF_CAND_SQL},
        fx AS MATERIALIZED (
          SELECT vec_id, i AS dim,
            CAST(floor(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
              * 1000000000.0) AS BIGINT) AS fx
          FROM embeddings, UNNEST(range(0, 64)) AS t(i)),
        sst AS MATERIALIZED (
          SELECT dim, min(fx) AS mn, max(fx) AS mx FROM fx GROUP BY 1),
        rec AS MATERIALIZED (
          SELECT f.vec_id AS nid, f.dim,
            s.mn + ((CASE WHEN s.mx = s.mn THEN 0
                     ELSE ((f.fx - s.mn) * 255) // (s.mx - s.mn) END)
                    * (s.mx - s.mn)) // 255 AS rfx
          FROM fx f JOIN sst s ON f.dim = s.dim),
        qv AS (SELECT vec_id AS qid, dim, fx FROM fx WHERE vec_id < 8),
        d AS (
          SELECT c.qid, c.nid,
            SUM(CAST(floor(abs(q.fx - r.rfx) / 1000.0) AS BIGINT)
              * CAST(floor(abs(q.fx - r.rfx) / 1000.0) AS BIGINT)) AS d2
          FROM cand c JOIN qv q ON q.qid = c.qid
                      JOIN rec r ON r.nid = c.nid AND r.dim = q.dim
          GROUP BY 1, 2)
        SELECT qid, nid, CAST(d2 AS BIGINT) AS d2, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
              FROM d)
        WHERE rn <= 3""")),

    // Trigram substring search (pg_trgm / code-search architecture —
    // the query shape word indexes can't serve): candidates = docs
    // containing ALL of the pattern's character trigrams (postings
    // intersection, never a text scan), exact contains() verify on
    // candidates only; verified=false rows ARE the trigram false
    // positives, so the pruning behavior itself is hash-checked.
    QuerySpec("q179_trigram_search",
      (s, dir) => operators.CorpusText.trigramSearch(
        Tables.documents(s, dir), "doc_id", "text", "batch stream"),
      Some {
        val pats = "batch stream".sliding(3).toSeq.distinct
          .map(p => s"'$p'").mkString(", ")
        s"""
        WITH tr AS (
          SELECT DISTINCT doc_id, substr(text, CAST(s AS INTEGER), 3) AS tri
          FROM documents, UNNEST(range(1, length(text) - 1)) AS t(s)),
        p AS (SELECT DISTINCT UNNEST([$pats]) AS tri),
        cand AS (
          SELECT doc_id FROM tr JOIN p USING (tri)
          GROUP BY 1 HAVING count(*) = (SELECT count(*) FROM p))
        SELECT c.doc_id AS id, contains(d.text, 'batch stream') AS verified
        FROM cand c JOIN documents d USING (doc_id)"""
      }),

    // Positional phrase search over the inverted index: postings of
    // each phrase word join on positional ADJACENCY — exact
    // word-sequence matching with occurrence counts, no text rescans.
    QuerySpec("q180_phrase_search",
      (s, dir) => operators.CorpusText.phraseSearch(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("part", "filter")),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)),
        m AS (
          SELECT a.doc_id, a.pos FROM tok a
          JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                    AND b.term = 'filter'
          WHERE a.term = 'part')
        SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM m GROUP BY 1""")),

    // Span-level quality localization ("remove the worst paragraph",
    // not "drop the doc"): each 5-bigram sliding span accumulates
    // integer LM-surprisal bits; every doc reports its WORST span
    // (max bits, earliest start). The q106 scoring chain + doc-keyed
    // rolling windows; integer-exact throughout.
    QuerySpec("q182_worst_span",
      (s, dir) => operators.CorpusText.worstSurprisalSpan(
        Tables.documents(s, dir), "doc_id", "text", window = 5),
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (
          SELECT doc_id, i AS pos, w[CAST(i + 1 AS INTEGER)] AS term
          FROM words, UNNEST(range(0, len(w))) AS t(i)
          WHERE len(w) > 0),
        uni AS (SELECT term AS w1, count(*) AS c1 FROM tok GROUP BY 1),
        voc AS (SELECT count(*) AS v FROM uni),
        big AS (
          SELECT doc_id, pos, term AS w1,
            lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM tok QUALIFY w2 IS NOT NULL),
        sc AS (
          SELECT b.doc_id, b.pos,
            (length(bin(u.c1 + v.v)) - 1) - (length(bin(p.c12 + 1)) - 1) AS bits
          FROM big b
          JOIN (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2) p
            ON b.w1 = p.w1 AND b.w2 = p.w2
          JOIN uni u ON b.w1 = u.w1
          CROSS JOIN voc v),
        sp AS (
          SELECT doc_id, pos,
            SUM(bits) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS span_bits,
            COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS n_in
          FROM sc)
        SELECT doc_id, CAST(pos AS BIGINT) AS span_start,
          CAST(span_bits AS BIGINT) AS span_bits
        FROM (
          SELECT doc_id, pos, span_bits,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY span_bits DESC, pos) AS rn
          FROM sp WHERE n_in = 5) x
        WHERE rn = 1""")),

    // Per-source DATASET CARD — the per-source report every corpus
    // release publishes: doc/char/token volumes plus the classifier's
    // class distribution, one row per source. Composes the fused
    // classifier with row-local token counts; one grouped aggregate.
    QuerySpec("q183_dataset_card",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pred = Classifier.predictFused(docs, "doc_id", "text",
          Classifier.syntheticModel(s, 4096, 4), 4096)
        docs.join(pred.select(col("doc_id"), col("pred_cls")), Seq("doc_id"))
          .withColumn("n_tok", size(functions.TextFns.tokens(col("text"))))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("n_tok").cast("long")).as("sum_tokens"),
            sum(when(col("pred_cls") === 0, 1L).otherwise(0L)).as("n_cls0"),
            sum(when(col("pred_cls") === 1, 1L).otherwise(0L)).as("n_cls1"),
            sum(when(col("pred_cls") === 2, 1L).otherwise(0L)).as("n_cls2"),
            sum(when(col("pred_cls") === 3, 1L).otherwise(0L)).as("n_cls3"))
      },
      Some(s"""
        WITH cw AS (
          SELECT doc_id, source, n_chars,
            list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              x -> len(x) > 0) AS w
          FROM documents),
        ${classifierSql("cw")},
        pred AS (SELECT doc_id, cls FROM r WHERE rn = 1)
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          CAST(sum(len(w)) AS BIGINT) AS sum_tokens,
          CAST(sum(CASE WHEN cls = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cls0,
          CAST(sum(CASE WHEN cls = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cls1,
          CAST(sum(CASE WHEN cls = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cls2,
          CAST(sum(CASE WHEN cls = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_cls3
        FROM cw JOIN pred USING (doc_id) GROUP BY 1""")),

    // Perceptron TRAINING + fused inference — the full train→serve
    // chain with no fixture anywhere: 3 batch averaged-perceptron
    // rounds over language-labeled documents (B=64 hashed uni+bigram
    // features, exact integer updates, summed snapshots), and the
    // TRAINED weights drive the zero-shuffle codegen'd predictFused.
    // The oracle replays every round as CTEs (the q159 discipline), so
    // a single weight diverging anywhere in training breaks the hash.
    QuerySpec("q185_perceptron_train",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("lab",
            when(col("lang") === "de", 0L).when(col("lang") === "en", 1L)
              .when(col("lang") === "es", 2L).when(col("lang") === "fr", 3L)
              .otherwise(4L))
        val w = Classifier.trainPerceptron(docs, "doc_id", "text", "lab",
          buckets = 64, nClasses = 5, rounds = 3)
        Classifier.predictFused(docs, "doc_id", "text", w, buckets = 64)
      },
      Some(perceptronOracleSql)),

    // NAIVE BAYES train + serve — the counting member of the
    // classifier-training family (fit = ONE grouped count; mergeable,
    // incrementally refreshable): add-one smoothed milli-bit log2
    // weights + priors over the same language labels as q185, then
    // per-doc argmax with margin. The oracle replays counts, the full
    // smoothed grid, priors, and the scoring — integer end to end.
    QuerySpec("q219_naive_bayes",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("lab",
            when(col("lang") === "de", 0L).when(col("lang") === "en", 1L)
              .when(col("lang") === "es", 2L).when(col("lang") === "fr", 3L)
              .otherwise(4L))
        val (model, priors) = Classifier.trainNaiveBayes(docs, "doc_id",
          "text", "lab", buckets = 64, nClasses = 5)
        Classifier.predictNaiveBayes(docs, "doc_id", "text", model, priors,
          buckets = 64)
      },
      Some(naiveBayesOracleSql)),

    // DECISION-TREE training + serving — the third trainable classifier
    // family (axis-split rules over quantized quality signals): depth-2
    // CART with exact integer milli-Gini split selection on token-count
    // and chars-per-token features, English-vs-rest labels. The oracle
    // replays BOTH levels' count→cumulate→score→argmax chains and the
    // routing — one wrong split or leaf anywhere breaks the hash.
    QuerySpec("q220_decision_tree",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .withColumn("w", graft.functions.TextFns.tokens(col("text")))
          .select(col("doc_id"),
            when(col("lang") === "en", 1L).otherwise(0L).as("lab"),
            expr("CAST(least(size(w) DIV 8, 63) AS BIGINT)").as("f0"),
            expr("CAST(least(n_chars DIV (size(w) + 1), 31) AS BIGINT)").as("f1"))
        val nodes = Classifier.trainDecisionTree(base, "doc_id", "lab",
          Seq("f0", "f1"), depth = 2, nClasses = 2)
        Classifier.applyTree(base, "doc_id", Seq("f0", "f1"), nodes, depth = 2)
      },
      Some(decisionTreeOracleSql)),

    // K-FOLD CROSS-VALIDATION MODEL SWEEP — the model-selection layer
    // over the trainable classifier family: deterministic md5 folds
    // (k=2), each model trained on the out-fold and scored on the
    // held-out fold, emitting (model, fold, n_eval, n_correct). Folds
    // by hash = the leakage-free split discipline (q-split family);
    // the oracle replays BOTH folds' FULL trainings (Naive Bayes
    // counts→grid→priors→argmax and the two-level tree selection) plus
    // the held-out scoring — a single wrong weight, split, or fold
    // assignment anywhere breaks the hash.
    QuerySpec("q221_cv_model_sweep",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("lab5",
            when(col("lang") === "de", 0L).when(col("lang") === "en", 1L)
              .when(col("lang") === "es", 2L).when(col("lang") === "fr", 3L)
              .otherwise(4L))
          .withColumn("lab2", when(col("lang") === "en", 1L).otherwise(0L))
          .withColumn("w", graft.functions.TextFns.tokens(col("text")))
          .withColumn("f0", expr("CAST(least(size(w) DIV 8, 63) AS BIGINT)"))
          .withColumn("f1",
            expr("CAST(least(n_chars DIV (size(w) + 1), 31) AS BIGINT)"))
          .withColumn("fold",
            conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
              .cast("long") % 2)
        def acc(preds: org.apache.spark.sql.DataFrame, truth: String,
                ev: org.apache.spark.sql.DataFrame, model: String,
                f: Int) =
          preds.join(ev.select(col("doc_id"), col(truth)), Seq("doc_id"))
            .agg(count(lit(1)).as("n_eval"),
              sum(when(col("pred_cls") === col(truth), 1L).otherwise(0L))
                .as("n_correct"))
            .select(lit(model).as("model"), lit(f.toLong).as("fold"),
              col("n_eval"), col("n_correct"))
        val parts = (0 to 1).flatMap { f =>
          val tr = docs.filter(col("fold") =!= f)
          val ev = docs.filter(col("fold") === f)
          val (m, p) = Classifier.trainNaiveBayes(tr, "doc_id", "text",
            "lab5", buckets = 64, nClasses = 5)
          val nb = acc(Classifier.predictNaiveBayes(ev, "doc_id", "text",
            m, p, 64), "lab5", ev, "naive_bayes", f)
          val nodes = Classifier.trainDecisionTree(tr, "doc_id", "lab2",
            Seq("f0", "f1"), depth = 2, nClasses = 2)
          val tree = acc(Classifier.applyTree(ev, "doc_id",
            Seq("f0", "f1"), nodes, 2), "lab2", ev, "tree", f)
          Seq(nb, tree)
        }
        parts.reduce(_.unionByName(_))
      },
      Some(cvSweepOracleSql)),

    // Graph-based ANN — the OTHER production ANN architecture next to
    // the IVF/PQ/SQ8 cell family (HNSW/NSG lineage): the NN-DESCENT
    // graph as the index (the production shape — nobody has the exact
    // N² graph at scale; q189 hash-checks the build on its own), then
    // 3 beam-search hops from the min-id entry point, exact
    // fixed-point cosine at every step so all engines walk the
    // identical path. The oracle replays the descent build AND every
    // hop as CTEs — a single frontier divergence anywhere breaks the
    // hash. (Exact-graph search equivalence is spec-proved on the
    // complete graph in SimilaritySpec.)
    QuerySpec("q188_graph_ann",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val g = operators.SimilaritySearch.knnGraphDescent(
          e, "vec_id", "embedding", degree = 6, rounds = 2)
          .select(col("src"), col("nbr"))
        operators.SimilaritySearch.graphAnnTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", g,
          k = 3, beam = 4, hops = 3)
      },
      Some(graphAnnOracleSql)),

    // NN-descent graph BUILD (Dong et al. 2011) — the scale path q188's
    // exact N² build swaps to: md5-derived bucket init (two salts,
    // ~degree+1 nodes per bucket), then 2 refinement rounds where every
    // two-hop neighbor over the symmetrized graph is proposed, scored
    // exactly, and the top-degree kept. Round work is graph-local
    // (N·(2d)² candidates) — the corpus never self-joins. The oracle
    // replays init + both rounds; one mis-kept edge anywhere breaks
    // the hash.
    QuerySpec("q189_nn_descent",
      (s, dir) => operators.SimilaritySearch.knnGraphDescent(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        degree = 6, rounds = 2),
      Some(nnDescentOracleSql)),

    // ROUND-6 CAPSTONE — the incremental curation tick, composing the
    // round's systems in one dataflow: the corpus arrives in two
    // id-ordered batches; each is admitted against the accumulated LSH
    // band-signature state (no corpus rescan), gated by the fused
    // classifier, and upserted into a VERSIONED GraftTable; the output
    // is tableDiff between the empty v1 and the final state — the
    // curated corpus as CDC inserts. One wrong admission, gate verdict,
    // version commit, or diff row anywhere breaks the hash. (The LSH
    // state accumulates EVERY batch doc's bands — the gate filters
    // what is WRITTEN, never what blocks later near-dups — so
    // admission stays ≡ the one-shot ranking the oracle computes.)
    QuerySpec("q190_incremental_curation_tick",
      (s, dir) => {
        GraftSession.tune(s)
        val docs = Tables.documents(s, dir)
          .select("doc_id", "text", "lang", "n_chars")
        val (b1, b2) = (docs.filter(col("doc_id") < 250),
          docs.filter(col("doc_id") >= 250))
        val state0 = operators.Dedup.lshBandState(
          docs.filter(col("doc_id") < 0), "doc_id", "text", 4, 12, 3)
        // b1's band table serves BOTH tick 1's probe and tick 2's
        // state — one shingle+minhash pass, not two
        val bands1 = operators.Dedup.lshBandState(
          b1, "doc_id", "text", 4, 12, 3).localCheckpoint(true)
        val adm1 = operators.Dedup.dedupIncrementLshBanded(
          b1, "doc_id", bands1, state0)
        val adm2 = operators.Dedup.dedupIncrementLsh(
          b2, "doc_id", "text", 4, 12, 3, bands1)
        val model = Classifier.syntheticModel(s, 4096, 4)
        def gated(df: org.apache.spark.sql.DataFrame) = df.join(
          Classifier.predictFused(df, "doc_id", "text", model, 4096)
            .filter(col("pred_cls") < 3).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val base = java.nio.file.Files.createTempDirectory("graft_q190_").toString
        val t = new operators.GraftTable(s, s"$base/t",
          Seq("doc_id"), "lang")
        t.createIfNotExists(org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, n_chars BIGINT, lang STRING"))
        t.upsertReplace(gated(adm1).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang")))
        t.upsertReplace(gated(adm2).select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars"), col("lang")))
        val out = operators.Relational.tableDiff(
          t.readAt(1L), t.read, Seq("doc_id"))
        val snap = out.localCheckpoint(true)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(base))
        snap
      },
      Some(s"""
        WITH $WORDS_SQL, ${ExtQueries.MINHASH_FROM_WORDS_SQL},
        lshrej AS (
          SELECT DISTINCT a.doc_id FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig
                      AND b.doc_id < a.doc_id),
        ${classifierSql("words")},
        kept AS (
          SELECT d.doc_id FROM documents d
          LEFT JOIN lshrej j ON d.doc_id = j.doc_id
          JOIN r ON r.doc_id = d.doc_id AND r.rn = 1 AND r.cls < 3
          WHERE j.doc_id IS NULL)
        SELECT doc_id, 'insert' AS change, CAST(0 AS BIGINT) AS n_changed
        FROM kept""")),

    // MULTI-ENTRY graph ANN — the small-beam recall fix over q188's
    // single min-id entry: each query seeds its walk at the
    // representative member (highest centroid-sim, smaller id on tie)
    // of its 2 nearest IVF cells (centroids = vec_id < 16), then walks
    // the same NN-descent graph. The oracle replays assignment,
    // representatives, probes, seeds, and both hops — one wrong seed or
    // frontier row anywhere breaks the hash.
    QuerySpec("q197_graph_ann_seeded",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val g = operators.SimilaritySearch.knnGraphDescent(
          e, "vec_id", "embedding", degree = 6, rounds = 2)
          .select(col("src"), col("nbr"))
        operators.SimilaritySearch.graphAnnTopKSeeded(
          e.filter(col("vec_id") < 8), e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "vec_id", g,
          nProbe = 2, k = 3, beam = 4, hops = 2)
      },
      Some(graphAnnSeededOracleSql)),

    // DSIR data selection (Xie et al. 2023) — importance-weighted
    // selection toward a TARGET corpus (here: the English slice) from
    // the raw pool, under two add-one-smoothed bag-of-hashed-ngrams
    // models; log-ratios in MILLI-BIT integer log2 (the BM25/KN
    // discipline) so the scores — and therefore the selected set —
    // hash-match across engines. Top-50 by (score, id).
    QuerySpec("q199_dsir_select",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        operators.Sampling.dsirSelect(
          docs, docs.filter(col("lang") === "en"),
          "doc_id", "text", buckets = 4096, k = 50)
      },
      Some(dsirOracleSql)),

    // TWO-LAYER HIERARCHICAL graph ANN — the HNSW layer architecture:
    // layer 1 = every 4th vector with its own exact deg-4 graph; the
    // query walks the small layer (beam 2, 2 hops from the min layer-1
    // id) and its winners seed the beam-4 walk over the NN-descent
    // full graph. The oracle replays the layer-1 graph build, both
    // layer-1 hops, the seeding, and both layer-0 hops.
    QuerySpec("q200_graph_ann_hier",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val l1 = e.filter(col("vec_id") % 4 === 0)
        val g0 = operators.SimilaritySearch.knnGraphDescent(
          e, "vec_id", "embedding", degree = 6, rounds = 2)
          .select(col("src"), col("nbr"))
        val g1 = operators.SimilaritySearch.knnGraph(
          l1, "vec_id", "embedding", degree = 4)
        operators.SimilaritySearch.graphAnnTopKHier(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
          g0, g1, l1.select("vec_id"),
          k = 3, beam1 = 2, hops1 = 2, beam = 4, hops = 2)
      },
      Some(graphAnnHierOracleSql)),

    // LATE-INTERACTION re-rank (ColBERT MaxSim) — the rerank tier of
    // the retrieval ladder: a cosine top-10 shortlist re-scored by
    // sum-of-max sub-vector dots (the 64-dim embedding as 8 token
    // vectors of 8 dims), exact fixed-point everywhere. The oracle
    // replays the shortlist AND every (qi, dj) sub-dot.
    QuerySpec("q206_late_interaction",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = e.filter(col("vec_id") < 8)
        val short = operators.SimilaritySearch.bruteForceTopK(
          q, e, "vec_id", "embedding", k = 10).select("qid", "nid")
        operators.SimilaritySearch.lateInteractionRerank(
          q, e, short, "vec_id", "embedding", m = 8, subDim = 8, k = 3)
      },
      Some("""
        WITH n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        el AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid,
            UNNEST(q.embedding) AS x, UNNEST(e.embedding) AS y
          FROM embeddings q, embeddings e
          WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id),
        dots AS (
          SELECT qid, nid,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id),
        short AS (
          SELECT qid, nid FROM (
            SELECT qid, nid,
              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM sims) x WHERE rn <= 10),
        sd AS (
          SELECT s.qid, s.nid, qi, dj,
            CAST(SUM(CAST(floor(
              CAST(q.embedding[CAST(qi * 8 + t + 1 AS INTEGER)] AS DOUBLE)
              * CAST(d.embedding[CAST(dj * 8 + t + 1 AS INTEGER)] AS DOUBLE)
              * 1000000000.0) AS BIGINT)) AS BIGINT) AS sdot
          FROM short s
          JOIN embeddings q ON q.vec_id = s.qid
          JOIN embeddings d ON d.vec_id = s.nid,
            UNNEST(range(0, 8)) AS a(qi), UNNEST(range(0, 8)) AS b(dj),
            UNNEST(range(0, 8)) AS c(t)
          GROUP BY 1, 2, 3, 4),
        mx AS (
          SELECT qid, nid, qi, max(sdot) AS mx FROM sd GROUP BY 1, 2, 3),
        sc AS (
          SELECT qid, nid, CAST(SUM(mx) AS BIGINT) AS li_score
          FROM mx GROUP BY 1, 2)
        SELECT qid, nid, li_score, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid
                ORDER BY li_score DESC, nid) AS rn
              FROM sc) r
        WHERE rn <= 3"""))
  )



  /** DuckDB fragment: exact fixed-point cosine over ALL embedding pairs
    * INCLUDING self (sim(v,v) pins an indexed query to its own
    * neighborhood during graph walks), ending in `allsims(qid, nid,
    * sim)`. Shared by the q188 and q189 oracles. No leading WITH.
    */
  // lazy: `all` (declared first) forces the oracle lazy vals during
  // object init, before later plain vals would be assigned
  private[graft] lazy val ALLSIMS_SQL = """n2a AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        ap AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
            a.embedding AS qe, b.embedding AS ne
          FROM embeddings a, embeddings b),
        ael AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM ap),
        adots AS (
          SELECT qid, nid,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ael GROUP BY 1, 2),
        allsims AS MATERIALIZED (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          FROM adots JOIN n2a a ON qid = a.vec_id JOIN n2a b ON nid = b.vec_id)"""

  /** DuckDB replay of the q188 chain: NN-descent build
    * ([[NND_EDGES_SQL]]) + [[operators.SimilaritySearch.graphAnnTopK]]
    * (beam 4, 3 hops, k 3, queries vec_id < 8). `allsims` includes
    * self-pairs (sim 1.0 pins an indexed query to its own neighborhood
    * during the walk; excluded only from the final ranking). Hop CTEs
    * are hc/f-prefixed — c1/c2 belong to the descent fragment.
    */
  private[graft] lazy val graphAnnOracleSql: String = {
    val hops = (1 to 3).map { h => s"""
        hc$h AS (
          SELECT DISTINCT qid, nid FROM (
            SELECT f.qid, g.nbr AS nid FROM f${h - 1} f JOIN g ON f.nid = g.src
            UNION ALL SELECT qid, nid FROM f${h - 1}) u),
        f$h AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT c.qid, c.nid, s.sim,
              row_number() OVER (PARTITION BY c.qid ORDER BY s.sim DESC, c.nid) AS rn
            FROM hc$h c JOIN allsims s ON s.qid = c.qid AND s.nid = c.nid) x
          WHERE rn <= 4),"""
    }.mkString
    s"""
        WITH $ALLSIMS_SQL,
        $NND_EDGES_SQL,
        g AS (SELECT src, nbr FROM e2),
        ent AS (SELECT min(vec_id) AS nid FROM embeddings),
        f0 AS (
          SELECT s.qid, s.nid, s.sim FROM allsims s JOIN ent e ON s.nid = e.nid
          WHERE s.qid < 8),
        $hops
        r AS (
          SELECT qid, nid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM f3 WHERE qid <> nid)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= 3"""
  }

  /** DuckDB replay of [[operators.SimilaritySearch.knnGraphDescent]]
    * (degree 6, 2 rounds) — the q189 oracle: bucket init (salts 0/1,
    * bucket count = ⌊N/7⌋), per-round symmetrize → two-hop propose →
    * exact-score → keep top-degree, final re-rank for output.
    */
  /** DuckDB fragment: the NN-descent edge table (degree 6, 2 rounds,
    * bucket init with salts 0/1 at ⌊N/7⌋ buckets), ending in
    * `e2(src, nbr)`. Consumes `allsims`. Shared by the q188 (search
    * through the descent graph) and q189 (the build itself) oracles.
    * No leading WITH.
    */
  private[graft] lazy val NND_EDGES_SQL: String = {
    val rounds = (1 to 2).map { r => s"""
        s$r AS (SELECT src, nbr FROM e${r - 1}
                UNION SELECT nbr, src FROM e${r - 1}),
        c$r AS (
          SELECT DISTINCT src, nbr FROM (
            SELECT a.src, b.nbr FROM s$r a JOIN s$r b ON a.nbr = b.src
            WHERE b.nbr <> a.src
            UNION ALL SELECT src, nbr FROM e${r - 1}) u),
        e$r AS MATERIALIZED (
          SELECT src, nbr FROM (
            SELECT c.src, c.nbr,
              row_number() OVER (PARTITION BY c.src ORDER BY s.sim DESC, c.nbr) AS rn
            FROM c$r c JOIN allsims s ON s.qid = c.src AND s.nid = c.nbr) x
          WHERE rn <= 6),"""
    }.mkString
    s"""bkt AS (
          SELECT vec_id AS id, s,
            CAST(concat('0x', substr(md5('nnd' || CAST(s AS VARCHAR) || ':'
              || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % (SELECT greatest(count(*) // 7, 1) FROM embeddings) AS b
          FROM embeddings, UNNEST(range(0, 2)) AS t(s)),
        i0 AS (
          SELECT DISTINCT a.id AS src, bb.id AS nbr
          FROM bkt a JOIN bkt bb ON a.s = bb.s AND a.b = bb.b AND a.id <> bb.id),
        e0 AS MATERIALIZED (
          SELECT src, nbr FROM (
            SELECT c.src, c.nbr,
              row_number() OVER (PARTITION BY c.src ORDER BY s.sim DESC, c.nbr) AS rn
            FROM i0 c JOIN allsims s ON s.qid = c.src AND s.nid = c.nbr) x
          WHERE rn <= 6),
        ${rounds.stripSuffix(",")}"""
  }

  /** DuckDB replay of [[operators.SimilaritySearch.graphAnnTopKSeeded]]
    * (centroids vec_id < 16, nProbe 2, beam 4, 2 hops, k 3, queries
    * vec_id < 8) through the NN-descent graph — the q197 oracle.
    * Centroid sims come straight from `allsims` (centroids ARE corpus
    * vectors here); `casgn` ranks each vector's centroids, `cells` is
    * the winning assignment, `reps` the per-cell representative, and
    * the hop CTEs mirror the q188 walk from the seed frontier.
    */
  private[graft] lazy val graphAnnSeededOracleSql: String = {
    val hops = (1 to 2).map { h => s"""
        hc$h AS (
          SELECT DISTINCT qid, nid FROM (
            SELECT f.qid, g.nbr AS nid FROM f${h - 1} f JOIN g ON f.nid = g.src
            UNION ALL SELECT qid, nid FROM f${h - 1}) u),
        f$h AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT c.qid, c.nid, s.sim,
              row_number() OVER (PARTITION BY c.qid ORDER BY s.sim DESC, c.nid) AS rn
            FROM hc$h c JOIN allsims s ON s.qid = c.qid AND s.nid = c.nid) x
          WHERE rn <= 4),"""
    }.mkString
    s"""
        WITH $ALLSIMS_SQL,
        $NND_EDGES_SQL,
        g AS (SELECT src, nbr FROM e2),
        casgn AS (
          SELECT qid AS v, nid AS cid, sim AS csim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM allsims WHERE nid < 16),
        cells AS (SELECT v, cid, csim FROM casgn WHERE rn = 1),
        reps AS (
          SELECT cid, v AS nid FROM (
            SELECT cid, v,
              row_number() OVER (PARTITION BY cid ORDER BY csim DESC, v) AS rn2
            FROM cells) x WHERE rn2 = 1),
        probes AS (SELECT v AS qid, cid FROM casgn WHERE rn <= 2 AND v < 8),
        seeds AS (
          SELECT DISTINCT p.qid, r.nid FROM probes p JOIN reps r ON p.cid = r.cid),
        f0 AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT s.qid, s.nid, a.sim,
              row_number() OVER (PARTITION BY s.qid ORDER BY a.sim DESC, s.nid) AS rn
            FROM seeds s JOIN allsims a ON a.qid = s.qid AND a.nid = s.nid) x
          WHERE rn <= 4),
        $hops
        r AS (
          SELECT qid, nid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM f2 WHERE qid <> nid)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= 3"""
  }

  /** DuckDB replay of [[operators.Classifier.trainNaiveBayes]] +
    * [[operators.Classifier.predictNaiveBayes]] (B=64, C=5, language
    * labels) — the q219 oracle: hashed uni+bigram feature counts, the
    * add-one-smoothed milli-bit weight grid + priors, per-doc scores,
    * argmax with margin.
    */
  private[graft] lazy val naiveBayesOracleSql: String = {
    def mlog2(x: String) =
      s"(CAST(length(bin($x)) - 1 AS BIGINT) * 1000 + (($x - (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1)))"
    s"""
        WITH $WORDS_SQL,
        lab AS (
          SELECT doc_id, CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
            WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END AS lab
          FROM documents),
        puni AS (SELECT doc_id, UNNEST(w) AS f FROM words),
        pbi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM words, UNNEST(range(1, len(w))) AS t(i)),
        pfb AS MATERIALIZED (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % 64 AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, f FROM puni
                UNION ALL SELECT doc_id, f FROM pbi) ff
          GROUP BY 1, 2),
        fc AS (
          SELECT l.lab AS cls, p.bucket, CAST(SUM(p.cnt) AS BIGINT) AS fc
          FROM pfb p JOIN lab l USING (doc_id) GROUP BY 1, 2),
        tt AS (SELECT cls, CAST(SUM(fc) AS BIGINT) AS tot FROM fc GROUP BY 1),
        grid AS (
          SELECT CAST(b.range AS BIGINT) AS bucket, CAST(c.range AS BIGINT) AS cls
          FROM range(64) b, range(5) c),
        fcg AS (
          SELECT g.bucket, g.cls, COALESCE(fc.fc, 0) + 1 AS fc1,
            COALESCE(tt.tot, 0) + 64 AS totb
          FROM grid g LEFT JOIN fc ON g.bucket = fc.bucket AND g.cls = fc.cls
                      LEFT JOIN tt ON g.cls = tt.cls),
        mdl AS MATERIALIZED (
          SELECT bucket, cls,
            ${mlog2("fc1")} - ${mlog2("totb")} AS w
          FROM fcg),
        pcn AS (
          SELECT CAST(c.range AS BIGINT) AS cls,
            COALESCE(pc.nc, 0) + 1 AS nc1, nn.nn + 5 AS nnc
          FROM range(5) c
          LEFT JOIN (SELECT lab AS cls, CAST(count(*) AS BIGINT) AS nc
                     FROM lab GROUP BY 1) pc ON c.range = pc.cls
          CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS nn FROM lab) nn),
        pri AS (
          SELECT cls, ${mlog2("nc1")} - ${mlog2("nnc")} AS prior FROM pcn),
        sc AS (
          SELECT p.doc_id, m.cls, CAST(SUM(p.cnt * m.w) AS BIGINT) AS lk
          FROM pfb p JOIN mdl m USING (bucket) GROUP BY 1, 2),
        scp AS (
          SELECT s.doc_id, s.cls, s.lk + r.prior AS score
          FROM sc s JOIN pri r USING (cls)),
        rk AS (
          SELECT doc_id, cls, score,
            row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
          FROM scp)
        SELECT a.doc_id, a.cls AS pred_cls, CAST(a.score AS BIGINT) AS best_score,
          CAST(a.score - b.score AS BIGINT) AS margin
        FROM rk a JOIN rk b ON a.doc_id = b.doc_id AND b.rn = 2
        WHERE a.rn = 1"""
  }

  /** DuckDB replay of the q221 cross-validation sweep: per fold f ∈
    * {0, 1}, the FULL Naive-Bayes fit (counts → smoothed grid → priors)
    * on fold≠f and its argmax scoring on fold=f, plus the FULL
    * two-level decision-tree selection on fold≠f with the held-out
    * routing — folded into per-model accuracy rows.
    */
  private[graft] lazy val cvSweepOracleSql: String = {
    def mlog2(x: String) =
      s"(CAST(length(bin($x)) - 1 AS BIGINT) * 1000 + (($x - (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1)))"
    def nb(f: Int) = s"""
        fcn$f AS (
          SELECT m.lab5 AS cls, p.bucket, CAST(SUM(p.cnt) AS BIGINT) AS fc
          FROM pfb p JOIN meta m USING (doc_id)
          WHERE m.fold <> $f GROUP BY 1, 2),
        ttn$f AS (SELECT cls, CAST(SUM(fc) AS BIGINT) AS tot FROM fcn$f GROUP BY 1),
        mgn$f AS (
          SELECT g.bucket, g.cls, COALESCE(fc.fc, 0) + 1 AS fc1,
            COALESCE(tt.tot, 0) + 64 AS totb
          FROM grid g LEFT JOIN fcn$f fc ON g.bucket = fc.bucket AND g.cls = fc.cls
                      LEFT JOIN ttn$f tt ON g.cls = tt.cls),
        mdn$f AS MATERIALIZED (
          SELECT bucket, cls, ${mlog2("fc1")} - ${mlog2("totb")} AS w FROM mgn$f),
        pcn$f AS (
          SELECT CAST(c.range AS BIGINT) AS cls,
            COALESCE(pc.nc, 0) + 1 AS nc1, nn.nn + 5 AS nnc
          FROM range(5) c
          LEFT JOIN (SELECT lab5 AS cls, CAST(count(*) AS BIGINT) AS nc
                     FROM meta WHERE fold <> $f GROUP BY 1) pc ON c.range = pc.cls
          CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS nn
                      FROM meta WHERE fold <> $f) nn),
        prin$f AS (SELECT cls, ${mlog2("nc1")} - ${mlog2("nnc")} AS prior FROM pcn$f),
        scn$f AS (
          SELECT p.doc_id, d.cls, CAST(SUM(p.cnt * d.w) AS BIGINT) AS lk
          FROM pfb p JOIN mdn$f d USING (bucket) JOIN meta m USING (doc_id)
          WHERE m.fold = $f GROUP BY 1, 2),
        scpn$f AS (
          SELECT s.doc_id, s.cls, s.lk + r.prior AS score
          FROM scn$f s JOIN prin$f r USING (cls)),
        prdn$f AS (
          SELECT doc_id, cls AS pred FROM (
            SELECT doc_id, cls,
              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
            FROM scpn$f) z WHERE rn = 1),
        accn$f AS (
          SELECT 'naive_bayes' AS model, CAST($f AS BIGINT) AS fold,
            CAST(count(*) AS BIGINT) AS n_eval,
            CAST(SUM(CASE WHEN p.pred = m.lab5 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_correct
          FROM prdn$f p JOIN meta m USING (doc_id)),"""
    def treeLvl(f: Int, x: Int) = s"""
        l${x}t$f AS (SELECT node, lab, 0 AS fi, f0 AS v FROM a${x}t$f
                UNION ALL SELECT node, lab, 1 AS fi, f1 FROM a${x}t$f),
        c${x}t$f AS (SELECT node, fi, v, lab, CAST(count(*) AS BIGINT) AS c
                FROM l${x}t$f GROUP BY 1, 2, 3, 4),
        t${x}t$f AS (SELECT node, fi, lab, CAST(SUM(c) AS BIGINT) AS tc
                FROM c${x}t$f GROUP BY 1, 2, 3),
        d${x}t$f AS (SELECT DISTINCT node, fi, v FROM c${x}t$f),
        u${x}t$f AS (
          SELECT d.node, d.fi, d.v, t.lab, t.tc,
            CAST(COALESCE(SUM(s.c), 0) AS BIGINT) AS cc
          FROM d${x}t$f d JOIN t${x}t$f t ON d.node = t.node AND d.fi = t.fi
          LEFT JOIN c${x}t$f s ON s.node = d.node AND s.fi = d.fi
            AND s.lab = t.lab AND s.v <= d.v
          GROUP BY 1, 2, 3, 4, 5),
        s${x}t$f AS (
          SELECT node, fi, v,
            CAST(SUM(cc) AS BIGINT) AS nl, CAST(SUM(cc * cc) AS BIGINT) AS al,
            CAST(SUM(tc - cc) AS BIGINT) AS nr,
            CAST(SUM((tc - cc) * (tc - cc)) AS BIGINT) AS ar
          FROM u${x}t$f GROUP BY 1, 2, 3),
        g${x}t$f AS (
          SELECT node, fi, v, al * 1000 // nl + ar * 1000 // nr AS score
          FROM s${x}t$f WHERE nr > 0),
        b${x}t$f AS (
          SELECT node, fi AS bfi, v AS bthr FROM (
            SELECT node, fi, v,
              row_number() OVER (PARTITION BY node ORDER BY score DESC, fi, v) AS rn
            FROM g${x}t$f) z WHERE rn = 1),
        a${x + 1}t$f AS MATERIALIZED (
          SELECT a.doc_id, a.lab, a.f0, a.f1,
            CASE WHEN b.node IS NULL THEN a.node
                 ELSE a.node * 2 + CASE WHEN (CASE WHEN b.bfi = 0 THEN a.f0
                                              ELSE a.f1 END) > b.bthr
                                   THEN 1 ELSE 0 END
            END AS node
          FROM a${x}t$f a LEFT JOIN b${x}t$f b ON a.node = b.node),"""
    def route(f: Int, x: Int) = s"""
        e${x + 1}t$f AS (
          SELECT e.doc_id, e.lab, e.f0, e.f1,
            CASE WHEN b.node IS NULL THEN e.node
                 ELSE e.node * 2 + CASE WHEN (CASE WHEN b.bfi = 0 THEN e.f0
                                              ELSE e.f1 END) > b.bthr
                                   THEN 1 ELSE 0 END
            END AS node
          FROM e${x}t$f e LEFT JOIN b${x}t$f b ON e.node = b.node),"""
    def tree(f: Int) = s"""
        a1t$f AS (
          SELECT doc_id, lab2 AS lab, f0, f1, CAST(1 AS BIGINT) AS node
          FROM meta WHERE fold <> $f),
        ${treeLvl(f, 1)}
        ${treeLvl(f, 2)}
        lvt$f AS (SELECT node, lab, CAST(count(*) AS BIGINT) AS c
                  FROM a3t$f GROUP BY 1, 2),
        prt$f AS (SELECT node, lab AS pred FROM (
          SELECT node, lab,
            row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
          FROM lvt$f) z WHERE rn = 1),
        e1t$f AS (
          SELECT doc_id, lab2 AS lab, f0, f1, CAST(1 AS BIGINT) AS node
          FROM meta WHERE fold = $f),
        ${route(f, 1)}
        ${route(f, 2)}
        acct$f AS (
          SELECT 'tree' AS model, CAST($f AS BIGINT) AS fold,
            CAST(count(*) AS BIGINT) AS n_eval,
            CAST(SUM(CASE WHEN p.pred = e.lab THEN 1 ELSE 0 END) AS BIGINT)
              AS n_correct
          FROM e3t$f e JOIN prt$f p ON e.node = p.node),"""
    s"""
        WITH $WORDS_SQL,
        meta AS MATERIALIZED (
          SELECT doc_id,
            CAST(CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
              WHEN 'fr' THEN 3 ELSE 4 END AS BIGINT) AS lab5,
            CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS lab2,
            CAST(least(len(w) // 8, 63) AS BIGINT) AS f0,
            CAST(least(n_chars // (len(w) + 1), 31) AS BIGINT) AS f1,
            CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS fold
          FROM words),
        puni AS (SELECT doc_id, UNNEST(w) AS f FROM words),
        pbi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM words, UNNEST(range(1, len(w))) AS t(i)),
        pfb AS MATERIALIZED (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % 64 AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, f FROM puni
                UNION ALL SELECT doc_id, f FROM pbi) ff
          GROUP BY 1, 2),
        grid AS (
          SELECT CAST(b.range AS BIGINT) AS bucket, CAST(c.range AS BIGINT) AS cls
          FROM range(64) b, range(5) c),
        ${nb(0)}
        ${tree(0)}
        ${nb(1)}
        ${tree(1).stripSuffix(",")}
        SELECT * FROM accn0 UNION ALL SELECT * FROM acct0
        UNION ALL SELECT * FROM accn1 UNION ALL SELECT * FROM acct1"""
  }

  /** DuckDB replay of [[operators.Classifier.trainDecisionTree]] +
    * [[operators.Classifier.applyTree]] (depth 2, binary labels,
    * features f0 = token-count bin, f1 = chars-per-token bin) — the
    * q220 oracle. Each level x: long-format feature values, (node,
    * feature, value, class) counts, left-cumulative counts against the
    * full class list, milli-Gini scores with non-negative floor
    * divisions, per-node argmax (score desc, feature asc, value asc),
    * and the heap-indexed reassignment. Leaves take the majority label
    * with ties to the smaller class.
    */
  private[graft] lazy val decisionTreeOracleSql: String = {
    def lvl(x: Int) = s"""
        l$x AS (SELECT node, lab, 0 AS fi, f0 AS v FROM a$x
                UNION ALL SELECT node, lab, 1 AS fi, f1 FROM a$x),
        c$x AS (SELECT node, fi, v, lab, CAST(count(*) AS BIGINT) AS c
                FROM l$x GROUP BY 1, 2, 3, 4),
        t$x AS (SELECT node, fi, lab, CAST(SUM(c) AS BIGINT) AS tc
                FROM c$x GROUP BY 1, 2, 3),
        d$x AS (SELECT DISTINCT node, fi, v FROM c$x),
        u$x AS (
          SELECT d.node, d.fi, d.v, t.lab, t.tc,
            CAST(COALESCE(SUM(s.c), 0) AS BIGINT) AS cc
          FROM d$x d JOIN t$x t ON d.node = t.node AND d.fi = t.fi
          LEFT JOIN c$x s ON s.node = d.node AND s.fi = d.fi
            AND s.lab = t.lab AND s.v <= d.v
          GROUP BY 1, 2, 3, 4, 5),
        s$x AS (
          SELECT node, fi, v,
            CAST(SUM(cc) AS BIGINT) AS nl, CAST(SUM(cc * cc) AS BIGINT) AS al,
            CAST(SUM(tc - cc) AS BIGINT) AS nr,
            CAST(SUM((tc - cc) * (tc - cc)) AS BIGINT) AS ar
          FROM u$x GROUP BY 1, 2, 3),
        g$x AS (
          SELECT node, fi, v, al * 1000 // nl + ar * 1000 // nr AS score
          FROM s$x WHERE nr > 0),
        b$x AS (
          SELECT node, fi AS bfi, v AS bthr FROM (
            SELECT node, fi, v,
              row_number() OVER (PARTITION BY node ORDER BY score DESC, fi, v) AS rn
            FROM g$x) z WHERE rn = 1),
        a${x + 1} AS MATERIALIZED (
          SELECT a.doc_id, a.lab, a.f0, a.f1,
            CASE WHEN b.node IS NULL THEN a.node
                 ELSE a.node * 2 + CASE WHEN (CASE WHEN b.bfi = 0 THEN a.f0
                                              ELSE a.f1 END) > b.bthr
                                   THEN 1 ELSE 0 END
            END AS node
          FROM a$x a LEFT JOIN b$x b ON a.node = b.node),"""
    s"""
        WITH $WORDS_SQL,
        a1 AS (
          SELECT doc_id,
            CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS lab,
            CAST(least(len(w) // 8, 63) AS BIGINT) AS f0,
            CAST(least(n_chars // (len(w) + 1), 31) AS BIGINT) AS f1,
            CAST(1 AS BIGINT) AS node
          FROM words),
        ${lvl(1)}
        ${lvl(2)}
        lv AS (SELECT node, lab, CAST(count(*) AS BIGINT) AS c
               FROM a3 GROUP BY 1, 2),
        pr AS (SELECT node, lab AS pred FROM (
          SELECT node, lab,
            row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
          FROM lv) z WHERE rn = 1)
        SELECT a.doc_id, a.node AS leaf, p.pred AS pred_cls
        FROM a3 a JOIN pr p ON a.node = p.node"""
  }

  /** DuckDB replay of [[operators.Sampling.dsirSelect]] (buckets 4096,
    * target = lang 'en', k = 50) — the q199 oracle: hashed uni+bigram
    * feature counts (the perceptron-oracle feature chain at B=4096),
    * add-one-smoothed per-bucket counts over the full grid, milli-bit
    * integer log2 ratios, per-doc weighted sums, top-50.
    */
  private[graft] lazy val dsirOracleSql: String = {
    def mlog2(x: String) =
      s"((length(bin($x)) - 1) * 1000 + (($x - (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1))) * 1000) // (CAST(1 AS BIGINT) << " +
        s"(length(bin($x)) - 1)))"
    s"""
        WITH $WORDS_SQL,
        puni AS (SELECT doc_id, UNNEST(w) AS f FROM words),
        pbi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM words, UNNEST(range(1, len(w))) AS t(i)),
        feats AS MATERIALIZED (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % 4096 AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, f FROM puni
                UNION ALL SELECT doc_id, f FROM pbi) ff
          GROUP BY 1, 2),
        craw AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS c FROM feats GROUP BY 1),
        ctgt AS (
          SELECT f.bucket, CAST(SUM(f.cnt) AS BIGINT) AS c
          FROM feats f JOIN documents d ON f.doc_id = d.doc_id
          WHERE d.lang = 'en' GROUP BY 1),
        st AS (
          SELECT CAST(g.range AS BIGINT) AS bucket,
            COALESCE(t.c, 0) + 1 AS ct, COALESCE(r.c, 0) + 1 AS cr
          FROM range(0, 4096) g
          LEFT JOIN ctgt t ON g.range = t.bucket
          LEFT JOIN craw r ON g.range = r.bucket),
        tots AS (
          SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cr) AS BIGINT) AS nr
          FROM st),
        sc AS (
          SELECT bucket,
            ${mlog2("ct")} - ${mlog2("cr")} - ${mlog2("nt")} + ${mlog2("nr")} AS s_mb
          FROM st, tots),
        ds AS (
          SELECT f.doc_id, CAST(SUM(f.cnt * s.s_mb) AS BIGINT) AS dsir_mb,
            CAST(SUM(f.cnt) AS BIGINT) AS n_feat
          FROM feats f JOIN sc s ON f.bucket = s.bucket
          GROUP BY 1)
        SELECT doc_id, dsir_mb, n_feat, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (ORDER BY dsir_mb DESC, doc_id) AS rn
              FROM ds) r
        WHERE rn <= 50"""
  }

  /** DuckDB replay of [[operators.SimilaritySearch.graphAnnTopKHier]]
    * (layer 1 = vec_id % 4 = 0 with an exact deg-4 graph, beam1 2 /
    * hops1 2 from min layer-1 id; layer 0 = NN-descent graph, beam 4 /
    * hops 2, k 3, queries vec_id < 8) — the q200 oracle. u-prefixed
    * CTEs are the layer-1 walk; hc/f the layer-0 walk.
    */
  private[graft] lazy val graphAnnHierOracleSql: String = {
    val l1hops = (1 to 2).map { h => s"""
        uc$h AS (
          SELECT DISTINCT qid, nid FROM (
            SELECT f.qid, g1.nbr AS nid FROM uf${h - 1} f JOIN l1s g1 ON f.nid = g1.src
            UNION ALL SELECT qid, nid FROM uf${h - 1}) u),
        uf$h AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT c.qid, c.nid, s.sim,
              row_number() OVER (PARTITION BY c.qid ORDER BY s.sim DESC, c.nid) AS rn
            FROM uc$h c JOIN allsims s ON s.qid = c.qid AND s.nid = c.nid) x
          WHERE rn <= 2),"""
    }.mkString
    val l0hops = (1 to 2).map { h => s"""
        hc$h AS (
          SELECT DISTINCT qid, nid FROM (
            SELECT f.qid, g.nbr AS nid FROM f${h - 1} f JOIN g ON f.nid = g.src
            UNION ALL SELECT qid, nid FROM f${h - 1}) u),
        f$h AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT c.qid, c.nid, s.sim,
              row_number() OVER (PARTITION BY c.qid ORDER BY s.sim DESC, c.nid) AS rn
            FROM hc$h c JOIN allsims s ON s.qid = c.qid AND s.nid = c.nid) x
          WHERE rn <= 4),"""
    }.mkString
    s"""
        WITH $ALLSIMS_SQL,
        $NND_EDGES_SQL,
        g AS (SELECT src, nbr FROM e2),
        l1 AS (SELECT vec_id AS id FROM embeddings WHERE vec_id % 4 = 0),
        l1s AS (
          SELECT qid AS src, nid AS nbr FROM (
            SELECT s.qid, s.nid,
              row_number() OVER (PARTITION BY s.qid ORDER BY s.sim DESC, s.nid) AS rn
            FROM allsims s JOIN l1 a ON s.qid = a.id JOIN l1 b ON s.nid = b.id
            WHERE s.qid <> s.nid) x WHERE rn <= 4),
        ent1 AS (SELECT min(id) AS nid FROM l1),
        uf0 AS (
          SELECT s.qid, s.nid, s.sim FROM allsims s JOIN ent1 e ON s.nid = e.nid
          WHERE s.qid < 8),
        $l1hops
        l1res AS (
          SELECT qid, nid FROM (
            SELECT qid, nid,
              row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM uf2 WHERE qid <> nid) x WHERE rn <= 2),
        f0 AS MATERIALIZED (
          SELECT qid, nid, sim FROM (
            SELECT c.qid, c.nid, s.sim,
              row_number() OVER (PARTITION BY c.qid ORDER BY s.sim DESC, c.nid) AS rn
            FROM l1res c JOIN allsims s ON s.qid = c.qid AND s.nid = c.nid) x
          WHERE rn <= 4),
        $l0hops
        r AS (
          SELECT qid, nid, sim,
            row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
          FROM f2 WHERE qid <> nid)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank FROM r WHERE rn <= 3"""
  }

  private[graft] lazy val nnDescentOracleSql: String = s"""
        WITH $ALLSIMS_SQL,
        $NND_EDGES_SQL,
        fin AS (
          SELECT c.src, c.nbr, s.sim,
            row_number() OVER (PARTITION BY c.src ORDER BY s.sim DESC, c.nbr) AS rn
          FROM e2 c JOIN allsims s ON s.qid = c.src AND s.nid = c.nbr)
        SELECT src, nbr, sim, CAST(rn AS INTEGER) AS rank
        FROM fin WHERE rn <= 6"""

  /** DuckDB replay of [[Classifier.trainPerceptron]] (B=64, C=5, 3
    * rounds, labels = alphabetic language index) followed by scoring
    * with the summed snapshot weights — the q185 oracle. Each round is
    * a materialized CTE quartet (score, predict, misclassify, delta)
    * exactly mirroring the engine's staged round barrier.
    */
  private[graft] lazy val perceptronOracleSql: String = {
    val rounds = (1 to 3).map { r => s"""
        s$r AS (
          SELECT f.doc_id, w.cls, CAST(sum(f.cnt * w.w) AS BIGINT) AS score
          FROM pfb f JOIN w${r - 1} w USING (bucket) GROUP BY 1, 2),
        p$r AS (
          SELECT doc_id, cls AS pred FROM (
            SELECT doc_id, cls,
              row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
            FROM s$r) x WHERE rn = 1),
        m$r AS (
          SELECT p.doc_id, p.pred, l.lab
          FROM p$r p JOIN lab l USING (doc_id) WHERE p.pred <> l.lab),
        d$r AS (
          SELECT bucket, cls, CAST(sum(dw) AS BIGINT) AS dw FROM (
            SELECT f.bucket, m.lab AS cls, f.cnt AS dw
            FROM pfb f JOIN m$r m USING (doc_id)
            UNION ALL
            SELECT f.bucket, m.pred AS cls, -f.cnt AS dw
            FROM pfb f JOIN m$r m USING (doc_id)) u
          GROUP BY 1, 2),
        w$r AS MATERIALIZED (
          SELECT w.bucket, w.cls, w.w + COALESCE(d.dw, 0) AS w
          FROM w${r - 1} w LEFT JOIN d$r d USING (bucket, cls)),"""
    }.mkString
    s"""
        WITH $WORDS_SQL,
        lab AS (
          SELECT doc_id, CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
            WHEN 'es' THEN 2 WHEN 'fr' THEN 3 ELSE 4 END AS lab
          FROM documents),
        puni AS (SELECT doc_id, UNNEST(w) AS f FROM words),
        pbi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM words, UNNEST(range(1, len(w))) AS t(i)),
        pfb AS MATERIALIZED (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % 64 AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
          FROM (SELECT doc_id, f FROM puni
                UNION ALL SELECT doc_id, f FROM pbi) ff
          GROUP BY 1, 2),
        w0 AS (
          SELECT CAST(b.range AS BIGINT) AS bucket,
            CAST(c.range AS BIGINT) AS cls, CAST(0 AS BIGINT) AS w
          FROM range(0, 64) b, range(0, 5) c),
        $rounds
        wsum AS MATERIALIZED (
          SELECT bucket, cls, CAST(sum(w) AS BIGINT) AS w
          FROM (SELECT * FROM w1 UNION ALL SELECT * FROM w2
                UNION ALL SELECT * FROM w3) ws
          GROUP BY 1, 2),
        fsc AS (
          SELECT f.doc_id, w.cls, CAST(sum(f.cnt * w.w) AS BIGINT) AS score
          FROM pfb f JOIN wsum w USING (bucket) GROUP BY 1, 2),
        fr AS (
          SELECT doc_id, cls, score,
            row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
          FROM fsc)
        SELECT a.doc_id, a.cls AS pred_cls, a.score AS best_score,
          a.score - b.score AS margin
        FROM fr a JOIN fr b ON a.doc_id = b.doc_id AND a.rn = 1 AND b.rn = 2"""
  }

  /** DuckDB replay of [[operators.WordPiece.wordPieceSegment]] at
    * vExtra=24, maxPieceLen=4, maxWordLen=16 — full "WITH …" text
    * (vocab selection + all 16 greedy rounds + rollup). Shared by q159
    * and the q174 bake-off.
    */
  private[graft] lazy val wordPieceOracleSql: String = {

        val rounds = (1 to 16).map { r =>
          s"""
        s$r AS MATERIALIZED (
          SELECT word, pos, np, cuts FROM s${r - 1} WHERE pos = length(word)
          UNION ALL
          SELECT s.word, max(e.k) AS pos, s.np + 1 AS np,
            s.cuts + (CAST(1 AS BIGINT) << max(e.k)) AS cuts
          FROM s${r - 1} s JOIN eg e ON s.word = e.word AND e.j = s.pos
          WHERE s.pos < length(s.word)
          GROUP BY s.word, s.np, s.cuts)"""
        }.mkString(",")
        s"""
        WITH $WORDS_SQL,
        wt AS MATERIALIZED (
          SELECT word, CAST(count(*) AS BIGINT) AS wc FROM (
            SELECT UNNEST(w) AS word FROM words) x
          WHERE length(word) <= 16 GROUP BY 1),
        pr AS MATERIALIZED (
          SELECT substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
            s > 1 AS is_cont, sum(wc) AS cnt
          FROM wt, UNNEST(range(1, length(word) + 1)) AS ts(s),
            UNNEST(range(1, 5)) AS tl(l)
          WHERE s + l - 1 <= length(word)
          GROUP BY 1, 2),
        vmu AS (
          SELECT piece, is_cont FROM pr WHERE length(piece) >= 2
          ORDER BY cnt DESC, is_cont ASC, piece LIMIT 24),
        voc AS MATERIALIZED (
          SELECT piece, is_cont FROM pr WHERE length(piece) = 1
          UNION ALL SELECT piece, is_cont FROM vmu),
        eg AS MATERIALIZED (
          SELECT e.word, e.j, e.k FROM (
            SELECT word, s - 1 AS j, s + l - 1 AS k,
              substr(word, CAST(s AS INTEGER), CAST(l AS INTEGER)) AS piece,
              s > 1 AS is_cont
            FROM wt, UNNEST(range(1, length(word) + 1)) AS ts(s),
              UNNEST(range(1, 5)) AS tl(l)
            WHERE s + l - 1 <= length(word)) e
          JOIN voc ON e.piece = voc.piece AND e.is_cont = voc.is_cont),
        s0 AS MATERIALIZED (
          SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS np,
            CAST(0 AS BIGINT) AS cuts FROM wt),
        $rounds,
        tok AS (SELECT doc_id, UNNEST(w) AS word FROM words),
        seg AS (SELECT word, np, cuts FROM s16 WHERE pos = length(word))
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(s.np) AS BIGINT) AS n_pieces,
          CAST(sum(s.cuts) AS BIGINT) AS cuts_sum
        FROM tok t JOIN seg s USING (word) GROUP BY 1"""
  }

  /** Shared oracle fragment: the q34 fixed-point cosine chain over
    * queries vec_id < 8 vs the whole corpus, ending in
    * `sims(qid, nid, sim)`.
    */
  private lazy val SIMS_SQL = """n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        pairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM embeddings q, embeddings e
          WHERE q.vec_id < 8 AND e.vec_id <> q.vec_id),
        el AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM pairs),
        dots AS (SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id)"""

  /** DuckDB replay of [[Classifier.predict]] at B=4096, C=4: consumes a
    * CTE `src(doc_id, w)` (lowercased word array), emits uni/bi/feats/
    * fb/model/sc/r where `r` carries (doc_id, cls, score, rn) ranked by
    * (score desc, cls) — rn = 1 is the prediction. No leading WITH.
    */
  private[graft] def classifierSql(src: String): String = s"""
        uni AS (SELECT doc_id, UNNEST(w) AS f FROM $src),
        bi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM $src, UNNEST(range(1, len(w))) AS t(i)),
        feats AS (SELECT doc_id, f FROM uni UNION ALL SELECT doc_id, f FROM bi),
        fb AS (
          SELECT doc_id,
            CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT) % 4096 AS bucket,
            count(*) AS cnt
          FROM feats GROUP BY 1, 2),
        model AS (
          SELECT CAST(b.range AS BIGINT) AS bucket, CAST(c.range AS BIGINT) AS cls,
            CAST(concat('0x', substr(md5(CAST(b.range AS VARCHAR) || ':'
              || CAST(c.range AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000 AS w
          FROM range(0, 4096) b, range(0, 4) c),
        sc AS (
          SELECT doc_id, cls, CAST(sum(cnt * w) AS BIGINT) AS score
          FROM fb JOIN model USING (bucket) GROUP BY 1, 2),
        r AS (
          SELECT doc_id, cls, score,
            row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
          FROM sc)"""

  /** DuckDB replay of [[operators.Chunking.cdcChunks]] at maskBits=6:
    * gear values from md5, the rolling hash as its exact 30-term
    * windowed closed form (2^k ≡ 0 mod 2^30 for k ≥ 30), boundary
    * positions, and chunk reconstruction — CTEs ending in
    * `chunks(doc_id, chunk_idx, start, len, chunk)`, parameterized on
    * the source CTE/table and text column (no leading WITH).
    */
  private[graft] def cdcSql(src: String, textCol: String): String = s"""
        b AS (
          SELECT doc_id, i AS pos,
            ord(substr($textCol, CAST(i + 1 AS INTEGER), 1)) AS byte
          FROM $src, UNNEST(range(0, length($textCol))) AS t(i)),
        g AS (
          SELECT doc_id, pos,
            CAST(concat('0x', substr(md5('gear:' || CAST(byte AS VARCHAR)), 1, 15))
              AS BIGINT) % 1073741824 AS gv
          FROM b),
        l AS (SELECT doc_id, list(gv ORDER BY pos) AS gl FROM g GROUP BY 1),
        h AS (
          SELECT doc_id, i AS pos,
            CAST(list_sum(list_transform(range(0, 30), k ->
              CASE WHEN i - k >= 0
                THEN (gl[CAST(i - k + 1 AS INTEGER)]
                      * (CAST(1 AS BIGINT) << CAST(k AS INTEGER))) % 1073741824
                ELSE 0 END)) % 1073741824 AS BIGINT) AS h
          FROM l, UNNEST(range(0, len(gl))) AS t(i)),
        cuts AS (SELECT doc_id, pos + 1 AS e FROM h WHERE h < 16777216),
        ends AS (
          SELECT DISTINCT doc_id, e FROM (
            SELECT doc_id, e FROM cuts
            UNION ALL
            SELECT doc_id, length($textCol) AS e FROM $src
            WHERE length($textCol) > 0) x),
        ch AS (
          SELECT doc_id, e,
            CAST(row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS BIGINT) AS chunk_idx,
            CAST(COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS BIGINT) AS start
          FROM ends),
        chunks AS (
          SELECT c.doc_id, c.chunk_idx, c.start, CAST(c.e - c.start AS BIGINT) AS len,
            substr(d.$textCol, CAST(c.start + 1 AS INTEGER), CAST(c.e - c.start AS INTEGER)) AS chunk
          FROM ch c JOIN $src d USING (doc_id))"""
}
