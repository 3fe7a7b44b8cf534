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
      (s, dir) => Classifier.predict(
        Tables.documents(s, dir), "doc_id", "text",
        Classifier.syntheticModel(s, buckets = 4096, nClasses = 4),
        buckets = 4096),
      Some(s"""
        WITH $WORDS_SQL,
        uni AS (SELECT doc_id, UNNEST(w) AS f FROM words),
        bi AS (
          SELECT doc_id,
            w[CAST(i AS INTEGER)] || '_' || w[CAST(i + 1 AS INTEGER)] AS f
          FROM words, UNNEST(range(1, len(w))) AS t(i)),
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
          FROM sc)
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
      Some {
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
      })
  )
}
