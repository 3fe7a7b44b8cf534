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
        FROM r a JOIN r b ON a.doc_id = b.doc_id AND a.rn = 1 AND b.rn = 2"""))
  )
}
