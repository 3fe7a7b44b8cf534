package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, SimilaritySearch}

/** Training-data-pipeline extension surface (SURVEY §7.5): dedup (exact,
  * n-gram Jaccard, MinHash-LSH, SimHash), embedding similarity search
  * (brute-force + LSH-bucketed), text analysis (lang-ID, quality,
  * tokens), and multimodal binary plumbing.
  *
  * Everything except SimHash carries a full DuckDB oracle: the hash
  * primitives are deliberately portable (md5 hex digests, lexicographic
  * mins, sign tests, exact-decimal accumulation), so even the LSH
  * pipelines hash-match across engines.
  */
object ExtQueries {

  /** DuckDB fragment: lowercased whitespace word array per document.
    * Shared with [[CurateQueries]].
    */
  private[graft] val WORDS_SQL =
    """words AS (
      SELECT doc_id, lang, n_chars, text,
        list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> len(x) > 0) AS w
      FROM documents)"""

  /** DuckDB fragment: distinct 4-gram shingle posting list (doc_id, sh)
    * over whatever `words(doc_id, w)` CTE precedes it — split out from
    * [[SHINGLES_SQL]] so q114 can run the same pipeline over a CLEANED
    * corpus by supplying its own `words` definition.
    */
  private[graft] val SHINGLES_FROM_WORDS_SQL = """
    sh AS (
      SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, array_to_string(w[i:i+3], ' ') AS sh
        FROM words, UNNEST(range(1, len(w) - 2)) AS t(i)
        WHERE len(w) >= 4) x)"""

  /** DuckDB fragment: distinct 4-gram shingle posting list (doc_id, sh).
    * Shared with [[CurateQueries]].
    */
  private[graft] val SHINGLES_SQL = WORDS_SQL + "," + SHINGLES_FROM_WORDS_SQL

  /** The `words`-parametric tail of the MinHash-LSH pipeline. */
  private[graft] val MINHASH_FROM_WORDS_SQL = SHINGLES_FROM_WORDS_SQL + """,
    mh AS (
      SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || sh)) AS mh
      FROM sh, UNNEST(range(0, 12)) AS t(i)
      GROUP BY 1, 2),
    bands AS (
      SELECT doc_id, i // 3 AS band, md5(string_agg(mh, ',' ORDER BY i)) AS sig
      FROM mh GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
    shr AS (
      SELECT c.doc_a, c.doc_b, count(*) AS shared
      FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
      GROUP BY 1, 2),
    mh_pairs AS (
      SELECT c.doc_a, c.doc_b, COALESCE(shared, 0) AS shared, na, nb,
        CAST(COALESCE(shared, 0) AS DOUBLE) / (na + nb - COALESCE(shared, 0)) AS jaccard
      FROM cand c
        LEFT JOIN shr s ON c.doc_a = s.doc_a AND c.doc_b = s.doc_b
        JOIN (SELECT doc_id, sz AS na FROM sizes) sa ON c.doc_a = sa.doc_id
        JOIN (SELECT doc_id, sz AS nb FROM sizes) sb ON c.doc_b = sb.doc_id)"""

  /** DuckDB fragment: the full MinHash-LSH candidate+verify pipeline
    * (k=12, 3 rows/band), ending in `mh_pairs(doc_a, doc_b, shared, na,
    * nb, jaccard)` — shared by q32 and the clustering queries q61/q62.
    */
  private[graft] val MINHASH_PAIRS_SQL = WORDS_SQL + "," + MINHASH_FROM_WORDS_SQL

  /** DuckDB replay of [[operators.Sampling.epochedMixtureBy]] over
    * documents grouped by `lang` — per-source mass = SUM(`weightSql`),
    * `maxE`-capped integer waterfilling over 3 unrolled rounds, then
    * the full-epoch + md5-threshold-fractional explode. Shared by q191
    * (weight 1 = docs) and q194 (weight n_chars).
    */
  private def epochedOracleSql(weightSql: String, budget: Long, maxE: Int): String = {
    val rounds = (1 to 3).map { k => s"""
        z$k AS (
          SELECT CAST(SUM(CASE WHEN served < n_s * $maxE THEN w_s ELSE 0 END) AS BIGINT) AS z,
            CAST($budget - SUM(served) AS BIGINT) AS residual
          FROM r${k - 1}),
        r$k AS (
          SELECT src, n_s, w_s,
            served + least(
              CASE WHEN served < n_s * $maxE AND z > 0 AND residual > 0
                   THEN (residual * w_s) // z ELSE 0 END,
              n_s * $maxE - served) AS served
          FROM r${k - 1}, z$k),"""
    }.mkString
    s"""
        WITH s AS (
          SELECT lang AS src, CAST(SUM($weightSql) AS BIGINT) AS n_s
          FROM documents GROUP BY 1),
        t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM s),
        r0 AS (
          SELECT src, n_s,
            CAST(floor(sqrt(CAST((n_s * 1000000000000) // t.n AS DOUBLE))) AS BIGINT) AS w_s,
            CAST(0 AS BIGINT) AS served
          FROM s, t),
        ${rounds.stripSuffix(",")},
        plan AS (
          SELECT src, n_s, served, served // n_s AS full_e,
            ((served % n_s) * 268435456) // n_s AS thr
          FROM r3)
        SELECT d.doc_id, d.lang, CAST(ep AS BIGINT) AS epoch,
          p.n_s, p.served AS served_s
        FROM documents d JOIN plan p ON d.lang = p.src,
          UNNEST(range(1, p.full_e
            + (CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 7)
                     < lpad(lower(to_hex(p.thr)), 7, '0')
                    THEN 1 ELSE 0 END) + 1)) AS te(ep)"""
  }

  /** DuckDB fragment: the IVF cell-probe pipeline through `cand(qid,
    * nid)` — centroid cosine scoring, corpus cell assignment (rn=1),
    * query probes (rn ≤ 4, qid < 8). Shared by q50 (IVF + exact
    * scoring) and q151 (IVF + PQ ADC scoring).
    */
  private[graft] val IVF_CAND_SQL = """n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 16),
        ael AS (
          SELECT e.vec_id AS nid, c.cid, UNNEST(e.embedding) AS x, UNNEST(c.cvec) AS y
          FROM embeddings e, cent c),
        adots AS (
          SELECT nid, cid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ael GROUP BY 1, 2),
        asims AS (
          SELECT nid, cid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c2.n2 AS DOUBLE))) AS csim
          FROM adots JOIN n2 a ON nid = a.vec_id JOIN n2 c2 ON cid = c2.vec_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY nid ORDER BY csim DESC, cid) AS rn
          FROM asims),
        cells AS (SELECT nid, cid FROM ranked WHERE rn = 1),
        probes AS (SELECT nid AS qid, cid FROM ranked WHERE rn <= 4 AND nid < 8),
        cand AS (
          SELECT p.qid, s.nid FROM probes p JOIN cells s ON p.cid = s.cid
          WHERE s.nid <> p.qid)"""

  /** DuckDB fragment: the PQ pipeline through the `adc` CTE — seed
    * codebook (16 smallest-id vectors), element-wise fixed-point
    * sub-distances, per-subspace argmin codes, and the ADC sum. Shared
    * by q123 (ADC top-k) and q126 (ADC shortlist + exact re-rank).
    */
  private[graft] val PQ_ADC_SQL = """seeds AS MATERIALIZED (
          SELECT embedding AS svec,
            CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        cb AS MATERIALIZED (
          SELECT ms, code, j, svec[CAST(ms * 8 + j + 1 AS INTEGER)] AS cx
          FROM seeds, UNNEST(range(0, 8)) AS t(ms), UNNEST(range(0, 8)) AS u(j)),
        cbn AS MATERIALIZED (
          SELECT ms, code,
            SUM(CAST(floor(CAST(cx AS DOUBLE) * CAST(cx AS DOUBLE) * 1000000000.0) AS BIGINT)) AS cn2
          FROM cb GROUP BY 1, 2),
        ce AS MATERIALIZED (
          SELECT vec_id, ms, j, embedding[CAST(ms * 8 + j + 1 AS INTEGER)] AS x
          FROM embeddings, UNNEST(range(0, 8)) AS t(ms), UNNEST(range(0, 8)) AS u(j)),
        cen AS MATERIALIZED (
          SELECT vec_id, ms,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS sn2
          FROM ce GROUP BY 1, 2),
        pdots AS MATERIALIZED (
          SELECT e.vec_id, e.ms, c.code,
            SUM(CAST(floor(CAST(e.x AS DOUBLE) * CAST(c.cx AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ce e JOIN cb c ON e.ms = c.ms AND e.j = c.j GROUP BY 1, 2, 3),
        dist AS MATERIALIZED (
          SELECT p.vec_id, p.ms, p.code, n.sn2 + b.cn2 - 2 * p.dot AS d
          FROM pdots p JOIN cen n ON p.vec_id = n.vec_id AND p.ms = n.ms
                       JOIN cbn b ON p.ms = b.ms AND p.code = b.code),
        codes AS MATERIALIZED (
          SELECT vec_id, ms, code FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id, ms ORDER BY d, code) AS rn
            FROM dist) WHERE rn = 1),
        adc AS (
          SELECT q.vec_id AS qid, n.vec_id AS nid, SUM(q.d) AS adist
          FROM codes n JOIN dist q ON q.ms = n.ms AND q.code = n.code
          WHERE q.vec_id < 8 AND q.vec_id <> n.vec_id
          GROUP BY 1, 2)"""

  /** The `words`-parametric tail of the CC pipeline (requires WITH
    * RECURSIVE): near-dup pairs (jaccard ≥ 0.2) → transitive closure →
    * `lbl(doc_id, cluster_id)`.
    */
  private[graft] val CC_FROM_WORDS_SQL = MINHASH_FROM_WORDS_SQL + """,
    cc_edges AS (SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= 0.2),
    und AS (
      SELECT doc_a AS a, doc_b AS b FROM cc_edges
      UNION SELECT doc_b, doc_a FROM cc_edges),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
    lbl AS (
      SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a)"""

  /** DuckDB fragment (requires WITH RECURSIVE): connected components
    * over the verified near-dup pairs (jaccard ≥ 0.2) via transitive
    * closure, ending in `lbl(doc_id, cluster_id)` — cluster_id = the
    * component's minimum doc id, matching [[graft.operators.Graph]]'s
    * canonical representative.
    */
  private val CC_LABELS_SQL = WORDS_SQL + "," + CC_FROM_WORDS_SQL

  /** DuckDB replay of [[operators.Sampling.mixtureSampleT]]: HUGEINT
    * share/threshold arithmetic (exact — no Int64 overflow), and the
    * same float-seeded, integer-corrected nth root. DuckDB ROUNDS
    * double→int casts where Spark truncates; the ±2 correction ladder
    * is exactly what makes both engines land on the identical w_s.
    */
  private def mixtureTOracle(budget: Long, tNum: Int, tDen: Int): String = {
    def powH(c: String): String =
      (1 until tNum).foldLeft(s"CAST(($c) AS HUGEINT)")((a, _) => s"($a * ($c))")
    val xvExpr =
      (1 until tDen).foldLeft("CAST(share AS HUGEINT)")((a, _) => s"($a * share)")
    val invT = 1.0 / tNum
    val thr = s"(CAST($budget AS HUGEINT) * w.w_s * 268435456) // (CAST(z.z AS HUGEINT) * w.n_s)"
    s"""
      WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
      t AS (SELECT SUM(n_s) AS n_total FROM s),
      sh AS (SELECT source, n_s,
               (CAST(n_s AS HUGEINT) * 1000000000000) // CAST(n_total AS HUGEINT) AS share
             FROM s, t),
      x AS (SELECT source, n_s, $xvExpr AS xv FROM sh),
      r AS (SELECT source, n_s, xv,
              CAST(floor(pow(CAST(xv AS DOUBLE), $invT)) AS BIGINT) AS r0 FROM x),
      w AS (SELECT source, n_s,
              CASE WHEN ${powH("r0 + 2")} <= xv THEN r0 + 2
                   WHEN ${powH("r0 + 1")} <= xv THEN r0 + 1
                   WHEN ${powH("r0")} <= xv THEN r0
                   WHEN ${powH("r0 - 1")} <= xv THEN r0 - 1
                   ELSE greatest(r0 - 2, 0) END AS w_s
            FROM r),
      z AS (SELECT SUM(w_s) AS z FROM w)
      SELECT d.doc_id, d.source, w.n_s, w.w_s,
        $thr > 268435455 OR
        substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 7) <
          lpad(lower(to_hex(CAST($thr AS BIGINT))), 7, '0') AS kept
      FROM documents d JOIN w ON d.source = w.source CROSS JOIN z"""
  }

  /** Unrolled DuckDB replay of [[operators.Graph.pageRankDirected]] on
    * the q119 synthetic digraph: per round, the dangling-mass scalar,
    * the per-edge contribution sum, and the damped update — every
    * division a BIGINT floor div, exactly as the operator computes.
    */
  private def pageRankDirectedOracle(iters: Int): String = {
    val rounds = (1 to iters).map { k =>
      val p = s"p${k - 1}"
      s"""
        d$k AS (SELECT coalesce(SUM(pr), 0) AS dang FROM $p WHERE outdeg = 0),
        c$k AS (SELECT e.dst AS id, SUM(p.pr // p.outdeg) AS s
                FROM e JOIN $p p ON e.src = p.id GROUP BY 1),
        p$k AS (SELECT b.id,
                  CAST(150000000 + (85 * (coalesce(c.s, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS pr,
                  b.outdeg
                FROM $p b LEFT JOIN c$k c ON b.id = c.id CROSS JOIN d$k d CROSS JOIN nn)"""
    }.mkString(",")
    s"""
        WITH e AS (
          SELECT DISTINCT doc_id % 40 AS src, (doc_id * 3) % 57 AS dst
          FROM documents WHERE doc_id % 40 <> (doc_id * 3) % 57),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        od AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        p0 AS (
          SELECT nodes.id, CAST(1000000000 AS BIGINT) AS pr,
            coalesce(od.outdeg, 0) AS outdeg
          FROM nodes LEFT JOIN od ON nodes.id = od.id),$rounds
        SELECT id, pr FROM p$iters"""
  }

  val all: Seq[QuerySpec] = Seq(

    // exact dedup: canonical-fingerprint hash-aggregate clusters
    QuerySpec("q30_dedup_exact",
      (s, dir) => Dedup.fingerprintClusters(Tables.documents(s, dir), "doc_id", "text"),
      Some("""
        SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp,
          min(doc_id) AS keeper_id, count(*) AS cluster_size
        FROM documents GROUP BY 1""")),

    // INCREMENTAL exact dedup — the daily-crawl path: docs ≡0 mod 3
    // stand in for the stored corpus fingerprint state; the rest arrive
    // as the new batch and are admitted only if novel vs the state AND
    // first-of-fingerprint within the batch. No corpus rescan.
    QuerySpec("q113_dedup_increment",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val known = docs.filter(col("doc_id") % 3 === 0)
          .select(TextFns.fingerprint(col("text")).as("fp")).distinct()
        Dedup.dedupIncrement(
            docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text"),
            "doc_id", "text", known, "fp")
          .select(col("doc_id"), col("fp"))
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
            md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
          FROM documents),
        known AS (SELECT DISTINCT fp FROM f WHERE doc_id % 3 = 0),
        batch AS (SELECT * FROM f WHERE doc_id % 3 <> 0),
        winners AS (SELECT fp, min(doc_id) AS doc_id FROM batch GROUP BY 1)
        SELECT w.doc_id, w.fp FROM winners w
        WHERE NOT EXISTS (SELECT 1 FROM known k WHERE k.fp = w.fp)""")),

    // INCREMENTAL MinHash-LSH admission — q113's daily-crawl pattern
    // for NEAR-dups: the corpus arrives in two id-ordered batches, each
    // admitted against the accumulated band-signature state with no
    // corpus rescan; the union of admissions must equal the ONE-SHOT
    // smaller-id ranking over the whole corpus, which is what the
    // oracle computes directly from the full band table (the q173
    // append ≡ rebuild equivalence pattern).
    QuerySpec("q187_dedup_increment_lsh",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text", "n_chars")
        val (b1, b2) = (docs.filter(col("doc_id") < 250),
          docs.filter(col("doc_id") >= 250))
        val state0 = Dedup.lshBandState(docs.filter(lit(false)),
          "doc_id", "text", n = 4, k = 12, rowsPerBand = 3)
        // b1's band table serves BOTH tick 1's probe and tick 2's
        // state — one shingle+minhash pass, not two
        val bands1 = Dedup.lshBandState(b1, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).localCheckpoint(true)
        val adm1 = Dedup.dedupIncrementLshBanded(b1, "doc_id", bands1,
          knownBands = state0)
        val adm2 = Dedup.dedupIncrementLsh(b2, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3, knownBands = bands1)
        adm1.unionByName(adm2).select("doc_id", "n_chars")
      },
      Some(s"""
        WITH $WORDS_SQL, $MINHASH_FROM_WORDS_SQL,
        rej AS (
          SELECT DISTINCT a.doc_id FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig
                      AND b.doc_id < a.doc_id)
        SELECT d.doc_id, d.n_chars
        FROM documents d LEFT JOIN rej r ON d.doc_id = r.doc_id
        WHERE r.doc_id IS NULL""")),

    // INCREMENTAL SimHash admission — q187's sibling for the
    // Hamming-distance near-dup definition: two id-ordered batches
    // admitted against the accumulated 8-byte-per-doc signature state
    // (which never shuffles in the probe) must equal the one-shot
    // smaller-id ranking. Oracle replays signatures, single-band
    // blocking (recall-equivalent for h<=1, the q33 precedent), the
    // Hamming filter, and the smaller-id rejection.
    QuerySpec("q210_dedup_increment_simhash",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text", "n_chars")
        val (b1, b2) = (docs.filter(col("doc_id") < 250),
          docs.filter(col("doc_id") >= 250))
        val state0 = Dedup.simhashSignatures(docs.filter(lit(false)),
          "doc_id", "text")
        // b1's signature table serves BOTH tick 1's probe and tick 2's
        // state — one signature pass, not two
        val sigs1 = Dedup.simhashSignatures(b1, "doc_id", "text")
          .localCheckpoint(true)
        val adm1 = Dedup.dedupIncrementSimhashSigned(b1, "doc_id", sigs1,
          maxHamming = 1, knownSigs = state0)
        val adm2 = Dedup.dedupIncrementSimhash(b2, "doc_id", "text",
          maxHamming = 1, knownSigs = sigs1)
        adm1.unionByName(adm2).select("doc_id", "n_chars")
      },
      Some(s"""
        WITH $WORDS_SQL,
        toks AS (
          SELECT DISTINCT doc_id, md5(t) AS h
          FROM (SELECT doc_id, UNNEST(w) AS t FROM words) x),
        votes AS (
          SELECT doc_id, b,
            SUM(CASE WHEN substr(h, b + 1, 1) IN ('1','3','5','7','9','b','d','f')
                     THEN 1 ELSE -1 END) AS vote
          FROM toks, UNNEST(range(0, 32)) AS t(b)
          GROUP BY 1, 2),
        sig AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY 1),
        sbanded AS (
          SELECT doc_id, simhash, k, (simhash >> (k * 8)) & 255 AS bandval
          FROM sig, UNNEST(range(0, 4)) AS t(k)),
        rej AS (
          SELECT DISTINCT a.doc_id FROM sbanded a
          JOIN sbanded b ON a.k = b.k AND a.bandval = b.bandval
                        AND b.doc_id < a.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 1)
        SELECT d.doc_id, d.n_chars
        FROM documents d LEFT JOIN rej r ON d.doc_id = r.doc_id
        WHERE r.doc_id IS NULL""")),

    // STREAMING incremental LSH admission — q187's daily-crawl path
    // run as an actual Structured Streaming ingestion: the corpus
    // arrives as four id-ordered micro-batches (file source,
    // maxFilesPerTrigger=1, modification times pinned); each
    // foreachBatch admits against the band-signature state parquet and
    // appends BOTH the admitted rows and the batch's full signatures
    // (admitted or not — the q187 state contract). The drained result
    // must equal the one-shot smaller-id ranking, replayed by the same
    // oracle as q187.
    QuerySpec("q192_stream_dedup_lsh",
      (s, dir) => {
        GraftSession.tune(s)
        val base = java.nio.file.Files.createTempDirectory("graft_q192_").toString
        val docs = Tables.documents(s, dir).select("doc_id", "text", "n_chars")
        // four id-ordered arrival files with pinned mod times; range
        // width from max(doc_id) so EVERY doc streams at any SF
        val step = docs.agg(max(col("doc_id"))).collect()(0).getLong(0) / 4 + 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        (0 until 4).foreach { i =>
          val tmp = s"$base/tmp$i"
          docs.filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
            .coalesce(1).write.parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          val dst = new java.io.File(s"$base/in/b$i.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1000000000000L + i * 60000L)
          ()
        }
        // schema-stable empty state + admitted sinks
        operators.Dedup.lshBandState(docs.filter(col("doc_id") < 0),
          "doc_id", "text", 4, 12, 3)
          .write.mode("overwrite").parquet(s"$base/state")
        docs.filter(col("doc_id") < 0)
          .write.mode("overwrite").parquet(s"$base/admitted")
        val q = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
          .parquet(s"$base/in")
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$base/ckpt")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            val batch = b.localCheckpoint(true)
            val st = s.read.parquet(s"$base/state")
            // ONE shingle+minhash pass per tick: the band table this
            // tick appends to the state is also the probe's batch side
            val bands = operators.Dedup.lshBandState(
              batch, "doc_id", "text", 4, 12, 3).localCheckpoint(true)
            operators.Dedup.dedupIncrementLshBanded(batch, "doc_id", bands, st)
              .write.mode("append").parquet(s"$base/admitted")
            bands.write.mode("append").parquet(s"$base/state")
            ()
          }.start()
        q.awaitTermination()
        val out = s.read.parquet(s"$base/admitted").select("doc_id", "n_chars")
        val snap = out.localCheckpoint(true)
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(base))
        snap
      },
      Some(s"""
        WITH $WORDS_SQL, $MINHASH_FROM_WORDS_SQL,
        rej AS (
          SELECT DISTINCT a.doc_id FROM bands a
          JOIN bands b ON a.band = b.band AND a.sig = b.sig
                      AND b.doc_id < a.doc_id)
        SELECT d.doc_id, d.n_chars
        FROM documents d LEFT JOIN rej r ON d.doc_id = r.doc_id
        WHERE r.doc_id IS NULL""")),

    // exact n-gram Jaccard near-dup via shingle blocking (df-capped)
    QuerySpec("q31_dedup_jaccard",
      (s, dir) => Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 4, dfCap = 100, num = 1, den = 10),
      Some(s"""
        WITH $SHINGLES_SQL,
        kept AS (
          SELECT doc_id, sh FROM (
            SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh) y
          WHERE df <= 100),
        sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared, na, nb,
          CAST(shared AS DOUBLE) / (na + nb - shared) AS jaccard
        FROM shared
          JOIN (SELECT doc_id, sz AS na FROM sizes) sa ON doc_a = sa.doc_id
          JOIN (SELECT doc_id, sz AS nb FROM sizes) sb ON doc_b = sb.doc_id
        WHERE shared * 10 >= (na + nb - shared) * 1""")),

    // ASYMMETRIC containment dedup — |A∩B|/|A| ≥ 6/10, the measure that
    // catches quote-inclusion / subset duplicates Jaccard's union
    // denominator dilutes away. Directed pairs; the unordered
    // intersection is computed once and both directions tested from it.
    QuerySpec("q138_dedup_containment",
      (s, dir) => Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 4, dfCap = 100, num = 6, den = 10),
      Some(s"""
        WITH $SHINGLES_SQL,
        kept AS (
          SELECT doc_id, sh FROM (
            SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh) y
          WHERE df <= 100),
        sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sized AS (
          SELECT doc_a, doc_b, shared, na, nb
          FROM shared
            JOIN (SELECT doc_id, sz AS na FROM sizes) sa ON doc_a = sa.doc_id
            JOIN (SELECT doc_id, sz AS nb FROM sizes) sb ON doc_b = sb.doc_id)
        SELECT doc_a, doc_b, shared, na, nb,
          CAST(shared AS DOUBLE) / na AS containment
        FROM sized WHERE shared * 10 >= na * 6
        UNION ALL
        SELECT doc_b AS doc_a, doc_a AS doc_b, shared, nb AS na, na AS nb,
          CAST(shared AS DOUBLE) / nb AS containment
        FROM sized WHERE shared * 10 >= nb * 6""")),

    // MinHash + LSH banding, engine-portable hashes, exact-Jaccard verify
    QuerySpec("q32_dedup_minhash_lsh",
      (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 4, k = 12, rowsPerBand = 3),
      Some(s"""
        WITH $MINHASH_PAIRS_SQL
        SELECT doc_a, doc_b, shared, na, nb, jaccard FROM mh_pairs""")),

    // SimHash banded near-dup. Portable by construction: bit j of a
    // token's hash is the low bit of hex digit j of md5(token), so the
    // oracle can re-derive the identical 32-bit signature in DuckDB.
    // (The SQL explodes bits — fine for an sf0.01 oracle; the Spark side
    // computes the 32 votes as conditional-sum columns in one aggregate.)
    QuerySpec("q33_dedup_simhash",
      (s, dir) => Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text",
        maxHamming = 1),
      Some(s"""
        WITH $WORDS_SQL,
        toks AS (
          SELECT DISTINCT doc_id, md5(t) AS h
          FROM (SELECT doc_id, UNNEST(w) AS t FROM words) x),
        votes AS (
          SELECT doc_id, b,
            SUM(CASE WHEN substr(h, b + 1, 1) IN ('1','3','5','7','9','b','d','f')
                     THEN 1 ELSE -1 END) AS vote
          FROM toks, UNNEST(range(0, 32)) AS t(b)
          GROUP BY 1, 2),
        sig AS (
          SELECT doc_id,
            CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY 1),
        banded AS (
          SELECT doc_id, simhash, k, (simhash >> (k * 8)) & 255 AS bandval
          FROM sig, UNNEST(range(0, 4)) AS t(k))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM banded a
          JOIN banded b ON a.k = b.k AND a.bandval = b.bandval AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1""")),

    // exact brute-force cosine top-5 (ANN baseline)
    QuerySpec("q34_knn_brute",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.bruteForceTopK(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", k = 5)
      },
      Some("""
        WITH n2 AS (
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
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 5""")),

    // same search through the bounded-heap TopKAggregator (no window
    // sort; partial buffers of size k combine map-side) — verified
    // against the same oracle as q34
    QuerySpec("q43_knn_topk_agg",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.bruteForceTopKAgg(
          e.filter(col("vec_id") < 8), e, "vec_id", "embedding", k = 5)
      },
      Some("""
        WITH n2 AS (
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
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b ON nid = b.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 5""")),

    // LSH sign-bucketed cosine top-3 (the scale path: candidates cut ~2^bits)
    QuerySpec("q35_knn_bucketed",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.bucketedTopK(
          e.filter(col("vec_id") < 32), e, "vec_id", "embedding", k = 3, bits = 8)
      },
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
            (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
          FROM embeddings),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        pairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM b q JOIN b e ON q.bucket = e.bucket
          WHERE q.vec_id < 32 AND e.vec_id <> q.vec_id),
        el AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM pairs),
        dots AS (SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 3""")),

    // multi-probe LSH ANN: each query also probes the 8 Hamming-1
    // neighbor buckets — the recall fix for q35's single-bucket probe,
    // still corpus-co-located (candidates from ≤ 9/256 of the corpus)
    QuerySpec("q49_knn_multiprobe",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.bucketedTopKMultiProbe(
          e.filter(col("vec_id") < 32), e, "vec_id", "embedding", k = 3, bits = 8)
      },
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
            (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
          FROM embeddings),
        qp AS (
          SELECT vec_id, embedding, xor(bucket, p) AS bucket
          FROM b, UNNEST([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS t(p)
          WHERE vec_id < 32),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        pairs AS (
          SELECT q.vec_id AS qid, e.vec_id AS nid, q.embedding AS qe, e.embedding AS ne
          FROM qp q JOIN b e ON q.bucket = e.bucket
          WHERE e.vec_id <> q.vec_id),
        el AS (SELECT qid, nid, UNNEST(qe) AS x, UNNEST(ne) AS y FROM pairs),
        dots AS (SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 3""")),

    // IVF ANN: data-dependent cells (caller-supplied centroids — here a
    // deterministic subset standing in for offline k-means), nProbe=4 of
    // C=16 cells probed → candidates ≈ N·nProbe/C
    QuerySpec("q50_knn_ivf",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.ivfTopK(
          e.filter(col("vec_id") < 8), e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "vec_id", k = 3, nProbe = 4)
      },
      Some(s"""
        WITH $IVF_CAND_SQL,
        el AS (
          SELECT c.qid, c.nid, UNNEST(q.embedding) AS x, UNNEST(e.embedding) AS y
          FROM cand c JOIN embeddings q ON c.qid = q.vec_id
                      JOIN embeddings e ON c.nid = e.vec_id),
        dots AS (
          SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 3""")),

    // ATTRIBUTE-FILTERED ANN (the pgvector/Qdrant filtered-search
    // shape): the predicate (even ids, standing in for any metadata
    // filter) semi-joins the prebuilt IVF index, the selectivity gate
    // picks the probe path (survivors ≫ maxExactRows=50 at every SF),
    // and candidates = probed cells ∩ matching BEFORE any scoring. The
    // oracle replays assignment, probes, the filter, and the ranking.
    QuerySpec("q218_filtered_ann",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val index = SimilaritySearch.ivfAssign(e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "vec_id")
        SimilaritySearch.filteredTopK(
          e.filter(col("vec_id") < 8), index, e.filter(col("vec_id") < 16),
          e.filter(col("vec_id") % 2 === 0).select("vec_id"),
          "vec_id", "embedding", "vec_id", k = 3, nProbe = 4,
          maxExactRows = 50L)
      },
      Some(s"""
        WITH $IVF_CAND_SQL,
        fcand AS (SELECT qid, nid FROM cand WHERE nid % 2 = 0),
        el AS (
          SELECT c.qid, c.nid, UNNEST(q.embedding) AS x, UNNEST(e.embedding) AS y
          FROM fcand c JOIN embeddings q ON c.qid = q.vec_id
                       JOIN embeddings e ON c.nid = e.vec_id),
        dots AS (
          SELECT qid, nid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM el GROUP BY 1, 2),
        sims AS (
          SELECT qid, nid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
          FROM dots JOIN n2 a ON qid = a.vec_id JOIN n2 b2 ON nid = b2.vec_id)
        SELECT qid, nid, sim, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn FROM sims) r
        WHERE rn <= 3""")),

    // Product-quantization ANN (Jégou et al. 2011): vectors compress to
    // m=8 sub-codes (argmin sub-centroid per 8-dim subspace, seed
    // codebook standing in for offline per-subspace k-means, like q50's
    // centroids), queries score candidates by ADC — m integer lookups
    // into the query's exact sub-distance table, no float math on the
    // corpus scan. Fixed-point throughout, so encode AND probe
    // hash-match DuckDB exactly.
    QuerySpec("q123_knn_pq",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cb = SimilaritySearch.pqSeedCodebook(e, "vec_id", "embedding",
          m = 8, subDim = 8, ksub = 16)
        val codes = SimilaritySearch.pqEncode(e, "vec_id", "embedding", cb,
          m = 8, subDim = 8)
        SimilaritySearch.pqTopK(e.filter(col("vec_id") < 8), codes, cb,
          "vec_id", "embedding", k = 5, m = 8, subDim = 8)
      },
      Some(s"""
        WITH $PQ_ADC_SQL
        SELECT qid, nid, CAST(adist AS BIGINT) AS adist, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rn FROM adc)
        WHERE rn <= 5""")),

    // IVF-PQ composed — the PRODUCTION ANN architecture (FAISS
    // `IVFx,PQy`): cells cut candidates ~C/nProbe×, PQ cuts bytes per
    // candidate ~32×, a query's scan is ADC integer lookups over its
    // probed cells only. The oracle composes the shared IVF candidate
    // chain with the shared PQ ADC chain: brute ADC restricted to the
    // probed-cell pairs IS the composed search.
    QuerySpec("q151_knn_ivfpq",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cb = SimilaritySearch.pqSeedCodebook(e, "vec_id", "embedding",
          m = 8, subDim = 8, ksub = 16)
        SimilaritySearch.ivfPqTopK(
          e.filter(col("vec_id") < 8), e, e.filter(col("vec_id") < 16), cb,
          "vec_id", "embedding", "vec_id", k = 3, nProbe = 4, m = 8, subDim = 8)
      },
      Some(s"""
        WITH $IVF_CAND_SQL,
        $PQ_ADC_SQL
        SELECT qid, nid, CAST(adist AS BIGINT) AS adist, CAST(rank AS INTEGER) AS rank
        FROM (
          SELECT a.qid, a.nid, a.adist,
            row_number() OVER (PARTITION BY a.qid ORDER BY a.adist, a.nid) AS rank
          FROM adc a JOIN cand c ON a.qid = c.qid AND a.nid = c.nid) r
        WHERE rank <= 3""")),

    // Two-stage PQ: ADC shortlist (20 deep, codes only) then EXACT
    // fixed-point L2 re-rank of just those candidates — the standard
    // deployment shape: full-precision math touches Q·shortlist rows,
    // never the corpus. The oracle replays shortlist AND re-rank.
    QuerySpec("q126_knn_pq_rerank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val cb = SimilaritySearch.pqSeedCodebook(e, "vec_id", "embedding",
          m = 8, subDim = 8, ksub = 16)
        val codes = SimilaritySearch.pqEncode(e, "vec_id", "embedding", cb,
          m = 8, subDim = 8)
        SimilaritySearch.pqTopKRerank(e.filter(col("vec_id") < 8), codes, e, cb,
          "vec_id", "embedding", k = 5, shortlist = 20, m = 8, subDim = 8)
      },
      Some(s"""
        WITH $PQ_ADC_SQL,
        short AS MATERIALIZED (
          SELECT qid, nid FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adist, nid) AS rn
            FROM adc) WHERE rn <= 20),
        fn2 AS MATERIALIZED (
          SELECT vec_id,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        rel AS (
          SELECT s.qid, s.nid, UNNEST(q.embedding) AS x, UNNEST(e.embedding) AS y
          FROM short s JOIN embeddings q ON s.qid = q.vec_id
                       JOIN embeddings e ON s.nid = e.vec_id),
        rdots AS (
          SELECT qid, nid,
            SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM rel GROUP BY 1, 2),
        rr AS (
          SELECT d.qid, d.nid, a.n2 + b.n2 - 2 * d.dot AS dist
          FROM rdots d JOIN fn2 a ON d.qid = a.vec_id JOIN fn2 b ON d.nid = b.vec_id)
        SELECT qid, nid, CAST(dist AS BIGINT) AS dist, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn FROM rr)
        WHERE rn <= 5""")),

    // SEMANTIC decontamination: corpus vectors near a benchmark item's
    // embedding (every 41st vector stands in for a leaked eval set —
    // identity leaks surface at sim = 1.0). IVF-cell confinement as in
    // q109; the bench side multi-probes its 2 nearest cells (recall
    // knob on the tiny side only), the corpus stays single-cell.
    QuerySpec("q128_semantic_decontaminate",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        operators.Contamination.semanticOverlap(
          e, e.filter(col("vec_id") % 41 === 0), "vec_id", "embedding",
          e.filter(col("vec_id") < 8), "vec_id", "embedding",
          simThreshold = 0.9, nProbe = 2)
      },
      Some("""
        WITH n2 AS MATERIALIZED (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        ael AS (
          SELECT e.vec_id AS nid, c.cid, UNNEST(e.embedding) AS x, UNNEST(c.cvec) AS y
          FROM embeddings e, cent c),
        adots AS MATERIALIZED (
          SELECT nid, cid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ael GROUP BY 1, 2),
        ranked AS MATERIALIZED (
          SELECT nid, cid, row_number() OVER (PARTITION BY nid ORDER BY
              CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c2.n2 AS DOUBLE))) DESC,
              cid) AS rn
          FROM adots JOIN n2 a ON nid = a.vec_id JOIN n2 c2 ON cid = c2.vec_id),
        cells AS (SELECT nid, cid FROM ranked WHERE rn = 1),
        bcells AS (SELECT nid AS bid, cid FROM ranked WHERE nid % 41 = 0 AND rn <= 2),
        cand AS (SELECT c.nid, b.bid FROM cells c JOIN bcells b ON c.cid = b.cid),
        pel AS (
          SELECT c.nid, c.bid, UNNEST(x.embedding) AS x, UNNEST(y.embedding) AS y
          FROM cand c JOIN embeddings x ON c.nid = x.vec_id
                      JOIN embeddings y ON c.bid = y.vec_id),
        pdots AS (
          SELECT nid, bid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM pel GROUP BY 1, 2)
        SELECT nid AS vec_id, bid AS bench_id,
          CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) AS sim
        FROM pdots JOIN n2 a ON nid = a.vec_id JOIN n2 b2 ON bid = b2.vec_id
        WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) >= 0.9""")),

    // SemDeDup (Abbas et al. 2023): IVF-cell assignment confines the
    // pairwise cosine work, near-dup groups collapse to their min-id
    // representative via connected components — the full semantic-dedup
    // operator, composed from the verified assignment + CC pieces and
    // hash-checked end to end (recursive-CTE closure on the oracle side).
    QuerySpec("q109_semantic_dedup",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        SimilaritySearch.semanticDedup(e, "vec_id", "embedding",
            e.filter(col("vec_id") < 8), "vec_id", "embedding",
            simThreshold = 0.4)
          .select(col("vec_id"), col("cid"), col("rep"), col("kept"))
      },
      Some("""
        WITH RECURSIVE n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        ael AS (
          SELECT e.vec_id AS nid, c.cid, UNNEST(e.embedding) AS x, UNNEST(c.cvec) AS y
          FROM embeddings e, cent c),
        adots AS (
          SELECT nid, cid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ael GROUP BY 1, 2),
        asims AS (
          SELECT nid, cid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c2.n2 AS DOUBLE))) AS csim
          FROM adots JOIN n2 a ON nid = a.vec_id JOIN n2 c2 ON cid = c2.vec_id),
        cells AS (
          SELECT nid, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY nid ORDER BY csim DESC, cid) AS rn
            FROM asims) WHERE rn = 1),
        cpair AS (
          SELECT a.nid AS ida, b.nid AS idb
          FROM cells a JOIN cells b ON a.cid = b.cid AND a.nid < b.nid),
        pel AS (
          SELECT c.ida, c.idb, UNNEST(x.embedding) AS x, UNNEST(y.embedding) AS y
          FROM cpair c JOIN embeddings x ON c.ida = x.vec_id
                       JOIN embeddings y ON c.idb = y.vec_id),
        pdots AS (
          SELECT ida, idb, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM pel GROUP BY 1, 2),
        pairs AS (
          SELECT ida, idb FROM pdots
          JOIN n2 a ON ida = a.vec_id JOIN n2 b2 ON idb = b2.vec_id
          WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b2.n2 AS DOUBLE))) >= 0.4),
        und AS (
          SELECT ida AS a, idb AS b FROM pairs
          UNION SELECT idb, ida FROM pairs),
        reach AS (
          SELECT a, b FROM und
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
        lbl AS (SELECT a AS id, least(a, min(b)) AS rep FROM reach GROUP BY a)
        SELECT c.nid AS vec_id, c.cid,
          COALESCE(l.rep, c.nid) AS rep,
          COALESCE(l.rep, c.nid) = c.nid AS kept
        FROM cells c LEFT JOIN lbl l ON c.nid = l.id""")),

    // LEAKAGE-SAFE split: train/val/test drawn per near-dup CLUSTER
    // (doc-level hash splits silently put 0.9-jaccard twins of test
    // docs into train — the classic eval-contamination bug). Same
    // minhash pair graph as q61, same split thresholds as q69; every
    // doc inherits its cluster representative's draw.
    QuerySpec("q112_leakage_safe_split",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        operators.Sampling.splitByCluster(
          Tables.documents(s, dir).select("doc_id"), "doc_id",
          pairs, "doc_a", "doc_b",
          Seq("train" -> "e6", "val" -> "f3"), "test")
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL
        SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS rep,
          CASE WHEN md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)) < 'e6' THEN 'train'
               WHEN md5(CAST(COALESCE(l.cluster_id, d.doc_id) AS VARCHAR)) < 'f3' THEN 'val'
               ELSE 'test' END AS split
        FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id""")),

    // Temperature-flattened mixture sampling (the pretraining data-mix
    // step): source mass ∝ √(share) (T=2 — the IEEE-exact power), doc
    // draws are md5 hex-prefix string compares against the per-source
    // integer quota threshold (q56's engine-portable idiom).
    QuerySpec("q110_mixture_sample",
      (s, dir) => operators.Sampling.mixtureSample(
        Tables.documents(s, dir), "doc_id", "source", budget = 200L),
      Some("""
        WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1),
        t AS (SELECT SUM(n_s) AS n_total FROM s),
        w AS (
          SELECT source, n_s,
            CAST(floor(sqrt(CAST((n_s * 1000000000000) // n_total AS DOUBLE))) AS BIGINT) AS w_s
          FROM s, t),
        z AS (SELECT SUM(w_s) AS z FROM w)
        SELECT d.doc_id, d.source, w.n_s, w.w_s,
          (200 * w.w_s * 268435456) // (z.z * w.n_s) > 268435455 OR
          substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 7) <
            lpad(lower(to_hex((200 * w.w_s * 268435456) // (z.z * w.n_s))), 7, '0') AS kept
        FROM documents d JOIN w ON d.source = w.source CROSS JOIN z""")),

    // Mixture sampling at arbitrary RATIONAL temperature: libm pow is
    // not engine-portable, so w_s is the EXACT integer root
    // ⌊(share^tDen)^(1/tNum)⌋ — float-seeded, decimal-corrected (the
    // ±2 CASE ladder absorbs both pow's ulp error and the engines'
    // different double→int cast rounding). The oracle replays the same
    // ladder in HUGEINT.
    QuerySpec("q117_mixture_t3",
      (s, dir) => operators.Sampling.mixtureSampleT(
        Tables.documents(s, dir), "doc_id", "source", budget = 200L, tNum = 3, tDen = 1),
      Some(mixtureTOracle(budget = 200L, tNum = 3, tDen = 1))),
    QuerySpec("q118_mixture_t15",
      (s, dir) => operators.Sampling.mixtureSampleT(
        Tables.documents(s, dir), "doc_id", "source", budget = 200L, tNum = 3, tDen = 2),
      Some(mixtureTOracle(budget = 200L, tNum = 3, tDen = 2))),

    // DATA-CONSTRAINED epoched mixture (Muennighoff 2023): budget 1200
    // over 500 docs at T=2 flattening forces REPETITION — rare
    // languages hit their 3-epoch cap and the unserved remainder
    // waterfills back to sources with headroom over 3 exact integer
    // rounds; materialization = full epochs for every doc + an
    // md5-threshold fractional epoch. The oracle replays every
    // waterfill round and the epoch explode.
    QuerySpec("q191_epoched_mixture",
      (s, dir) => operators.Sampling.epochedMixture(
        Tables.documents(s, dir), "doc_id", "lang",
        budget = 1200L, maxEpochs = 3),
      Some(epochedOracleSql(weightSql = "1", budget = 1200L, maxE = 3))),

    // the same data-constrained regime with the budget in the unit real
    // training runs use — CHAR/token mass per source instead of docs:
    // n_s = Σ n_chars, caps and waterfilling in chars, fractional epoch
    // still a per-doc md5 draw (expectation-exact in served chars)
    QuerySpec("q194_epoched_mixture_chars",
      (s, dir) => operators.Sampling.epochedMixtureBy(
        Tables.documents(s, dir), "doc_id", "lang", col("n_chars"),
        budget = 450000L, maxEpochs = 3),
      Some(epochedOracleSql(weightSql = "n_chars", budget = 450000L, maxE = 3))),

    // DoReMi-style domain reweighting (deterministic multiplicative
    // weights): per-language type-token ratio as the difficulty proxy;
    // 3 rounds of w <- normalize(w * 2^(eta*excess/1000)) in milli-bit
    // integer arithmetic (2^x on the |excess| magnitude, sign choosing
    // multiply vs divide — no negative integer division, the
    // cross-engine trap). The oracle replays loss, every round's
    // weighted average, update, and renormalization.
    QuerySpec("q203_domain_reweight",
      (s, dir) => {
        val loss = Tables.documents(s, dir)
          .select(col("lang"),
            explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
          .groupBy("lang")
          .agg(expr("count(DISTINCT t) * 1000 div count(1)").as("loss"))
          .select(col("lang").as("src"), col("loss"))
        operators.Sampling.domainReweight(loss, "src", "loss",
          rounds = 3, etaMilli = 500)
      },
      Some {
        def pw(x: String) =
          s"((1000 + least($x, 15000) % 1000) * (CAST(1 AS BIGINT) << (least($x, 15000) // 1000)))"
        val rounds = (1 to 3).map { i => s"""
        a$i AS (SELECT CAST(SUM(w * loss) // 1000000 AS BIGINT) AS avg FROM r${i - 1}),
        u$i AS (
          SELECT src, loss,
            CASE WHEN loss >= a.avg THEN
              w * ${pw("500 * (loss - a.avg) // 1000")} // 1000
            ELSE
              w * 1000 // ${pw("500 * (a.avg - loss) // 1000")}
            END AS wu
          FROM r${i - 1}, a$i a),
        t$i AS (SELECT CAST(SUM(wu) AS BIGINT) AS tot FROM u$i),
        r$i AS MATERIALIZED (
          SELECT src, loss, CAST(wu * 1000000 // t.tot AS BIGINT) AS w
          FROM u$i, t$i t),"""
        }.mkString
        s"""
        WITH $WORDS_SQL,
        l AS (
          SELECT lang AS src,
            CAST(count(DISTINCT t) * 1000 // count(*) AS BIGINT) AS loss
          FROM (SELECT lang, UNNEST(w) AS t FROM words) tw GROUP BY 1),
        r0 AS (
          SELECT src, loss,
            CAST(1000000 // (SELECT count(*) FROM l) AS BIGINT) AS w
          FROM l),
        ${rounds.stripSuffix(",")}
        SELECT src, CAST(1 AS BIGINT) AS round, loss AS loss_milli, w AS w_micro FROM r1
        UNION ALL
        SELECT src, CAST(2 AS BIGINT), loss, w FROM r2
        UNION ALL
        SELECT src, CAST(3 AS BIGINT), loss, w FROM r3"""
      }),

    // embedding-cosine near-dup: sign-bucket blocking + exact fixed-point
    // cosine threshold — the semantic-dedup pass over an embedded corpus
    QuerySpec("q44_dedup_embedding",
      (s, dir) => Dedup.embeddingNearDup(Tables.embeddings(s, dir),
        "vec_id", "embedding", bits = 8, minSim = 0.4),
      Some("""
        WITH b AS (
          SELECT vec_id, embedding,
            (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
            + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
            + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
            + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
            + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
            + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
            + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
            + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS bucket
          FROM embeddings),
        n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        pairs AS (
          SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.embedding AS va, c.embedding AS vb
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id),
        el AS (SELECT id_a, id_b, UNNEST(va) AS x, UNNEST(vb) AS y FROM pairs),
        dots AS (SELECT id_a, id_b, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot FROM el GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) AS sim
        FROM dots JOIN n2 a ON id_a = a.vec_id JOIN n2 c ON id_b = c.vec_id
        WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE))) >= 0.4""")),

    // winnowing (MOSS) fingerprints: min-hash of each sliding window of
    // w=4 char-8-gram hashes — density ~2/(w+1), position-robust; digest
    // is order-independent so identical fingerprint sets hash equal
    QuerySpec("q51_winnow_fingerprint",
      (s, dir) => Dedup.winnowFingerprints(Tables.documents(s, dir),
        "doc_id", "text", k = 8, w = 4),
      Some("""
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 8),
        p AS (
          SELECT doc_id, i AS pos, md5(substr(t, CAST(i AS INTEGER), 8)) AS h
          FROM d, UNNEST(range(1, length(t) - 6)) AS u(i)),
        wm AS (
          SELECT doc_id,
            min(h) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
          FROM p)
        SELECT doc_id AS id, CAST(count(DISTINCT wmin) AS INTEGER) AS n_fps,
          md5(array_to_string(list_sort(list(DISTINCT wmin)), '')) AS fp_digest
        FROM wm GROUP BY 1""")),

    // language-ID heuristic: stopword-lexicon hit counts, fixed-priority
    // argmax — output is a lang × prediction confusion matrix
    QuerySpec("q36_lang_id",
      (s, dir) => {
        val hits = TextFns.langLexicons.map { case (l, lex) =>
          TextFns.lexiconHits(col("text"), lex).as(s"h_$l") }
        val h = Tables.documents(s, dir).select(col("lang") +: hits: _*)
        h.withColumn("pred",
            when(col("h_en") >= col("h_de") && col("h_en") >= col("h_fr") && col("h_en") >= col("h_es"), "en")
              .when(col("h_de") >= col("h_fr") && col("h_de") >= col("h_es"), "de")
              .when(col("h_fr") >= col("h_es"), "fr")
              .otherwise("es"))
          .groupBy("lang", "pred").agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        h AS (
          SELECT doc_id, lang,
            len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','with'], x))) AS h_en,
            len(list_filter(w, x -> list_contains(['der','die','das','und','ist','mit','ein','von'], x))) AS h_de,
            len(list_filter(w, x -> list_contains(['le','la','les','et','est','un','une','des'], x))) AS h_fr,
            len(list_filter(w, x -> list_contains(['el','los','las','es','un','una','y','con'], x))) AS h_es
          FROM words)
        SELECT lang,
          CASE WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
               WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
               WHEN h_fr >= h_es THEN 'fr'
               ELSE 'es' END AS pred,
          count(*) AS n_docs
        FROM h GROUP BY 1, 2""")),

    // quality scoring: length / distinct-ratio / stopword-ratio metrics
    QuerySpec("q37_quality_score",
      (s, dir) => {
        val toks = TextFns.tokens(col("text"))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            size(toks).as("n_words"),
            size(array_distinct(toks)).as("n_distinct"),
            length(regexp_replace(col("text"), "\\s", "")).as("n_nospace"),
            TextFns.lexiconHits(col("text"), TextFns.langLexicons.head._2).as("stop_hits"))
          .select(col("doc_id"), col("n_words"), col("n_distinct"),
            (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
            (col("n_nospace").cast("double") / col("n_words")).as("avg_word_len"),
            (col("stop_hits").cast("double") / col("n_words")).as("stopword_ratio"),
            when(col("n_words") >= 40 &&
                 col("n_distinct").cast("double") / col("n_words") >= 0.3, "good")
              .otherwise("low").as("quality_bucket"))
      },
      Some(s"""
        WITH $WORDS_SQL,
        m AS (
          SELECT doc_id,
            CAST(len(w) AS INTEGER) AS n_words,
            CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
            length(regexp_replace(text, '\\s', '', 'g')) AS n_nospace,
            len(list_filter(w, x -> list_contains(['the','and','of','to','a','in','is','with'], x))) AS stop_hits
          FROM words)
        SELECT doc_id, n_words, n_distinct,
          CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
          CAST(n_nospace AS DOUBLE) / n_words AS avg_word_len,
          CAST(stop_hits AS DOUBLE) / n_words AS stopword_ratio,
          CASE WHEN n_words >= 40 AND CAST(n_distinct AS DOUBLE) / n_words >= 0.3
               THEN 'good' ELSE 'low' END AS quality_bucket
        FROM m""")),

    // token counting: whitespace tokens + regex (BPE-ish) tokens per lang
    QuerySpec("q38_token_stats",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          size(TextFns.tokens(col("text"))).cast("long").as("ws_tokens"),
          regexp_count(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]")).cast("long").as("re_tokens"))
        .groupBy("lang")
        .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
          sum(col("re_tokens")).as("total_re_tokens"),
          count(lit(1)).as("n_docs")),
      Some(s"""
        WITH $WORDS_SQL
        SELECT lang,
          CAST(SUM(len(w)) AS BIGINT) AS total_ws_tokens,
          CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS total_re_tokens,
          count(*) AS n_docs
        FROM words GROUP BY 1""")),

    // multimodal binary plumbing: opaque payload + typed metadata +
    // deterministic sampling fingerprints (the Spark-side schema/batch
    // shape for a decode stage; the real WAV PCM decode path is
    // q103_wav_decode — see graft.multimodal.{Multimodal, WavCodec})
    QuerySpec("q39_multimodal_meta",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          lit("text/plain").as("mime"),
          octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
          md5(substring(col("text"), 1, 32)).as("head_fp"),
          md5(col("text").substr(
            floor(col("n_chars") / lit(2.0)).cast("int") + 1, lit(32))).as("mid_fp")),
      Some("""
        SELECT doc_id, 'text/plain' AS mime,
          CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
          md5(substr(text, 1, 32)) AS head_fp,
          md5(substr(text, CAST(floor(n_chars / 2.0) AS INTEGER) + 1, 32)) AS mid_fp
        FROM documents""")),

    // Exact per-group order statistics (p25/p50/p75 of document length
    // by language), "lower" order-statistic definition: the element at
    // 0-based index (n-1)*p, computed in INTEGER arithmetic so the rank
    // is engine-exact. One shuffle on the group key + one in-partition
    // sort; the rank filter means no collect of the sorted set. (The
    // sketch path for unsorted 100 TB groups is approx_percentile; this
    // is the exact form, viable while a group fits one task's sort —
    // beyond that, pre-bucket by value range first.)
    QuerySpec("q58_quantile_by_rank",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("n_chars", "doc_id")
        val wn = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        Tables.documents(s, dir)
          .select(col("lang"), col("n_chars"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .groupBy("lang")
          .agg(
            max(when(col("rn") === expr("(n-1) div 4") + 1, col("n_chars"))).as("p25"),
            max(when(col("rn") === expr("(n-1) div 2") + 1, col("n_chars"))).as("p50"),
            max(when(col("rn") === expr("(3*(n-1)) div 4") + 1, col("n_chars"))).as("p75"),
            count(lit(1)).as("n_docs"))
      },
      Some("""
        WITH r AS (
          SELECT lang, n_chars,
            row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
            count(*) OVER (PARTITION BY lang) AS n
          FROM documents)
        SELECT lang,
          max(CASE WHEN rn = (n-1)//4 + 1 THEN n_chars END) AS p25,
          max(CASE WHEN rn = (n-1)//2 + 1 THEN n_chars END) AS p50,
          max(CASE WHEN rn = (3*(n-1))//4 + 1 THEN n_chars END) AS p75,
          count(*) AS n_docs
        FROM r GROUP BY 1""")),

    // TF-IDF top-5 terms per document, with a RATIONAL idf
    // (tf·N·1e6 div df in integer arithmetic — no float log, so the
    // score is bit-identical in any engine; the log-idf variant is a
    // drop-in `log(n_docs/df)` on top of the same frame). Corpus df is
    // one map-side-combining aggregate; N broadcasts as a 1-row frame;
    // the per-doc top-5 is a window over ≤ |doc| rows keyed by doc —
    // no global sort, no skew (window partition = one document).
    QuerySpec("q59_tfidf_topk",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = docs.select(col("doc_id"),
          explode(TextFns.tokens(col("text"))).as("term"))
        val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score_ppm").desc, col("term").asc)
        tf.join(dfc, Seq("term"))
          .crossJoin(broadcast(n))
          .withColumn("score_ppm", expr("(tf * n_docs * 1000000) div df"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select("doc_id", "term", "tf", "df", "score_ppm", "rk")
      },
      Some(s"""
        WITH $WORDS_SQL,
        tok AS (SELECT doc_id, UNNEST(w) AS term FROM words),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents),
        sc AS (
          SELECT doc_id, term, tf, df, (tf * n_docs * 1000000) // df AS score_ppm
          FROM tf JOIN dfc USING (term) CROSS JOIN n),
        r AS (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_ppm DESC, term) AS rk
          FROM sc)
        SELECT doc_id, term, tf, df, score_ppm, rk FROM r WHERE rk <= 5""")),

    // Pivot: hour-of-day × event-type count matrix. Explicit pivot
    // values — no distinct-scan job to discover columns, and the plan
    // is ONE conditional aggregate (map-side combining), not one pass
    // per column.
    QuerySpec("q60_pivot_matrix",
      (s, dir) => Tables.events(s, dir)
        .select(hour(col("ts")).cast("long").as("hr"), col("event_type"))
        .groupBy("hr")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view")),
      Some("""
        SELECT CAST(hour(ts) AS BIGINT) AS hr,
          count(*) FILTER (event_type = 'click') AS click,
          count(*) FILTER (event_type = 'error') AS error,
          count(*) FILTER (event_type = 'purchase') AS purchase,
          count(*) FILTER (event_type = 'signup') AS signup,
          count(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY 1""")),

    // Near-dup CLUSTERS: the step after pair detection — connected
    // components over the verified MinHash pairs (jaccard ≥ 0.2), each
    // doc labeled with its component's minimum doc id. Iterative
    // min-label propagation ([[graft.operators.Graph]]); the oracle
    // computes the same labels via a recursive-CTE transitive closure.
    QuerySpec("q61_dedup_clusters",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL
        SELECT doc_id, cluster_id FROM lbl""")),

    // Same clustering via STAR CONTRACTION (large-star/small-star) — the
    // O(log n)-round high-diameter scale path; must produce byte-for-byte
    // the same labels as q61's label propagation (and the recursive-CTE
    // oracle), which is exactly what the shared oracle checks.
    QuerySpec("q104_cc_star",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        graft.operators.Graph.connectedComponentsStar(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL
        SELECT doc_id, cluster_id FROM lbl""")),

    // Corpus compaction: collapse each near-dup cluster to its canonical
    // keeper (minimum doc id) and pass singletons through — the
    // end-to-end "dedup the training corpus" operation
    // (LSH candidates → exact verify → clusters → keepers).
    QuerySpec("q62_dedup_compact",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        val lbl = graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
        docs.join(lbl, Seq("doc_id"), "left")
          .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
          .select("doc_id", "lang", "source", "n_chars")
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN lbl ON d.doc_id = lbl.doc_id
        WHERE lbl.doc_id IS NULL OR lbl.cluster_id = d.doc_id""")),

    // One Lloyd iteration of spherical k-means (8 seed centroids =
    // vec_id < 8) — the offline training job behind the IVF index
    // (q50). Assignment is the broadcast + map-side max_by collapse;
    // the update is an exact fixed-point per-(cluster, dim) mean, so
    // the whole iteration is engine-reproducible and oracle-checkable.
    QuerySpec("q63_kmeans_step",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        graft.operators.Clustering.kmeansStep(
          e, "vec_id", "embedding",
          e.filter(col("vec_id") < 8).select(col("vec_id").as("cid"),
            col("embedding").as("cvec")),
          "cid", "cvec")
      },
      Some("""
        WITH n2 AS (
          SELECT vec_id, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)) AS n2
          FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t GROUP BY 1),
        cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
        ael AS (
          SELECT e.vec_id AS pid, c.cid, UNNEST(e.embedding) AS x, UNNEST(c.cvec) AS y
          FROM embeddings e, cent c),
        adots AS (
          SELECT pid, cid, SUM(CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000.0) AS BIGINT)) AS dot
          FROM ael GROUP BY 1, 2),
        asims AS (
          SELECT pid, cid,
            CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(c2.n2 AS DOUBLE))) AS csim
          FROM adots JOIN n2 a ON pid = a.vec_id JOIN n2 c2 ON cid = c2.vec_id),
        cells AS (
          SELECT pid, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY pid ORDER BY csim DESC, cid) AS rn
            FROM asims) r WHERE rn = 1),
        mem AS (
          SELECT cells.cid, d.dim, e.embedding[d.dim + 1] AS v
          FROM cells
            JOIN embeddings e ON e.vec_id = cells.pid,
            UNNEST(range(0, len(e.embedding))) AS d(dim))
        SELECT cid, dim,
          CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000000.0) AS BIGINT)) AS DOUBLE)
            / count(*) / 1000000000.0 AS mean_val,
          count(*) AS n_members
        FROM mem GROUP BY 1, 2""")),

    // PageRank over the verified near-dup similarity graph (q61's edges)
    // in exact integer fixed-point arithmetic — high-rank documents are
    // the recurring "templates" of the corpus. 3 fixed iterations,
    // damping 85/100, scale 1e9; every division is a BIGINT floor div,
    // so the ranks hash-match the oracle's unrolled recomputation.
    QuerySpec("q83_pagerank",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        graft.operators.Graph.pageRank(pairs, "doc_a", "doc_b", iterations = 3)
          .select(col("id").as("doc_id"), col("pr"))
      },
      Some(s"""
        WITH $MINHASH_PAIRS_SQL,
        e AS (SELECT doc_a, doc_b FROM mh_pairs WHERE jaccard >= 0.2),
        und AS (SELECT doc_a AS a, doc_b AS b FROM e UNION ALL SELECT doc_b, doc_a FROM e),
        deg AS (SELECT a, count(*) AS deg FROM und GROUP BY 1),
        p0 AS (SELECT a AS id, CAST(1000000000 AS BIGINT) AS pr FROM deg),
        c1 AS (SELECT u.b AS id, SUM(p.pr // d.deg) AS s
               FROM und u JOIN p0 p ON u.a = p.id JOIN deg d ON u.a = d.a GROUP BY 1),
        p1 AS (SELECT id, CAST(150000000 + (85 * s) // 100 AS BIGINT) AS pr FROM c1),
        c2 AS (SELECT u.b AS id, SUM(p.pr // d.deg) AS s
               FROM und u JOIN p1 p ON u.a = p.id JOIN deg d ON u.a = d.a GROUP BY 1),
        p2 AS (SELECT id, CAST(150000000 + (85 * s) // 100 AS BIGINT) AS pr FROM c2),
        c3 AS (SELECT u.b AS id, SUM(p.pr // d.deg) AS s
               FROM und u JOIN p2 p ON u.a = p.id JOIN deg d ON u.a = d.a GROUP BY 1),
        p3 AS (SELECT id, CAST(150000000 + (85 * s) // 100 AS BIGINT) AS pr FROM c3)
        SELECT id AS doc_id, pr FROM p3""")),

    // DIRECTED PageRank with dangling-mass redistribution on a synthetic
    // digraph with genuine sinks (nodes 40..56 appear only as dst):
    // each round the sink mass is shared uniformly (D_t div N) before
    // damping, all BIGINT floor divisions, so the unrolled-CTE oracle
    // hash-matches. On symmetric edge sets this reduces to q83's
    // undirected operator exactly (GraphSpec asserts the equality).
    QuerySpec("q119_pagerank_directed",
      (s, dir) => {
        val e = Tables.documents(s, dir)
          .select((col("doc_id") % 40).as("src"), ((col("doc_id") * 3) % 57).as("dst"))
        graft.operators.Graph.pageRankDirected(e, "src", "dst", iterations = 4)
      },
      Some(pageRankDirectedOracle(4))),

    // Exact triangle count over the near-dup graph by degree-ordered
    // orientation (out-degrees bounded O(√E) — no hub blowup); the
    // oracle closes a<b<c wedges directly, which is equivalent.
    QuerySpec("q88_triangle_count",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        graft.operators.Graph.triangleCount(pairs, "doc_a", "doc_b")
      },
      Some(s"""
        WITH $MINHASH_PAIRS_SQL,
        ed AS (
          SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM mh_pairs WHERE jaccard >= 0.2 AND doc_a <> doc_b)
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM ed e1
          JOIN ed e2 ON e1.b = e2.a
          JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b""")),

    // Exact Jaccard ≥ 1/2 via PREFIX FILTERING (AllPairs/PPJoin):
    // candidates only from rarity-ordered prefixes — recall-lossless,
    // so the oracle is the plain exact-Jaccard self-join at the same
    // threshold (no blocking, no df cap in the metric).
    QuerySpec("q92_dedup_prefix_jaccard",
      (s, dir) => Dedup.jaccardPairsPrefix(Tables.documents(s, dir),
        "doc_id", "text", n = 4, num = 1, den = 2),
      Some(s"""
        WITH $SHINGLES_SQL,
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        shared AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared, na, nb,
          CAST(shared AS DOUBLE) / (na + nb - shared) AS jaccard
        FROM shared
          JOIN (SELECT doc_id, sz AS na FROM sizes) sa ON doc_a = sa.doc_id
          JOIN (SELECT doc_id, sz AS nb FROM sizes) sb ON doc_b = sb.doc_id
        WHERE shared * 2 >= (na + nb - shared) * 1""")),

    // Per-node local clustering coefficient over the near-dup graph —
    // the audit signal for CC-based dedup (clique-like clusters ≈ 1000
    // milli, transitive chain artifacts ≈ 0). Triangles enumerate once
    // via the degree-oriented wedge join, then explode to their three
    // corners; degrees and the milli division are exact integers.
    QuerySpec("q154_clustering_coeff",
      (s, dir) => {
        val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        graft.operators.Graph.clusteringCoeff(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("deg"), col("n_tri"), col("coeff_mb"))
      },
      Some(s"""
        WITH $MINHASH_PAIRS_SQL,
        ed AS (
          SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
          FROM mh_pairs WHERE jaccard >= 0.2 AND doc_a <> doc_b),
        und AS (SELECT a AS u, b AS v FROM ed UNION ALL SELECT b AS u, a AS v FROM ed),
        dg AS (SELECT u AS id, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM ed e1 JOIN ed e2 ON e1.b = e2.a
                     JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
        tn AS (
          SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT x AS id FROM tri
            UNION ALL SELECT y AS id FROM tri
            UNION ALL SELECT z AS id FROM tri) q GROUP BY 1)
        SELECT d.id AS doc_id, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
          CASE WHEN d.deg >= 2
               THEN (2000 * COALESCE(t.n_tri, 0)) // (d.deg * (d.deg - 1))
               ELSE 0 END AS coeff_mb
        FROM dg d LEFT JOIN tn t ON d.id = t.id""")),

    // Cluster-capped representative sampling — the diversity
    // generalization of q62's single-keeper compaction: every doc
    // joins its near-dup cluster (unclustered docs are their own),
    // then each cluster keeps its first TWO members under a
    // deterministic md5 draw — intra-cluster diversity without the
    // duplication.
    QuerySpec("q175_cluster_cap",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        val labels = graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
        val all = docs.select(col("doc_id")).join(labels, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        graft.operators.Sampling.capPerCluster(all, "doc_id", "cluster_id", m = 2)
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL,
        everyd AS (
          SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
        SELECT doc_id, cluster_id,
          CAST(row_number() OVER (PARTITION BY cluster_id
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS pick_rank,
          CAST(row_number() OVER (PARTITION BY cluster_id
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) <= 2 AS kept
        FROM everyd""")),

    // Quality-aware dedup keeper — what production dedup actually does
    // (RefinedWeb/FineWeb rule): each near-dup cluster keeps its
    // LONGEST member (n_chars, id tie-break), never a random draw —
    // dedup that improves average quality instead of sampling it.
    QuerySpec("q181_best_keeper",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
          n = 4, k = 12, rowsPerBand = 3).filter(col("jaccard") >= 0.2)
        val labels = graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
        val all = docs.select(col("doc_id"), col("n_chars"))
          .join(labels, Seq("doc_id"), "left")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        graft.operators.Sampling.keepBestPerCluster(
          all, "doc_id", "cluster_id", "n_chars", m = 1)
      },
      Some(s"""
        WITH RECURSIVE $CC_LABELS_SQL,
        everyd AS (
          SELECT d.doc_id, d.n_chars, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN lbl l ON d.doc_id = l.doc_id)
        SELECT doc_id, n_chars, cluster_id,
          CAST(row_number() OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id) AS INTEGER) AS pick_rank,
          CAST(row_number() OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id) AS INTEGER) <= 1 AS kept
        FROM everyd"""))
  )
}
