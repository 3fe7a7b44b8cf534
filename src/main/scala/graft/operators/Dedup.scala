package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document deduplication operators for training-data pipelines.
  *
  * All operators are shuffle-bounded joins/aggregations — no driver-side
  * collections, no O(n²) cross products. Pairwise work is generated only
  * through blocking keys (shared shingles, LSH band buckets, SimHash
  * bands), which is what keeps them viable at 100 TB: candidate volume
  * scales with Σ df(block)² over bounded-frequency blocks, not with n².
  */
object Dedup {

  /** Materialize a multi-consumer intermediate (posting table, signature
    * table) so its plan runs ONCE no matter how many consumers the
    * operator fans it into. A persist() here would leak into the shared
    * session (round-1 finding) and pin an unbounded table in executor
    * memory. On a cluster, set `graft.staging.dir` to a job-scoped
    * cluster path and this is a staging parquet — disk-bounded,
    * spill-free, durable; unset (single-node mode) it is an eager local
    * checkpoint — same plan cut, no parquet round-trip. Lifecycle: see
    * [[Staging]] — parquet roots are tracked and removed at JVM exit;
    * the cost until then is one copy of each staged intermediate per
    * operator CONSTRUCTION, so a long-lived session constructing many
    * operators should set a job-scoped `graft.staging.dir` it recycles
    * between jobs.
    */
  private[operators] def staged(df: DataFrame, hint: String): DataFrame =
    Staging.stage(df, hint).df

  /** Fan-out width for the explode-heavy stages. A dimension-sized
    * parquet arrives as one input split, which would serialize the
    * explode on a single core — so these stages repartition first.
    * Default: the cluster's `defaultParallelism`, clamped to 16 only on
    * SMALL clusters (the clamp is a small-data overhead guard; at
    * 1000-executor scale `defaultParallelism` rules). Override with
    * `graft.fanout.partitions`.
    */
  private[operators] def fanout(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption("graft.fanout.partitions").map(_.toInt).getOrElse {
      val p = spark.sparkContext.defaultParallelism
      if (p <= 64) math.min(p, 16) else p
    }

  /** Exact dedup via canonical-text fingerprint (lowercase, strip
    * punctuation, collapse whitespace, md5): one hash-aggregate, the
    * cheapest possible cluster pass. `keeper` = min id (deterministic).
    */
  def fingerprintClusters(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFns.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("cluster_size"))

  /** INCREMENTAL exact dedup: admit only the rows of a NEW batch whose
    * canonical fingerprint is (a) absent from the stored corpus
    * fingerprint set and (b) not claimed by an earlier row (min id) of
    * the same batch — the daily-crawl ingestion path, where re-hashing
    * the whole corpus per batch ([[fingerprintClusters]]) would be a
    * full rescan. Complements [[Incremental]]'s aggregate maintenance:
    * here the maintained state is the fingerprint SET, which callers
    * append the output's `fp` column to after each batch.
    *
    * Output: the admitted batch rows + their `fp`. Cost: one
    * hash-aggregate over the batch + one anti-join against the state
    * (batch-sized build side; the state side streams — at 100 TB the
    * state table is bucketed by `fp` so the anti-join co-locates).
    */
  def dedupIncrement(batch: DataFrame, idCol: String, textCol: String,
                     knownFps: DataFrame, fpCol: String): DataFrame = {
    // Reprocessed / overlapping crawl chunks legitimately repeat rows, so
    // the batch is NOT assumed id-unique: identical rows collapse via
    // distinct(), and an id carrying variant texts keeps its min-fp
    // variant — both deterministic, so each admitted id appears exactly
    // once and appending the output's `fp` to the state appends no dups.
    // (Same id + same fp + a differing payload column is the caller's
    // contract violation — fingerprint identity must identify the row.)
    val withFp = batch.withColumn("fp", TextFns.fingerprint(col(textCol))).distinct()
    val idWinners = withFp.groupBy(col(idCol)).agg(min(col("fp")).as("fp"))
    val oneRowPerId = withFp.join(idWinners, Seq(idCol, "fp"), "left_semi")
    val batchWinners = oneRowPerId.groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol))
    oneRowPerId.join(batchWinners, Seq("fp", idCol), "left_semi")
      .join(knownFps.select(col(fpCol).as("fp")), Seq("fp"), "left_anti")
  }

  /** The (id, band, sig) LSH band-signature table of `docs` — the
    * maintainable STATE for [[dedupIncrementLsh]], the near-dup
    * counterpart of [[dedupIncrement]]'s fingerprint set. Callers
    * append the state of EVERY batch doc (admitted or not) after each
    * batch: a rejected doc still blocks its own later near-dups,
    * exactly as it does in the one-shot smaller-id ranking. Docs with
    * fewer than `n` tokens have no shingles, hence no signatures —
    * they never collide and are always admitted (same as one-shot).
    */
  def lshBandState(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k ($k) must be a multiple of rowsPerBand ($rowsPerBand)")
    minhashBands(shingleSet(docs, idCol, textCol, n), k, rowsPerBand)
  }

  /** INCREMENTAL MinHash-LSH admission: admit only the rows of a NEW
    * batch that are not LSH near-dup candidates of anything already
    * seen — the daily-crawl ingestion path for NEAR-duplicates, where
    * re-banding the whole corpus per batch ([[minhashLshPairs]]) would
    * be a full rescan. The stored state is signatures only (a k/rpb-row
    * table per doc — no shingles, no text), so admission is one
    * (band, sig) join against the state plus one within-batch
    * self-join; the corpus is never touched.
    *
    * Semantics (smaller-id-wins per collision edge): a batch doc is
    * REJECTED iff it shares at least one band signature with the state
    * or with a smaller-id doc of its own batch. When batches arrive in
    * id order and the state accumulates every seen doc's bands
    * ([[lshBandState]] contract), a multi-batch build admits exactly
    * the docs the ONE-SHOT ranking over the union admits — q187 proves
    * the equivalence under the oracle. Band-level admission is the
    * deliberate contract (candidates are near-dups at the LSH
    * threshold; there are no stored shingles to Jaccard-verify
    * against) — the same screen/verify trade [[Contamination
    * .fuzzyOverlap]] documents.
    *
    * @param knownBands (id, band, sig) state from [[lshBandState]];
    *                   must not already contain this batch's ids
    * @return the admitted batch rows, schema unchanged
    */
  def dedupIncrementLsh(batch: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int, rowsPerBand: Int,
                        knownBands: DataFrame): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k ($k) must be a multiple of rowsPerBand ($rowsPerBand)")
    // the band table feeds two consumers (state probe + intra self-join
    // sides) — stage once, same discipline as minhashLshPairs' postings
    val bands = staged(
      minhashBands(shingleSet(batch, idCol, textCol, n), k, rowsPerBand),
      "inc_lsh_bands")
    dedupIncrementLshBanded(batch, idCol, bands, knownBands)
  }

  /** [[dedupIncrementLsh]] with the batch's band table PRECOMPUTED — for
    * ingestion ticks that also maintain the state ([[lshBandState]] of
    * the same batch): the tick computes the shingle+minhash pass ONCE,
    * appends it to the state, and probes with the same materialized
    * frame, instead of running the identical band derivation twice per
    * batch. `bands` must be the [[lshBandState]] of `batch`, already
    * materialized (checkpoint/staging) — it is consumed three times.
    */
  def dedupIncrementLshBanded(batch: DataFrame, idCol: String,
                              bands: DataFrame,
                              knownBands: DataFrame): DataFrame = {
    // PROBE SHAPE (the 100 TB contract): the state side is unbounded
    // (every doc ever admitted keeps its signatures forever) while the
    // batch side is one tick — so the state must NEVER shuffle. A plain
    // `bands LEFT SEMI state` would build/exchange the state side;
    // instead the state streams MAP-SIDE against a broadcast of the
    // batch's distinct (band, sig) keys (bounded by per-tick batch
    // size — the caller contract), reducing to the tiny hot-key
    // intersection, which then semi-joins back onto the batch bands.
    // Per-tick state cost: one map-side scan, zero state exchange.
    val batchKeys = bands.select(col("band"), col("sig")).distinct()
    val hot = knownBands.select(col("band"), col("sig"))
      .join(broadcast(batchKeys), Seq("band", "sig"), "left_semi")
      .distinct()
    val vsState = bands.join(broadcast(hot), Seq("band", "sig"), "left_semi")
      .select(col("id"))
    val intra = bands
      .join(bands.select(col("id").as("id_b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("id_b") < col("id"))
      .select(col("id"))
    val rejected = vsState.union(intra).distinct()
      .withColumnRenamed("id", idCol)
    batch.join(rejected, Seq(idCol), "left_anti")
  }

  /** Distinct word-n-gram shingles, exploded to (id, sh) posting rows.
    *
    * Built as posexplode + window `lead()` instead of a transform/slice
    * higher-order function: HOFs evaluate interpreted (allocation-heavy
    * and outside whole-stage codegen — in round-1 profiling the HOF
    * formulation dominated the whole operator); the token explode and
    * the sort-based window both stay on codegen'd paths and scale
    * linearly. The repartition spreads the fan-out: a dimension-sized
    * parquet arrives as ONE input split, which would otherwise serialize
    * the explode on a single core.
    */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val parallelism = fanout(docs.sparkSession)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val leads = (1 until n).map(j => lead(col("t"), j).over(w))
    docs.repartition(parallelism, col(idCol))
      .select(col(idCol).as("id"), posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "t")))
      .select(col("id"), col("t"), leads.last.as("last"),
        concat_ws(" ", col("t") +: leads: _*).as("sh"))
      .filter(col("last").isNotNull)
      .select(col("id"), col("sh")).distinct()
  }

  /** Exact n-gram Jaccard near-dup pairs via shingle blocking.
    *
    * Shingles occurring in more than `dfCap` documents are dropped from
    * the shingle space first (a standard frequency cap: ultra-common
    * shingles generate quadratic candidate blowup but carry no
    * discriminative signal). Jaccard is then exact over the capped
    * shingle sets: |A∩B| / (|A|+|B|−|A∩B|), emitted for pairs with
    * jaccard ≥ num/den (compared in integer arithmetic — no float in the
    * predicate).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   dfCap: Int, num: Int, den: Int): DataFrame = {
    // The df-capped posting table feeds three consumers (sizes + both
    // join sides): stage it once (see [[staged]] — AQE re-plans each
    // consumer as its own job, so exchange reuse does NOT span them and
    // an unstaged posting table would be recomputed per consumer).
    // The frequency cap is a hash-aggregate + semi-join, NOT a window
    // over partitionBy(sh): the window's per-key sort concentrates a
    // hot shingle on one task and AQE cannot split it; the agg combines
    // map-side and the join is skew-splittable.
    //
    // ONE staging write, not two: the raw shingle plan appears on both
    // sides of the semi-join (probe + df aggregate), but that is a
    // single job — Spark's ReuseExchange computes the shared shingle
    // subtree once within it — so only the df-capped RESULT needs the
    // durable multi-consumer materialization. (Staging the raw postings
    // too would add a full parquet round-trip of the posting table per
    // operator construction for nothing.)
    val sh = shingleSet(docs, idCol, textCol, n)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("sh")
    val kept = staged(sh.join(rare, Seq("sh"), "left_semi"), "jaccard_postings")
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = kept.select(col("id").as("doc_a"), col("sh"))
    val b = kept.select(col("id").as("doc_b"), col("sh"))
    val shared = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .filter(col("shared") * den >= (col("na") + col("nb") - col("shared")) * num)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
  }

  /** Exact n-gram CONTAINMENT pairs — the ASYMMETRIC near-dup measure
    * |A∩B| / |A| (vs Jaccard's symmetric union denominator): a short
    * document quoted wholesale inside a long one has high containment
    * but low Jaccard (the long doc's extra shingles flood the union), so
    * quote-inclusion / subset duplicates are exactly the pairs
    * [[jaccardPairs]] misses. Directed: (doc_a, doc_b) means doc_a's
    * capped shingle set is ≥ num/den contained in doc_b's; a pair can
    * qualify in both directions (near-identical docs emit two rows).
    *
    * Same df-cap blocking and integer-threshold discipline as
    * [[jaccardPairs]]; the unordered intersection is computed ONCE and
    * both directions are tested from it, so the candidate volume is
    * identical to the Jaccard operator's.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                       dfCap: Int, num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= num,
      s"threshold num/den must be in (0, 1]: got $num/$den")
    val sh = shingleSet(docs, idCol, textCol, n)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("sh")
    val kept = staged(sh.join(rare, Seq("sh"), "left_semi"), "containment_postings")
    val sizes = kept.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = kept.select(col("id").as("doc_a"), col("sh"))
    val b = kept.select(col("id").as("doc_b"), col("sh"))
    val shared = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
    val fwd = shared.filter(col("shared") * den >= col("na") * num)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"),
        (col("shared").cast("double") / col("na")).as("containment"))
    val rev = shared.filter(col("shared") * den >= col("nb") * num)
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"), col("shared"),
        col("nb").as("na"), col("na").as("nb"),
        (col("shared").cast("double") / col("nb")).as("containment"))
    fwd.unionByName(rev)
  }

  /** Exact Jaccard near-dup pairs via PREFIX FILTERING (the
    * AllPairs/PPJoin principle): order every document's shingles by
    * global rarity (df asc, shingle asc — a total order, no dense rank
    * needed), keep only each document's first π(x) = |x| − ⌈t·|x|⌉ + 1
    * shingles as its prefix, and generate candidates ONLY from shared
    * prefix shingles. Lossless for threshold t = num/den: two sets with
    * J ≥ t must overlap in ≥ t·|x| elements, which cannot fit entirely
    * in the suffixes — so every qualifying pair shares a prefix token.
    * Candidates are then verified with exact Jaccard over the FULL
    * shingle sets (semi-join-shrunk postings, as in [[minhashLshPairs]]).
    *
    * Versus [[jaccardPairs]]'s df-cap blocking: the df cap trades recall
    * for volume (capped shingles vanish from the metric); the prefix
    * filter keeps the metric exact and instead prunes by rarity — the
    * rarest shingles generate the fewest collisions, so candidate
    * volume shrinks dramatically at high thresholds. π is computed in
    * integer arithmetic (⌈a/b⌉ = (a+b−1) div b), engine-portable.
    */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, num: Int, den: Int): DataFrame = {
    require(num >= 1 && den >= num,
      s"threshold num/den must be in (0, 1]: got $num/$den")
    val sh = staged(shingleSet(docs, idCol, textCol, n), "prefix_postings")
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df"), col("sh"))
    val prefix = sh.join(dfc, Seq("sh"))
      .withColumn("rn", row_number().over(wDoc))
      .join(sizes, Seq("id"))
      .filter(col("rn") <= col("sz") - expr(s"(($num * sz) + $den - 1) div $den") + 1)
      .select("id", "sh")
    val cand = prefix.select(col("id").as("doc_a"), col("sh"))
      .join(prefix.select(col("id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verify over full postings, shrunk to candidate docs first
    val candDocs = cand.select(col("doc_a").as("id"))
      .union(cand.select(col("doc_b").as("id"))).distinct()
    val shc = sh.join(broadcast(candDocs), Seq("id"), "left_semi")
    shc.select(col("id").as("doc_a"), col("sh"))
      .join(shc.select(col("id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .filter(col("shared") * den >= (col("na") + col("nb") - col("shared")) * num)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
  }

  /** (id, band, sig) LSH band signatures over a shingle posting table —
    * shared by [[minhashLshPairs]] (self-join dedup) and
    * [[Contamination.fuzzyOverlap]] (cross-corpus probe).
    *
    * All k minhashes in ONE aggregate: k conditional-min columns over
    * the posting rows. No k-way explode — the k× row multiplication
    * never exists, and min() combines map-side, so the only shuffle
    * carries one partial row per (partition, id). (The earlier
    * explode(k)+groupBy(id,i) form shuffled k× the posting table; at
    * 100 TB that 12× shuffle IS the operator's cost.) Band signature =
    * md5 of the band's minhashes in hash-index order, emitted as a
    * small per-doc explode of k/rowsPerBand structs.
    */
  private[operators] def minhashBands(sh: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val mhCols = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("sh")))).as(s"mh_$i"))
    val sigs = sh.groupBy("id").agg(mhCols.head, mhCols.tail: _*)
    val nBands = k / rowsPerBand
    val bandStructs = array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",",
          (0 until rowsPerBand).map(p => col(s"mh_${b * rowsPerBand + p}")): _*)).as("sig"))
    }: _*)
    sigs.select(col("id"), explode(bandStructs).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** MinHash + LSH banding near-dup detection, engine-portable by
    * construction: hash i of a shingle is the md5 hex digest of
    * `"<i>:<shingle>"`, the minhash is the lexicographic MIN of those
    * digests, and a band signature is the md5 of the band's minhashes
    * joined in hash-index order. Identical in any engine with md5 —
    * which is what makes the DuckDB oracle able to verify it.
    *
    * Candidates = pairs agreeing on ≥1 of the `k/rowsPerBand` band
    * signatures; each candidate is then verified with EXACT Jaccard over
    * the full shingle sets (cheap: candidates ≪ n²).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String, n: Int,
                      k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k ($k) must be a multiple of rowsPerBand ($rowsPerBand): a partial " +
        "trailing band would silently change the LSH collision probability")
    // The posting table feeds four consumers (minhashes, sizes, both
    // verify sides): stage it once — see [[staged]].
    val sh = staged(shingleSet(docs, idCol, textCol, n), "minhash_postings")
    val bands = minhashBands(sh, k, rowsPerBand)
    // Candidate pairs feed three consumers (candDocs, verify semi-join,
    // final left-outer) — but all three sit in the FINAL job, and the
    // candidate subtree ends in a distinct (an exchange), so runtime
    // exchange reuse computes it once there (verified via
    // tools.ReuseCheck). Only the posting table above needs durable
    // staging: ITS consumers span separate jobs.
    val cand = bands.select(col("id").as("doc_a"), col("band"), col("sig"))
      .join(bands.select(col("id").as("doc_b"), col("band"), col("sig")), Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    // Exact-Jaccard verify: first SHRINK the posting table to candidate
    // docs (broadcast semi-join — candidates ≪ corpus), then self-join
    // the reduced postings on the shingle and keep candidate pairs. This
    // is a few-thousand-row join instead of a corpus-wide one.
    val candDocs = cand.select(col("doc_a").as("id"))
      .union(cand.select(col("doc_b").as("id"))).distinct()
    val shc = sh.join(broadcast(candDocs), Seq("id"), "left_semi")
    val shared = shc.select(col("id").as("doc_a"), col("sh"))
      .join(shc.select(col("id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    cand
      .join(shared, Seq("doc_a", "doc_b"), "left_outer")
      .na.fill(0L, Seq("shared"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("na")), Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("na"), col("nb"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs: candidates are blocked by a
    * deterministic sign-bit LSH bucket computed on both sides (2^bits
    * cells — pair volume scales with Σ bucket² instead of n²), then
    * scored with the exact fixed-point cosine and kept at sim ≥ minSim.
    * The standard semantic-dedup pass over an embedded corpus; the
    * bucket column doubles as the physical partitioning of a pre-bucketed
    * table at scale (co-located self-join).
    */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       bits: Int, minSim: Double): DataFrame = {
    import graft.functions.VectorFns
    val b = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFns.norm2Fixed9(col(vecCol)).as("n2"),
      VectorFns.signBucket(col(vecCol), bits).as("bucket"))
    val a = b.select(col("id").as("id_a"), col("v").as("va"), col("n2").as("n2a"), col("bucket"))
    val c = b.select(col("id").as("id_b"), col("v").as("vb"), col("n2").as("n2b"), col("bucket"))
    a.join(c, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFns.cosineFrom(VectorFns.dotFixed9(col("va"), col("vb")),
          col("n2a"), col("n2b")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * character `k`-gram, then keep the minimum hash of each sliding
    * window of `w` consecutive positions — a deterministic, position-
    * robust fingerprint set whose density is ~2/(w+1) regardless of
    * document length. The standard plagiarism/near-dup fingerprint when
    * token shingles are too coarse.
    *
    * Engine-portable (md5 over substrings, per-doc sorted digest);
    * row-local except one per-doc ordered window — the partition key is
    * the doc id, so no cross-doc skew (window length = doc length).
    * Emitted per doc: fingerprint count + an order-independent digest of
    * the fingerprint set (join-ready for exact-match clustering).
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    val parallelism = fanout(docs.sparkSession)
    val pos = docs.repartition(parallelism, col(idCol))
      .select(col(idCol).as("id"), lower(col(textCol)).as("t"))
      .filter(length(col("t")) >= k)
      .select(col("id"), explode(sequence(lit(1), length(col("t")) - (k - 1))).as("pos"),
        col("t"))
      .select(col("id"), col("pos"), md5(expr(s"substring(t, pos, $k)")).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    pos.withColumn("wmin", min(col("h")).over(win))
      .groupBy("id")
      .agg(countDistinct(col("wmin")).cast("int").as("n_fps"),
        md5(concat_ws("", sort_array(collect_set(col("wmin"))))).as("fp_digest"))
  }

  /** Fuzzy (edit-distance) near-dup pairs over SHORT strings — titles,
    * product names, URLs — where token shingles are too coarse. Pairs
    * are generated only within equality blocks (`blockCol`: e.g. a
    * (brand, head-token) key), pruned by a length-difference band
    * (|len(a)−len(b)| ≤ maxDist is a necessary condition for edit
    * distance ≤ maxDist and costs one codegen'd comparison), and only
    * then scored with the BOUNDED `levenshtein(a, b, maxDist)` — which
    * abandons a pair as soon as the running distance exceeds the
    * threshold, O(maxDist·len) instead of O(len²).
    *
    * Candidate volume is Σ block² — the caller's blocking key choice is
    * the scale lever, exactly as with [[jaccardPairs]]'s shingle blocks;
    * hot blocks are plain equi-join skew, AQE-splittable.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val b = df.select(col(idCol).as("id"), col(textCol).as("t"), blockCol.as("blk"))
    val a = b.select(col("id").as("id_a"), col("t").as("t_a"), col("blk"))
    val c = b.select(col("id").as("id_b"), col("t").as("t_b"), col("blk"))
    a.join(c, Seq("blk")).filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // bounded form returns -1 past the threshold
      .select("id_a", "id_b", "t_a", "t_b", "dist")
  }

  /** SimHash near-dup pairs: 32-bit signature over distinct tokens,
    * banded into 4×8-bit blocks for blocking, then exact Hamming
    * distance ≤ `maxHamming` on candidates.
    *
    * Engine-portable by construction: bit j of a token's hash is the low
    * bit of hex digit j of `md5(token)` — any engine with md5 derives the
    * identical signature, so a DuckDB oracle can verify the whole
    * pipeline (same trick as the MinHash operator).
    *
    * The 32 bit-votes are computed as 32 conditional-sum columns in ONE
    * hash aggregate over the token postings — not by exploding each
    * token into 32 bit rows, which would multiply the shuffle volume 32×.
    */
  /** The (id, simhash) 32-bit signature table — the maintainable STATE
    * for [[dedupIncrementSimhash]] (the SimHash counterpart of
    * [[lshBandState]]): bit j of a token's hash is the low bit of hex
    * digit j of md5(token), votes summed in ONE hash aggregate (never a
    * 32× bit explode). Callers append every batch doc's signature after
    * each batch — a rejected doc still blocks its own later near-dups.
    * Docs with zero tokens have no signature and are always admitted.
    */
  def simhashSignatures(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val parallelism = fanout(docs.sparkSession)
    val toks = docs.repartition(parallelism, col(idCol))
      .select(col(idCol).as("id"), explode(TextFns.tokens(col(textCol))).as("t"))
      .distinct()
      .withColumn("h", md5(col("t")))
    // low bit of a hex digit is 1 for exactly these nibbles
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    val voteCols = (0 until 32).map(j =>
      sum(when(substring(col("h"), j + 1, 1).isin(oddHex: _*), 1).otherwise(-1)).as(s"v_$j"))
    val sigExpr = (0 until 32).map(j =>
      when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    toks.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), sigExpr.as("simhash"))
  }

  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, s"4-band blocking covers maxHamming <= 3, got $maxHamming")
    // Feeds both sides of the band self-join — but that is ONE job, and
    // the two sides' plans are identical up to the band explode, so
    // Spark's ReuseExchange computes the signature subtree once within
    // it. No staging write needed (staging earns its parquet round-trip
    // only when consumers run as SEPARATE jobs — see [[staged]]).
    val sig = simhashSignatures(docs, idCol, textCol)
    // Blocking key: with 4 bands, `maxHamming` flips can dirty at most
    // `maxHamming` bands, so pairs within range agree on ≥ 4-maxHamming
    // bands. For maxHamming ≤ 2 that guarantees an agreeing PAIR of
    // bands — block on all C(4,2)=6 pairs: 16-bit cells shrink hot
    // blocks quadratically vs single-band 8-bit cells (templated corpora
    // cluster heavily on one band value), which is what bounds Σ|block|²
    // — the candidate volume — at scale. For maxHamming = 3 only a
    // single clean band is guaranteed, so fall back to single-band
    // blocking (coarser cells, full recall).
    // pair (k1,k2) encoded as bp = k1*4+k2, recovered as (bp div 4, bp % 4)
    val bandKeys =
      if (maxHamming <= 2) for (k1 <- 0 until 4; k2 <- k1 + 1 until 4) yield k1 * 4 + k2
      else 16 until 20 // sentinel ids for single bands 0..3
    val bandvalExpr =
      if (maxHamming <= 2)
        "(((simhash >> ((bp div 4) * 8)) & 255) << 8) | ((simhash >> ((bp % 4) * 8)) & 255)"
      else "(simhash >> ((bp - 16) * 8)) & 255"
    val banded = sig.select(col("id"), col("simhash"),
        explode(array(bandKeys.map(lit): _*)).as("bp"))
      .withColumn("bandval", expr(bandvalExpr))
    // Hamming filter BEFORE the pair-dedup: the band join can emit the
    // same pair several times, but filtering first shrinks the
    // distinct's input by orders of magnitude.
    banded.select(col("id").as("doc_a"), col("simhash").as("sig_a"), col("bp"), col("bandval"))
      .join(banded.select(col("id").as("doc_b"), col("simhash").as("sig_b"), col("bp"), col("bandval")),
        Seq("bp", "bandval"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** INCREMENTAL SimHash admission — [[dedupIncrementLsh]]'s sibling
    * for the Hamming-distance near-dup definition: a batch doc is
    * REJECTED iff its 32-bit signature is within `maxHamming` of any
    * signature already in the state or of a smaller-id batch member.
    * With id-ordered batches and the [[simhashSignatures]]
    * accumulate-everything contract, a multi-batch build admits exactly
    * the one-shot smaller-id ranking (q210 proves it under the oracle).
    *
    * Probe shape mirrors the LSH one: the unbounded state NEVER
    * shuffles — it bands row-locally on its own scan, semi-joins
    * map-side against a broadcast of the batch's (band, value) keys
    * (bounded by per-tick batch size), and only the hot rows reach the
    * Hamming check. State is one 8-byte signature per doc.
    */
  def dedupIncrementSimhash(batch: DataFrame, idCol: String, textCol: String,
                            maxHamming: Int, knownSigs: DataFrame): DataFrame = {
    val sigs = staged(simhashSignatures(batch, idCol, textCol), "inc_sh_sigs")
    dedupIncrementSimhashSigned(batch, idCol, sigs, maxHamming, knownSigs)
  }

  /** [[dedupIncrementSimhash]] with the batch's signatures PRECOMPUTED
    * (the [[dedupIncrementLshBanded]] pattern): a tick that also appends
    * the batch's [[simhashSignatures]] to the state computes them once
    * and probes with the same materialized frame.
    */
  def dedupIncrementSimhashSigned(batch: DataFrame, idCol: String,
                                  sigs: DataFrame, maxHamming: Int,
                                  knownSigs: DataFrame): DataFrame = {
    require(maxHamming <= 3, s"4-band blocking covers maxHamming <= 3, got $maxHamming")
    val bandKeys =
      if (maxHamming <= 2) for (k1 <- 0 until 4; k2 <- k1 + 1 until 4) yield k1 * 4 + k2
      else 16 until 20
    val bandvalExpr =
      if (maxHamming <= 2)
        "(((simhash >> ((bp div 4) * 8)) & 255) << 8) | ((simhash >> ((bp % 4) * 8)) & 255)"
      else "(simhash >> ((bp - 16) * 8)) & 255"
    def banded(df: DataFrame) = df
      .select(col("id"), col("simhash"), explode(array(bandKeys.map(lit): _*)).as("bp"))
      .withColumn("bandval", expr(bandvalExpr))
    val bBand = banded(sigs)
    val batchKeys = bBand.select("bp", "bandval").distinct()
    val hotState = banded(knownSigs.select(col("id"), col("simhash")))
      .join(broadcast(batchKeys), Seq("bp", "bandval"), "left_semi")
    val vsState = bBand.join(
        hotState.select(col("bp"), col("bandval"), col("simhash").as("sig_s")),
        Seq("bp", "bandval"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("sig_s"))).cast("int")
        <= maxHamming)
      .select(col("id"))
    val intra = bBand.join(
        bBand.select(col("id").as("id_b"), col("bp"), col("bandval"),
          col("simhash").as("sig_b")),
        Seq("bp", "bandval"))
      .filter(col("id_b") < col("id"))
      .filter(bit_count(col("simhash").bitwiseXOR(col("sig_b"))).cast("int")
        <= maxHamming)
      .select(col("id"))
    val rejected = vsState.union(intra).distinct()
      .withColumnRenamed("id", idCol)
    batch.join(rejected, Seq(idCol), "left_anti")
  }
}
