package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.{HashedId, MinKAggregator}

/** Deterministic sampling for training-data pipelines. Both operators
  * key the sample on a HASH of the row id, not on randomness: the same
  * corpus always yields the same sample (reproducible ablations), the
  * sample is engine-portable (md5 is the same everywhere, so an oracle
  * can verify it), and membership is decidable row-locally — no global
  * coordination, which is what lets it run as a pure map/aggregate at
  * any scale.
  */
object Sampling {

  /** Bernoulli-by-hash sample: keep rows whose `md5(id)` hex digest is
    * lexicographically below `thresholdHex`. The kept fraction is the
    * fraction of hash space below the threshold (e.g. "19" ≈ 16^-2·0x19
    * ≈ 9.8%). A pure, pushdown-friendly filter — no shuffle, no state.
    */
  def hashSample(df: DataFrame, idCol: String, thresholdHex: String): DataFrame = {
    // md5 renders LOWERCASE hex; an uppercase threshold would compare
    // lexicographically against it and silently keep ~nothing
    require(thresholdHex.nonEmpty && thresholdHex.forall(c => c.isDigit || ('a' to 'f').contains(c)),
      s"thresholdHex must be non-empty lowercase hex, got '$thresholdHex'")
    df.filter(md5(col(idCol).cast("string")) < thresholdHex)
  }

  /** Deterministic train/val/test split: each row's md5(id) digest is
    * compared against ascending hex thresholds and labeled with the
    * first bucket it falls under (the remainder gets `defaultLabel`).
    * The canonical dataset-split op: reproducible across runs and
    * engines, row-local (no shuffle), and STABLE under corpus growth —
    * a document keeps its split when new data arrives, because
    * membership depends only on its own id.
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, String)], defaultLabel: String,
                  outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty)
    require(splits.map(_._2) == splits.map(_._2).sorted,
      s"split thresholds must be ascending hex, got ${splits.map(_._2)}")
    splits.foreach { case (_, hex) =>
      require(hex.nonEmpty && hex.forall(c => c.isDigit || ('a' to 'f').contains(c)),
        s"threshold must be lowercase hex, got '$hex'")
    }
    val h = md5(col(idCol).cast("string"))
    val labeled = splits.foldLeft(Option.empty[Column]) { case (acc, (label, hex)) =>
      Some(acc.fold(when(h < hex, label))(_.when(h < hex, label)))
    }.get.otherwise(defaultLabel)
    df.withColumn(outCol, labeled)
  }

  /** LEAKAGE-SAFE dataset split: assign train/val/test at the near-dup
    * CLUSTER level, not the document level — documents connected by
    * `pairs` (a near-dup edge list, e.g. minhash-LSH verified pairs)
    * all inherit the split of their cluster representative, so two
    * near-duplicates can NEVER straddle train and test (the classic
    * silent-eval-contamination bug of doc-level hash splits; held-out
    * loss is meaningless when the training set contains a 0.9-jaccard
    * twin of the test doc). Singleton docs split by their own id.
    *
    * Mechanics: [[Graph.connectedComponents]] labels the pair graph
    * (clique-like → 2-3 staged rounds), docs left-join the labels
    * (cluster rep = label, self for singletons), and [[splitByHash]]
    * runs on the REP, so the whole cluster draws one ticket. Output:
    * the input plus (rep, split). One extra shuffle vs doc-level
    * splitting — the labels join.
    */
  def splitByCluster(df: DataFrame, idCol: String, pairs: DataFrame,
                     aCol: String, bCol: String,
                     splits: Seq[(String, String)], defaultLabel: String,
                     outCol: String = "split"): DataFrame = {
    val labels = Graph.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("cluster").as("rep"))
    val withRep = df.join(labels, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
    splitByHash(withRep, "rep", splits, defaultLabel, outCol)
  }

  /** Fixed-size stratified sample: the `k` rows with the smallest
    * (md5(id), id) per stratum — a deterministic uniform draw within
    * each stratum. Runs as a bounded-buffer min-k aggregate
    * ([[graft.expr.MinKAggregator]]): partial buffers hold ≤ k entries
    * and combine map-side, so a billion-row stratum still ships only
    * k rows per map partition — no per-stratum sort, no window spill.
    *
    * Output: (stratum, id, rn) with rn = 1..k in hash order.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0)
    // the id must survive a lossless cast to long (the hash is over its
    // STRING form, but ordering/tie-break and output use the long) —
    // fail loudly rather than silently dropping null-cast rows
    require(Seq("byte", "short", "int", "integer", "long", "bigint")
        .contains(df.schema(idCol).dataType.typeName),
      s"stratifiedSample needs an integral id column, got " +
        s"${df.schema(idCol).dataType.typeName} for '$idCol'")
    val spark = df.sparkSession
    import spark.implicits._
    val minK = new MinKAggregator(k).toColumn
    df.select(col(stratumCol).cast("string"), md5(col(idCol).cast("string")),
        col(idCol).cast("long"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, h, id) => HashedId(h, id) }
      .agg(minK.name("sample"))
      .flatMap { case (stratum, picked) =>
        // rn as Long: the oracle's row_number() is 64-bit and the driver
        // compares output schemas, not just values
        picked.zipWithIndex.map { case (x, i) => (stratum, x.id, (i + 1).toLong) }
      }
      .toDF(stratumCol, idCol, "rn")
  }

  /** Deterministic WEIGHTED sampling without replacement, integer
    * weights: item x draws min_{0 ≤ j < w(x)} md5("<j>:<x>") as its
    * priority and the sample is the bottom-k by (priority, id).
    *
    * Exactness: ranking items by their minimum draw is equivalent to
    * expanding item x into w(x) tickets, uniformly permuting all
    * W = Σw tickets (sorting iid draws IS a uniform permutation), and
    * keeping items in first-occurrence order — which realizes successive
    * weighted-without-replacement odds EXACTLY for every draw, not just
    * the first: P(next = j | drawn set S) = w(j) / (W − Σ_{i∈S} w(i)),
    * because the remaining tickets stay exchangeable at every step.
    * (This is the classic expanded-population equivalence for integer
    * weights; no Efraimidis–Spirakis u^(1/w) keys — and hence no
    * cross-engine floating-point pow/ln — are needed.)
    *
    * CAVEAT — `wCap`: items with weight > wCap draw only wCap tickets,
    * so they compete as if their weight were wCap; odds are exact only
    * when all weights ≤ wCap. Zero-weight items never sample (no draws).
    * Reproducible, engine-portable (md5), and decidable per row.
    *
    * The draw explode is bounded by `wCap` rows per item (cap weights
    * or pre-bucket ultra-heavy items); the per-item min combines
    * map-side, and the bottom-k runs as TakeOrdered (per-partition
    * top-k, never a global sort materialization).
    */
  /** Temperature-flattened MIXTURE sampling across sources (the data-
    * mixing step of LLM pretraining: upweight small sources, downweight
    * the dominant crawl). Source s with n_s of N docs gets mass
    * q_s ∝ (n_s/N)^(1/T) at temperature T = 2. Every doc then draws a
    * deterministic 28-bit uniform — the first 7 hex digits of md5(id),
    * compared LEXICOGRAPHICALLY against the per-source threshold
    * rendered as zero-padded hex (the q56 hash-sample idiom: string
    * compare avoids any hex→int conversion the oracle engine might
    * lack):
    *
    *   keep ⟺ md5(id)[0,7) < hex₇((budget · w_s · 2²⁸) div (Z · n_s)),
    *   w_s = iroot₂(n_s·10¹² div N),  Z = Σ w_s
    *
    * (thresholds ≥ 2²⁸ keep everything) — all integer arithmetic, so
    * the kept set is engine-portable. E[kept per source] ≈
    * budget · w_s / Z: the temperature-weighted allocation. Output:
    * (id, source, kept) for every doc + the per-source quota columns
    * for inspection. Arbitrary rational T: [[mixtureSampleT]].
    *
    * Scale: per-source stats are one tiny aggregate (broadcast back);
    * the draw is a row-local codegen'd filter — the whole operator adds
    * ZERO wide shuffles beyond the stats aggregate.
    */
  def mixtureSample(df: DataFrame, idCol: String, srcCol: String,
                    budget: Long): DataFrame =
    mixtureSampleT(df, idCol, srcCol, budget, tNum = 2, tDen = 1)

  /** [[mixtureSample]] at arbitrary RATIONAL temperature T = tNum/tDen
    * ≥ 1 (e.g. 3/2, 3/1): source mass q_s ∝ (n_s/N)^(tDen/tNum),
    * engine-exact. General pow can't be used directly — libm pow is not
    * correctly rounded and differs across engines — so the weight is an
    * exact INTEGER root: with share = n_s·10¹² div N,
    *
    *   w_s = ⌊(share^tDen)^(1/tNum)⌋
    *
    * computed as a float-seeded, integer-corrected nth root: seed
    * r₀ = ⌊pow(X, 1/tNum)⌋ in double (within ~1 ulp on any libm, and
    * engines may round vs truncate the cast differently — both absorbed
    * by the correction), then pick the largest candidate
    * c ∈ {r₀−2..r₀+2} with c^tNum ≤ X, the comparison done in
    * Decimal(38,0) — exact, so every engine lands on the identical w_s
    * regardless of its libm. All products run in Decimal(38,0):
    * X = share^tDen ≤ 10^(12·tDen) ≤ 10³⁶ and the threshold product
    * budget·w_s·2²⁸ ≤ 10³³ both fit with slack, so there is NO Int64
    * overflow anywhere in the operator's domain — including the
    * billion-document sources and large budgets a 100 TB corpus has.
    *
    * Quota monotonicity (MixtureSpec): raising T flattens — the rare
    * source's share of Z strictly grows, the dominant source's shrinks.
    */
  def mixtureSampleT(df: DataFrame, idCol: String, srcCol: String,
                     budget: Long, tNum: Int, tDen: Int): DataFrame = {
    require(tNum >= 1 && tDen >= 1, s"temperature must be positive, got $tNum/$tDen")
    require(tDen <= tNum, s"temperature T = tNum/tDen must be >= 1 (flattening), got $tNum/$tDen")
    require(tNum <= 6 && tDen <= 3,
      s"tNum <= 6 and tDen <= 3 keep share^tDen and candidate^tNum inside Decimal(38,0), got $tNum/$tDen")
    // budget bounded by the corpus scale it allocates over; with the
    // decimal threshold product (<= 1e12·1e12·2^28 ~ 2.7e32 < 1e38)
    // there is no arithmetic constraint below 1e12.
    require(budget >= 1 && budget <= 1000000000000L,
      s"budget must be in [1, 1e12], got $budget")
    val dec = "decimal(38,0)"
    // exact integer share in [0, 1e12]; decimal keeps n_s·1e12 exact for
    // ANY source size (Int64 would corrupt sources past ~9.2e6 docs)
    val shareExpr =
      s"cast(cast(n_s as $dec) * 1000000000000 as $dec) div cast(n_total as $dec)"
    def powDec(c: String): String =
      (1 until tNum).foldLeft(s"cast(($c) as $dec)")((a, _) => s"($a * ($c))")
    val invT = 1.0 / tNum // shortest-repr double literal: parses identically everywhere
    val rootExpr =
      s"""case when ${powDec("r0 + 2")} <= xv then r0 + 2
         |     when ${powDec("r0 + 1")} <= xv then r0 + 1
         |     when ${powDec("r0")} <= xv then r0
         |     when ${powDec("r0 - 1")} <= xv then r0 - 1
         |     else greatest(r0 - 2, 0) end""".stripMargin
    val stats = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val tot = stats.agg(sum(col("n_s")).as("n_total"))
    val w = stats.crossJoin(broadcast(tot))
      .withColumn("share", expr(shareExpr))
      .withColumn("xv", expr(
        (1 until tDen).foldLeft(s"cast(share as $dec)")((a, _) => s"($a * share)")))
      .withColumn("r0", expr(s"cast(pow(cast(xv as double), $invT) as bigint)"))
      .withColumn("w_s", expr(rootExpr))
      .drop("share", "xv", "r0")
    val z = w.agg(sum(col("w_s")).as("z"))
    df.select(col(idCol).as("id"), col(srcCol))
      .join(broadcast(w), Seq(srcCol))
      .crossJoin(broadcast(z))
      .withColumn("thr", expr(
        s"(cast($budget as $dec) * w_s * 268435456) div (cast(z as $dec) * n_s)"))
      .withColumn("kept", col("thr") > lit(268435455L) ||
        substring(md5(col("id").cast("string")), 1, 7) <
          lpad(lower(hex(col("thr"))), 7, "0"))
      .select(col("id").as(idCol), col(srcCol), col("n_s"), col("w_s"), col("kept"))
  }

  /** DATA-CONSTRAINED epoched mixture (the Muennighoff et al. 2023
    * regime: when the temperature-flattened allocation asks a source
    * for more than it has, REPEAT it — up to `maxEpochs` — and
    * redistribute what still cannot be served): bounded-round integer
    * waterfilling over the per-source plan, then a row-local epoch
    * materialization.
    *
    * Plan (exact Long arithmetic on the per-source table — a bounded
    * metadata collect, like every model/plan table in this repo):
    * T = 2 weights w_s = ⌊√(n_s·10¹² div N)⌋ (the [[mixtureSample]]
    * weight); `rounds` waterfill rounds, each allocating the remaining
    * budget ∝ w_s among sources below their n_s·maxEpochs cap, clipped
    * to headroom. Integer-division dust and any residual after the
    * fixed rounds go deliberately unserved — deterministic, and the
    * oracle replays every round.
    *
    * Materialization (row-local, zero extra shuffles): each source's
    * served budget splits into ⌊served/n_s⌋ FULL epochs every doc gets,
    * plus a fractional epoch drawn by the md5-prefix threshold rule
    * (expected-count fractional membership — the [[mixtureSample]]
    * discipline, scale-free: no per-source top-frac selection, which
    * would be an unbounded-k window at corpus scale).
    *
    * Output: one row per (doc, epoch): (id, src, epoch, n_s, served_s).
    */
  def epochedMixture(df: DataFrame, idCol: String, srcCol: String,
                     budget: Long, maxEpochs: Int, rounds: Int = 3): DataFrame =
    epochedMixtureBy(df, idCol, srcCol, lit(1L), budget, maxEpochs, rounds)

  /** [[epochedMixture]] with the budget and per-source masses measured
    * in an arbitrary per-row WEIGHT (token or char counts — the unit
    * real training budgets use — instead of docs): n_s = Σ weight over
    * the source, caps = n_s·maxEpochs, and the waterfill allocates
    * weight units. The fractional epoch stays a per-DOC md5-threshold
    * draw, so the served weight of the partial epoch is
    * expectation-exact (Σ wᵢ·frac/n_s = frac) — the scale-free
    * discipline; an exactly-weighted partial epoch would need a
    * per-source weighted prefix selection, an unbounded sort at corpus
    * scale. Budgets above 1e12 should switch to a coarser unit
    * (thousands of tokens) — the plan arithmetic is capped there.
    */
  def epochedMixtureBy(df: DataFrame, idCol: String, srcCol: String,
                       weight: org.apache.spark.sql.Column, budget: Long,
                       maxEpochs: Int, rounds: Int = 3): DataFrame = {
    require(budget >= 1 && budget <= 1000000000000L,
      s"budget must be in [1, 1e12], got $budget")
    require(maxEpochs >= 1 && maxEpochs <= 100,
      s"maxEpochs must be in [1,100], got $maxEpochs")
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8], got $rounds")
    val spark = df.sparkSession
    val stats = df.groupBy(col(srcCol).cast("string").as("src"))
      .agg(sum(weight.cast("long")).as("n_s")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    // every source's mass must be POSITIVE: served/n_s and served%n_s
    // divide by it, and a zero/negative sum (all-null or negative
    // weights) would throw mid-plan or build a nonsense mixture
    stats.foreach { case (src, nS) =>
      require(nS > 0,
        s"source '$src' has non-positive total weight $nS — weights must " +
          "be non-negative with a positive per-source sum") }
    val n = stats.map(_._2).sum
    require(n > 0, "epochedMixture needs a non-empty corpus")
    // w_s = ⌊√share⌋, float-seeded + integer-corrected so it equals the
    // oracle's floor(sqrt(double)) at every representable share
    val plan0 = stats.map { case (src, nS) =>
      val share = (BigInt(nS) * BigInt(1000000000000L) / BigInt(n)).toLong
      val w0 = math.sqrt(share.toDouble).toLong
      val w = Seq(w0 + 1, w0, w0 - 1, w0 - 2)
        .find(c => c >= 0 && BigInt(c) * BigInt(c) <= BigInt(share)).getOrElse(0L)
      (src, nS, w, 0L) // (src, n_s, w_s, served)
    }
    val planFinal = (1 to rounds).foldLeft(plan0.toSeq) { (plan, _) =>
      val residual = budget - plan.map(_._4).sum
      val z = plan.filter(p => p._4 < p._2 * maxEpochs).map(_._3).sum
      if (residual <= 0 || z <= 0) plan
      else plan.map { case (src, nS, w, served) =>
        val cap = nS * maxEpochs
        val alloc = if (served < cap)
          (BigInt(residual) * BigInt(w) / BigInt(z)).toLong else 0L
        (src, nS, w, served + math.min(alloc, cap - served))
      }
    }
    import spark.implicits._
    val plan = planFinal.map { case (src, nS, w, served) =>
      val thr = (BigInt(served % nS) * BigInt(268435456L) / BigInt(nS)).toLong
      (src, nS, w, served, served / nS,
        // 7-hex-digit threshold, the mixtureSample compare
        String.format("%7s", java.lang.Long.toHexString(thr)).replace(' ', '0'))
    }.toDF("src", "n_s", "w_s", "served_s", "full_e", "thr_hex")
    df.select(col(idCol).as("id"), col(srcCol).cast("string").as("src"))
      .join(broadcast(plan), Seq("src"))
      .withColumn("epochs", col("full_e") +
        when(substring(md5(col("id").cast("string")), 1, 7) < col("thr_hex"), 1L)
          .otherwise(0L))
      .filter(col("epochs") >= 1)
      .select(col("id").as(idCol), col("src").as(srcCol),
        explode(sequence(lit(1L), col("epochs"))).as("epoch"),
        col("n_s"), col("served_s"))
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, wCap: Int): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1, got $k")
    require(wCap >= 1, s"weight cap must be >= 1, got $wCap")
    df.select(col(idCol), col(weightCol).cast("long").as("weight"))
      .filter(col("weight") >= 1)
      .select(col(idCol), col("weight"),
        explode(sequence(lit(0), least(col("weight"), lit(wCap.toLong)) - 1)).as("j"))
      .select(col(idCol), col("weight"),
        md5(concat(col("j").cast("string"), lit(":"), col(idCol).cast("string"))).as("d"))
      .groupBy(col(idCol), col("weight"))
      .agg(min(col("d")).as("priority"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** CLUSTER-CAPPED representative sampling — the diversity
    * generalization of single-keeper compaction (q62 keeps 1 per
    * near-dup cluster; real curation often keeps k > 1 for intra-
    * cluster diversity): per cluster, rank members by a deterministic
    * md5 draw (id tie-break) and keep the first `m`. Adds
    * (pick_rank, kept); singleton clusters always survive. One shuffle
    * on the cluster key; the window orders only within each cluster.
    */
  def capPerCluster(df: DataFrame, idCol: String, clusterCol: String,
                    m: Int): DataFrame = {
    require(m >= 1, s"cap must be >= 1, got $m")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(clusterCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("pick_rank", row_number().over(w))
      .withColumn("kept", col("pick_rank") <= m)
  }

  /** QUALITY-AWARE cluster keeper — what production dedup actually does
    * (RefinedWeb/FineWeb keep the LONGEST / highest-quality member of
    * each near-dup cluster, never a random one): per cluster, rank by
    * (scoreCol desc, id asc) and keep the first `m`. Same one-shuffle
    * window shape as [[capPerCluster]]; the draw is replaced by the
    * quality signal.
    */
  def keepBestPerCluster(df: DataFrame, idCol: String, clusterCol: String,
                         scoreCol: String, m: Int): DataFrame = {
    require(m >= 1, s"cap must be >= 1, got $m")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(clusterCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("pick_rank", row_number().over(w))
      .withColumn("kept", col("pick_rank") <= m)
  }

  /** DOREMI-STYLE DOMAIN REWEIGHTING (Xie et al. 2023's outer loop,
    * deterministic form) — multiplicative-weights over corpus domains
    * driven by per-domain excess loss: each round,
    *
    *   w_s ← normalize( w_s · 2^(η·(loss_s − avg_w(loss))/1000) )
    *
    * so domains the proxy model finds HARDER than the weighted average
    * gain mixture share. The 2^x lives in MILLI-bit integer arithmetic
    * (the [[CorpusText.mlog2Sql]] family: 2^(m/1000) ≈
    * (1000 + m%1000)·2^(m/1000) /1000, applied to the |excess| with the
    * sign choosing multiply vs divide — negative integer division never
    * happens, the cross-engine trap), so every round's weights are
    * engine-exact. The exponent clamps at 15000 milli-bits (2^15) per
    * round.
    *
    * Losses are whatever the caller's proxy produces (per-domain
    * perceptron error mass, surprisal, OOV rate…) in non-negative
    * MILLI units. The per-domain loss table is metadata-scale, so the
    * rounds run driver-side exactly like [[epochedMixtureBy]]'s
    * waterfill plan; the result joins back onto data by `src`.
    *
    * @return one row per (src, round): (src, round, loss_milli,
    *         w_micro) with Σ_s w_micro ≈ 1e6 per round
    */
  def domainReweight(losses: DataFrame, srcCol: String, lossCol: String,
                     rounds: Int, etaMilli: Long): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    require(etaMilli >= 1 && etaMilli <= 4000,
      s"etaMilli must be in [1,4000], got $etaMilli")
    val spark = losses.sparkSession
    val ls = losses
      .select(col(srcCol).cast("string"), col(lossCol).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(ls.nonEmpty, "domainReweight needs at least one domain")
    ls.foreach { case (s, l) =>
      require(l >= 0, s"domain '$s' has negative loss $l — losses are milli-units >= 0") }
    def pow2m(xm: Long): Long = // 2^(xm/1000) in milli units, xm >= 0
      (1000L + xm % 1000L) << (xm / 1000L)
    var w = ls.map(_ => 1000000L / ls.size)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    (1 to rounds).foreach { r =>
      val avg = ls.indices.map(i => w(i) * ls(i)._2).sum / 1000000L
      val wu = ls.indices.map { i =>
        val loss = ls(i)._2
        if (loss >= avg) {
          val xm = math.min(etaMilli * (loss - avg) / 1000L, 15000L)
          w(i) * pow2m(xm) / 1000L
        } else {
          val xm = math.min(etaMilli * (avg - loss) / 1000L, 15000L)
          w(i) * 1000L / pow2m(xm)
        }
      }
      val tot = wu.sum
      w = wu.map(x => x * 1000000L / tot).toArray
      ls.indices.foreach(i => out += ((ls(i)._1, r.toLong, ls(i)._2, w(i))))
    }
    import spark.implicits._
    out.toSeq.toDF("src", "round", "loss_milli", "w_micro")
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * NeurIPS 2023), the targeted-pretraining selection stage: score
    * every raw document by how much its hashed n-gram profile looks
    * like a TARGET corpus rather than the raw pool, under two
    * bag-of-hashed-ngrams models:
    *
    *   score(x) = Σ_b cnt_b(x) · [log p̂_tgt(b) − log p̂_raw(b)]
    *
    * with add-one smoothing over the `buckets` hashed features
    * (uni+bigram, [[Classifier.featureBuckets]] — the same feature
    * space the classifier gate uses). Logs are MILLI-BIT integer log2
    * ([[CorpusText.mlog2Sql]], the BM25/KN discipline): pure integer
    * ops, monotone, ≤ 0.086-bit error — so scores are engine-exact and
    * partitioning-independent, where a float log formulation could
    * never hash-match.
    *
    * Scale shape: both corpora featurize once (row-local codegen
    * hashing + one map-side-combining count each); the per-bucket
    * log-ratio table is `buckets` rows (broadcast); a doc's score is
    * one broadcast join + per-doc sum — no shuffle carries more than
    * the feature-count tables. Docs with zero tokens have no features
    * and drop out (they carry no evidence either way).
    *
    * Output: (id, dsir_mb, n_feat) — milli-bit log-ratio score and the
    * doc's feature mass (callers often length-normalize).
    */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"buckets must be in [2, 2^20], got $buckets")
    val spark = raw.sparkSession
    // the raw-corpus feature table feeds BOTH the per-bucket counts and
    // the final score join — stage once so the raw corpus tokenizes
    // exactly once (the target side has a single consumer)
    val fr = Staging.stage(
      Classifier.featureBuckets(raw, idCol, textCol, buckets), "dsir_fr").df
    val ft = Classifier.featureBuckets(target, idCol, textCol, buckets)
    val rawCnt = fr.groupBy("bucket").agg(sum(col("cnt")).as("c_raw"))
    val tgtCnt = ft.groupBy("bucket").agg(sum(col("cnt")).as("c_tgt"))
    val grid = spark.range(buckets).select(col("id").as("bucket"))
    val st = grid.join(tgtCnt, Seq("bucket"), "left")
      .join(rawCnt, Seq("bucket"), "left")
      .select(col("bucket"),
        (coalesce(col("c_tgt"), lit(0L)) + 1L).as("ct"),
        (coalesce(col("c_raw"), lit(0L)) + 1L).as("cr"))
    val tots = st.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    import CorpusText.mlog2Sql
    val scoreTbl = st.crossJoin(broadcast(tots))
      .select(col("bucket"),
        (expr(mlog2Sql("ct")) - expr(mlog2Sql("cr"))
          - expr(mlog2Sql("nt")) + expr(mlog2Sql("nr"))).as("s_mb"))
    fr.join(broadcast(scoreTbl), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("s_mb")).as("dsir_mb"),
        sum(col("cnt")).as("n_feat"))
  }

  /** Top-k DSIR selection: rank [[dsirScores]] by (score desc, id) and
    * keep `k` — the deterministic selection variant (the md5-draw
    * resampling DSIR describes needs Gumbel floats that no two engines
    * compute identically; top-k on the integer score is the
    * reproducible form, and at selection ratios below ~1/10 the two
    * pick nearly identical sets). The global sort is a bounded TopK
    * (orderBy.limit), never a full sort; the rank window runs over the
    * k survivors only.
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dsir_mb").desc, col(idCol))
    dsirScores(raw, target, idCol, textCol, buckets)
      .orderBy(col("dsir_mb").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(w))
  }
}
