package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Hashed-feature LINEAR CLASSIFIER inference — the fastText-shaped
  * model-scoring stage of production training-data pipelines (CCNet's
  * fastText langid, FineWeb-Edu's educational-quality scorer, DCLM's
  * quality classifier all run exactly this dataflow over every crawl
  * document): bag of word unigrams + bigrams, feature-hashed into B
  * buckets, scored against a (bucket, class) weight table, argmax per
  * document with the runner-up margin as the confidence signal.
  *
  * 100 TB shape: the model is VOCABULARY-SIZED (B·C rows) and
  * broadcasts; the corpus pays one tokenize, one row-local bigram
  * zip, one explode, and two hash aggregations. Duplicate features
  * collapse to (doc, bucket, count) BEFORE the ×C model join, so the
  * joined row count is bounded by distinct-buckets-per-doc · C, not
  * token count · C. Weights are integer milli-units: scores are exact
  * long sums — associative, partitioning-independent, and
  * hash-matchable against a SQL oracle (no float drift ever).
  */
object Classifier {

  /** 60-bit md5 hash (15 hex digits → positive long) — the
    * engine-portable hash discipline shared with [[Sketches]]. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-document hashed feature counts: (id, bucket, cnt), one row per
    * DISTINCT feature bucket. Features are word unigrams plus
    * adjacent-pair bigrams ("a_b"), built row-locally from the token
    * array (no self-join), hashed into [0, buckets).
    */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame =
    // fused codegen expression — bit-identical to the composable HOF
    // formulation below (ClassifierSpec proves it): one native loop
    // hashes unigrams + bigrams straight to buckets, replacing the
    // interpreted zip_with bigram lambda + per-feature md5 Column
    // chain that dominated the classifier profile
    docs.select(col(idCol), TextFns.tokens(col(textCol)).as("w"))
      .select(col(idCol),
        explode(graft.expr.FeatureBuckets.featureBuckets(col("w"), buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The composable Column formulation of [[featureBuckets]] — kept as
    * the reference implementation the fused expression is spec-checked
    * against (and the fallback for engines without custom expressions).
    */
  def featureBucketsHof(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int): DataFrame = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    val n = size(col("w"))
    val bigrams = when(n >= lit(2),
      zip_with(slice(col("w"), lit(1), n - 1), slice(col("w"), lit(2), n - 1),
        (a, b) => concat(a, lit("_"), b)))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), TextFns.tokens(col(textCol)).as("w"))
      .select(col(idCol), explode(concat(col("w"), bigrams)).as("f"))
      .select(col(idCol), (h60(col("f")) % buckets).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic md5-derived weight table — the TEST FIXTURE standing
    * in for a trained model (a real deployment loads its trained
    * weights into the same (bucket, cls, w) shape): milli-unit integers
    * in [-1000, 1000], reproducible by any engine from its own md5.
    */
  def syntheticModel(spark: SparkSession, buckets: Int, nClasses: Int): DataFrame =
    spark.range(buckets).select(col("id").as("bucket"))
      .crossJoin(spark.range(nClasses).select(col("id").as("cls")))
      .select(col("bucket"), col("cls"),
        (h60(concat(col("bucket").cast("string"), lit(":"), col("cls").cast("string")))
          % 2001 - 1000).as("w"))

  /** [[predict]] as the ACTUAL fastText serving architecture: the
    * bounded (B·C) weight table collects to one flat long[] (the Bloom
    * bounded-broadcast contract) and rides inside the codegen'd
    * [[graft.expr.LinearScores]] expression, so every document's C
    * scores AND the argmax/margin compute ROW-LOCALLY — inference is
    * one corpus scan with ZERO exchanges (no feature explode, no
    * (doc, bucket) aggregate, no model join). Bit-identical to
    * [[predict]] (spec-proved); requires nClasses ≥ 2 and a complete
    * model (every (bucket, cls) pair present).
    */
  def predictFused(docs: DataFrame, idCol: String, textCol: String,
                   model: DataFrame, buckets: Int): DataFrame = {
    val rows = model.select(col("bucket").cast("long"), col("cls").cast("long"),
      col("w").cast("long")).collect()
    val nClasses = (rows.iterator.map(_.getLong(1)).max + 1).toInt
    require(nClasses >= 2, s"need >= 2 classes, got $nClasses")
    require(rows.length == buckets * nClasses,
      s"model must cover all ${buckets}x$nClasses (bucket, cls) pairs, got ${rows.length} rows")
    val weights = new Array[Long](buckets * nClasses)
    rows.foreach(r => weights(r.getLong(0).toInt * nClasses + r.getLong(1).toInt) = r.getLong(2))
    val scores = graft.expr.LinearScores.linearScores(col("__w"), weights, buckets, nClasses)
    // row-local argmax with smallest-class tie-break: array_position
    // finds the FIRST occurrence of the max; the margin masks out that
    // index and takes the max of the rest (C is small and fixed)
    docs.select(col(idCol), TextFns.tokens(col(textCol)).as("__w"))
      .filter(size(col("__w")) > 0)
      .select(col(idCol), scores.as("__s"))
      .withColumn("best_score", array_max(col("__s")))
      .withColumn("pred_cls", array_position(col("__s"), col("best_score")) - 1)
      .withColumn("margin", col("best_score") - array_max(
        zip_with(col("__s"), sequence(lit(0L), lit(nClasses - 1L)),
          (s, i) => when(i === col("pred_cls"), lit(Long.MinValue)).otherwise(s))))
      .select(col(idCol), col("pred_cls"), col("best_score"), col("margin"))
  }

  /** BATCH AVERAGED-PERCEPTRON TRAINING — the other half of the
    * classifier family ([[predictFused]] serves what this trains; the
    * md5 fixture in [[syntheticModel]] is no longer the only weight
    * source). One round = one full pass with FROZEN weights: score
    * every labeled document, and for each misclassified one push its
    * feature counts toward the true class and away from the predicted
    * class; all updates of a round aggregate into one (bucket, cls)
    * delta and apply at the round barrier. Returned weights are the
    * SUM over the R round snapshots — the integer-exact formulation of
    * the averaged perceptron (argmax is invariant under the ×R scale,
    * and exact long arithmetic means any engine lands on bit-identical
    * weights; no learning-rate float anywhere).
    *
    * Spark-first shape, same staged-rounds discipline as
    * [[Bpe.trainBpe]] (reference pattern `server/etl.py:27-73` has no
    * training at all — this is extension surface): the corpus is
    * featurized ONCE and staged; each round then touches only the
    * staged (doc, bucket, cnt, label) table — one broadcast model
    * join + two aggregates per round, O(1) plan depth via per-round
    * staging of the B·C weight table. A 100 TB corpus pays R scans of
    * its vocabulary-hashed feature table, never R re-tokenizations,
    * and the shuffles are bounded by distinct (doc, cls) and (bucket,
    * cls) — not token volume.
    *
    * @param labelCol integer class label in [0, nClasses)
    * @return complete (bucket, cls, w) weight table — every pair
    *         present, [[predictFused]]-ready
    */
  def trainPerceptron(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, buckets: Int, nClasses: Int,
                      rounds: Int): DataFrame = {
    require(nClasses >= 2, s"need >= 2 classes, got $nClasses")
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    val spark = docs.sparkSession
    val feats = Staging.stage(
      featureBuckets(docs, idCol, textCol, buckets)
        .join(docs.select(col(idCol), col(labelCol).cast("long").as("__lab")),
          Seq(idCol)),
      "perceptron_feats")
    // an out-of-range/null label would SILENTLY corrupt training: its
    // positive update drops out of the (bucket, cls) grid left-join
    // while its negative push against the predicted class still lands —
    // fail loudly instead (one cheap scan of the staged feature table)
    val badLabels = feats.df.filter(col("__lab").isNull ||
      col("__lab") < 0 || col("__lab") >= nClasses).count()
    require(badLabels == 0L,
      s"$badLabels feature rows have a null or out-of-range label " +
        s"(labelCol must be an integer in [0, $nClasses))")
    val grid = spark.range(buckets).select(col("id").as("bucket"))
      .crossJoin(spark.range(nClasses).select(col("id").as("cls")))
    def roundStep(w: DataFrame): DataFrame = {
      val preds = feats.df.join(broadcast(w), Seq("bucket"))
        .groupBy(col(idCol), col("__lab"), col("cls"))
        .agg(sum(col("cnt") * col("w")).as("score"))
        .groupBy(col(idCol), col("__lab"))
        .agg(sort_array(collect_list(struct(col("score").as("s"),
          (-col("cls")).as("nc"))), asc = false).as("r"))
        .select(col(idCol), col("__lab"), (-col("r")(0)("nc")).as("__pred"))
      val mis = preds.filter(col("__pred") =!= col("__lab"))
      val delta = feats.df.join(mis.select(col(idCol), col("__lab").as("__l"),
          col("__pred").as("__p")), Seq(idCol))
        .select(col("bucket"), explode(array(
          struct(col("__l").as("cls"), col("cnt").as("dw")),
          struct(col("__p").as("cls"), (-col("cnt")).as("dw")))).as("u"))
        .groupBy(col("bucket"), col("u.cls").as("cls"))
        .agg(sum(col("u.dw")).as("dw"))
      w.join(delta, Seq("bucket", "cls"), "left")
        .select(col("bucket"), col("cls"),
          (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
    }
    var cur = Staging.stage(grid.withColumn("w", lit(0L)), "perceptron_w0")
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Staging.Staged]
    (1 to rounds).foreach { r =>
      val next = Staging.stage(roundStep(cur.df), s"perceptron_w$r")
      if (snaps.isEmpty) cur.delete() // w0 is all zeros — not a snapshot
      snaps += next
      cur = next
    }
    val summed = Staging.stage(
      snaps.map(_.df).reduce(_.unionByName(_))
        .groupBy("bucket", "cls").agg(sum(col("w")).as("w")),
      "perceptron_wsum")
    snaps.foreach(_.delete())
    feats.delete()
    summed.df
  }

  /** MULTINOMIAL NAIVE BAYES training — the counting member of the
    * classifier-training family next to the mistake-driven perceptron
    * ([[trainPerceptron]]): the entire fit is ONE grouped count over
    * the hashed feature table (plus a doc count for priors), which
    * makes it the cheapest trainable quality/language gate and the
    * only one whose training is embarrassingly mergeable (counts are
    * additive — shard fits combine by summation; incremental refresh
    * is adding the new batch's counts).
    *
    * Add-one smoothed, in exact MILLI-BIT integer log2 (the BM25/KN/
    * DSIR discipline — no float log anywhere, so the trained weights
    * and every downstream score are engine- and partitioning-exact):
    *
    *   w(b, c)  = mlog2(fc(b,c) + 1) − mlog2(tot(c) + buckets)
    *   prior(c) = mlog2(n(c) + 1) − mlog2(N + nClasses)
    *
    * Returns (model, priors): `model` is the COMPLETE (bucket, cls, w)
    * grid — [[predictFused]]-compatible where uniform priors suffice —
    * and `priors` is (cls, prior). Null/out-of-range labels fail
    * loudly (the [[trainPerceptron]] discipline).
    */
  def trainNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, buckets: Int,
                      nClasses: Int): (DataFrame, DataFrame) = {
    require(nClasses >= 2, s"need >= 2 classes, got $nClasses")
    val spark = docs.sparkSession
    val labels = docs.select(col(idCol), col(labelCol).cast("long").as("__lab"))
    val bad = labels.filter(col("__lab").isNull ||
      col("__lab") < 0 || col("__lab") >= nClasses).count()
    require(bad == 0L,
      s"$bad documents have a null or out-of-range label " +
        s"(labelCol must be an integer in [0, $nClasses))")
    val fc = featureBuckets(docs, idCol, textCol, buckets)
      .join(labels, Seq(idCol))
      .groupBy(col("__lab").as("cls"), col("bucket"))
      .agg(sum("cnt").as("fc"))
    val tot = fc.groupBy("cls").agg(sum("fc").as("tot"))
    val grid = spark.range(buckets).select(col("id").as("bucket"))
      .crossJoin(spark.range(nClasses).select(col("id").as("cls")))
    val model = grid.join(fc, Seq("bucket", "cls"), "left")
      .join(tot, Seq("cls"), "left")
      .select(col("bucket"), col("cls"),
        (coalesce(col("fc"), lit(0L)) + 1L).as("fc1"),
        (coalesce(col("tot"), lit(0L)) + buckets.toLong).as("totb"))
      .select(col("bucket"), col("cls"),
        (expr(CorpusText.mlog2Sql("fc1")) -
          expr(CorpusText.mlog2Sql("totb"))).as("w"))
    val priors = spark.range(nClasses).select(col("id").as("cls"))
      .join(labels.groupBy(col("__lab").as("cls"))
        .agg(count(lit(1)).as("nc")), Seq("cls"), "left")
      .crossJoin(broadcast(labels.agg(count(lit(1)).as("nn"))))
      .select(col("cls"), (coalesce(col("nc"), lit(0L)) + 1L).as("nc1"),
        (col("nn") + nClasses.toLong).as("nnc"))
      .select(col("cls"),
        (expr(CorpusText.mlog2Sql("nc1")) -
          expr(CorpusText.mlog2Sql("nnc"))).as("prior"))
    (model, priors)
  }

  /** CART-style fixed-depth DECISION-TREE training with EXACT integer
    * Gini — the third trainable classifier family (mistake-driven
    * perceptron, counting Naive Bayes, and now the axis-split tree: the
    * interpretable quality-gate shape — "keep docs with ≥ W words AND
    * ≤ R link ratio" rules are exactly depth-2 trees over quality
    * signals). Features must be INTEGER-VALUED and low-cardinality
    * (quantize/bucketize first — the q83 discipline); every node at
    * every level splits on the (feature, threshold) maximizing the
    * milli-unit Gini gain score
    *
    *   score(f, t) = 1000·Σ_c cntL_c² div n_L + 1000·Σ_c cntR_c² div n_R
    *
    * (monotone in the negative weighted impurity; pure integer floor
    * divisions of non-negative counts, so every engine picks the
    * identical split; ties → smallest feature index, then smallest
    * threshold). Splits are `value ≤ t` left / `> t` right; a node with
    * no valid candidate (single distinct value on every feature) stays
    * a leaf. Nodes are heap-indexed (root 1, children 2n/2n+1).
    *
    * Returns the node table: internal rows (node, fi, thr, pred=null),
    * leaf rows (node, null, null, pred = majority label, ties to the
    * smaller class). Serve with [[applyTree]].
    *
    * Scale shape: each level touches the corpus ONCE (a row-local m-way
    * posexplode, then one (node, feature, value, label) count whose
    * output is bounded by nodes·m·bins·classes — metadata, not corpus);
    * the cumulative/score/argmax chain runs entirely on that bounded
    * table (the ≤-join fans out bins× on it, never on data). Per-level
    * assignment is one broadcast join against ≤ 2^level split rows.
    * Corpus cost = depth scans, independent of bins·classes.
    */
  def trainDecisionTree(docs: DataFrame, idCol: String, labelCol: String,
                        featureCols: Seq[String], depth: Int,
                        nClasses: Int): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
    require(featureCols.nonEmpty && featureCols.size <= 16,
      s"need 1..16 feature columns, got ${featureCols.size}")
    require(nClasses >= 2, s"need >= 2 classes, got $nClasses")
    val base = docs.select(col(idCol).as("__id"),
      col(labelCol).cast("long").as("__lab"),
      array(featureCols.map(c => col(c).cast("long")): _*).as("__fv"))
    val bad = base.filter(col("__lab").isNull || col("__lab") < 0 ||
      col("__lab") >= nClasses || exists(col("__fv"), v => v.isNull)).count()
    require(bad == 0L,
      s"$bad rows have a null/out-of-range label or a null feature")
    var assign = Staging.stage(base.withColumn("__node", lit(1L)), "tree_a0")
    val levelSplits = scala.collection.mutable.ArrayBuffer.empty[Staging.Staged]
    (1 to depth).foreach { level =>
      val longF = assign.df.select(col("__node"), col("__lab"),
        posexplode(col("__fv")).as(Seq("fi", "v")))
      val cnt = longF.groupBy("__node", "fi", "v", "__lab")
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("__node", "fi", "__lab").agg(sum("c").as("tc"))
      val cand = cnt.select("__node", "fi", "v").distinct()
      val cnt2 = cnt.select(col("__node").as("n2"), col("fi").as("fi2"),
        col("__lab").as("lab2"), col("v").as("sv"), col("c").as("sc"))
      // per (node, feature, candidate, class): left-cumulative count —
      // built against the FULL class list (tot) so absent classes carry
      // cc=0 into the right-side impurity
      val cum = cand.join(tot, Seq("__node", "fi"))
        .join(cnt2, col("__node") === col("n2") && col("fi") === col("fi2") &&
          col("__lab") === col("lab2") && col("sv") <= col("v"), "left")
        .groupBy(col("__node"), col("fi"), col("v"), col("__lab"), col("tc"))
        .agg(coalesce(sum(col("sc")), lit(0L)).as("cc"))
      val scores = cum.groupBy("__node", "fi", "v")
        .agg(sum("cc").as("nl"), sum(col("cc") * col("cc")).as("al"),
          sum(col("tc") - col("cc")).as("nr"),
          sum((col("tc") - col("cc")) * (col("tc") - col("cc"))).as("ar"))
        .filter(col("nr") > 0)
        .select(col("__node"), col("fi"), col("v"),
          (expr("al * 1000 DIV nl") + expr("ar * 1000 DIV nr")).as("score"))
      val best = Staging.stage(
        scores.groupBy("__node")
          .agg(max_by(struct(col("fi"), col("v")),
            struct(col("score"), -col("fi"), -col("v"))).as("b"))
          .select(col("__node"), col("b.fi").cast("long").as("bfi"),
            col("b.v").as("bthr")),
        s"tree_best$level")
      levelSplits += best
      val next = Staging.stage(
        assign.df.join(broadcast(best.df), Seq("__node"), "left")
          .withColumn("__node",
            when(col("bfi").isNull, col("__node"))
              .otherwise(col("__node") * 2 +
                when(element_at(col("__fv"), (col("bfi") + 1).cast("int"))
                  > col("bthr"), 1L).otherwise(0L)))
          .drop("bfi", "bthr"),
        s"tree_a$level")
      assign.delete()
      assign = next
    }
    val leaves = assign.df.groupBy("__node", "__lab")
      .agg(count(lit(1)).as("c"))
      .groupBy("__node")
      .agg(max_by(col("__lab"), struct(col("c"), -col("__lab"))).as("pred"))
      .select(col("__node").as("node"), lit(null).cast("long").as("fi"),
        lit(null).cast("long").as("thr"), col("pred"))
    val internals = levelSplits.map(_.df
      .select(col("__node").as("node"), col("bfi").as("fi"),
        col("bthr").as("thr"), lit(null).cast("long").as("pred")))
      .reduce(_.unionByName(_))
    val nodes = Staging.stage(internals.unionByName(leaves), "tree_nodes")
    levelSplits.foreach(_.delete())
    assign.delete()
    nodes.df
  }

  /** Route rows through a [[trainDecisionTree]] node table: `depth`
    * broadcast joins against the (tiny) split rows, then the leaf's
    * majority label. Returns (id, leaf, pred_cls). Rows are never
    * shuffled — serving is depth row-local map joins.
    */
  def applyTree(docs: DataFrame, idCol: String, featureCols: Seq[String],
                nodes: DataFrame, depth: Int): DataFrame = {
    val splits = nodes.filter(col("fi").isNotNull)
      .select(col("node").as("__node"), col("fi"), col("thr"))
    var cur = docs.select(col(idCol),
      array(featureCols.map(c => col(c).cast("long")): _*).as("__fv"))
      .withColumn("__node", lit(1L))
    (1 to depth).foreach { _ =>
      cur = cur.join(broadcast(splits), Seq("__node"), "left")
        .withColumn("__node",
          when(col("fi").isNull, col("__node"))
            .otherwise(col("__node") * 2 +
              when(element_at(col("__fv"), (col("fi") + 1).cast("int"))
                > col("thr"), 1L).otherwise(0L)))
        .drop("fi", "thr")
    }
    cur.join(broadcast(nodes.filter(col("pred").isNotNull)
        .select(col("node").as("__node"), col("pred"))),
      Seq("__node"), "left")
      .select(col(idCol), col("__node").as("leaf"), col("pred").as("pred_cls"))
  }

  /** NAIVE BAYES inference over a [[trainNaiveBayes]] fit: per-class
    * score = prior + Σ_features cnt·w in exact milli-bit integers, then
    * a bounded per-doc argmax (ties to the smallest class). Same plan
    * shape as [[predict]] plus one broadcast prior join — the model and
    * priors are metadata-sized, the corpus is touched once.
    */
  def predictNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                        model: DataFrame, priors: DataFrame,
                        buckets: Int): DataFrame = {
    val scored = featureBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("cnt") * col("w")).as("like"))
      .join(broadcast(priors), Seq("cls"))
      .select(col(idCol), col("cls"), (col("like") + col("prior")).as("score"))
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("score").as("s"),
        (-col("cls")).as("nc"))), asc = false).as("ranked"))
      .select(col(idCol),
        (-col("ranked")(0)("nc")).as("pred_cls"),
        col("ranked")(0)("s").as("best_score"),
        (col("ranked")(0)("s") - col("ranked")(1)("s")).as("margin"))
  }

  /** Classifier inference: (id, pred_cls, best_score, margin) per
    * document with at least one feature. `model` must cover every
    * (bucket, cls) pair (so each doc scores exactly nClasses rows);
    * ties break to the smallest class id. `margin` = best − runner-up
    * score (exact integer confidence; requires nClasses ≥ 2).
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, buckets: Int): DataFrame = {
    val scored = featureBuckets(docs, idCol, textCol, buckets)
      .join(broadcast(model), Seq("bucket"))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("cnt") * col("w")).as("score"))
    // ranked is bounded by nClasses rows per doc — not a corpus-sized
    // collect; struct ordering (score desc, -cls desc) = smallest-class
    // tie-break, deterministic in both engines
    scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("score").as("s"),
        (-col("cls")).as("nc"))), asc = false).as("ranked"))
      .select(col(idCol),
        (-col("ranked")(0)("nc")).as("pred_cls"),
        col("ranked")(0)("s").as("best_score"),
        (col("ranked")(0)("s") - col("ranked")(1)("s")).as("margin"))
  }
}
