package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ClassifierSpec extends SparkSpec {

  /** Same 60-bit md5 hash the operator computes, rolled independently. */
  private def h60(s0: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("featureBuckets emits uni+bigram occurrence counts at the md5 buckets") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b a")).toDF("id", "text")
    val fb = Classifier.featureBuckets(docs, "id", "text", 1 << 20)
      .as[(Long, Long, Long)].collect().toSeq
    // features: a, b, a, a_b, b_a → 5 occurrences over 4 distinct
    assert(fb.map(_._3).sum === 5L)
    val expected = Map("a" -> 2L, "b" -> 1L, "a_b" -> 1L, "b_a" -> 1L)
      .map { case (f, c) => (h60(f) % (1 << 20)) -> c }
    assert(expected.size === 4, "test buckets must not collide")
    assert(fb.map(r => r._2 -> r._3).toMap === expected)
  }

  test("single-word and empty docs produce no bigrams / no rows") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "solo"), (2L, "   "), (3L, "")).toDF("id", "text")
    val fb = Classifier.featureBuckets(docs, "id", "text", 1 << 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(fb === Seq((1L, h60("solo") % (1 << 20), 1L)))
  }

  test("predict computes exact integer scores and breaks ties to the smallest class") {
    val s = spark
    import s.implicits._
    val b = 1 << 20
    val docs = Seq((1L, "x y"), (2L, "x x y")).toDF("id", "text")
    val feats = Seq("x", "y", "x_y", "x_x")
    val buckets = feats.map(f => f -> h60(f) % b).toMap
    assert(buckets.values.toSet.size === 4, "test buckets must not collide")
    // cls 0: every feature weighs 10; cls 1: x weighs 25, rest 0
    val model = feats.flatMap(f =>
      Seq((buckets(f), 0L, 10L), (buckets(f), 1L, if (f == "x") 25L else 0L)))
      .toDF("bucket", "cls", "w")
    val out = Classifier.predict(docs, "id", "text", model, b)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1 (x, y, x_y): cls0 = 30, cls1 = 25 → pred 0, margin 5
    // doc 2 (x, x, y, x_x, x_y): cls0 = 50, cls1 = 50 → tie → pred 0, margin 0
    assert(out === Seq((1L, 0L, 30L, 5L), (2L, 0L, 50L, 0L)))
  }

  test("fused featureBuckets is row-for-row identical to the HOF formulation") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(rows(Classifier.featureBuckets(docs, "doc_id", "text", 4096)) ===
      rows(Classifier.featureBucketsHof(docs, "doc_id", "text", 4096)))
    val edge = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("id", "text")
    assert(rows(Classifier.featureBuckets(edge, "id", "text", 64)) ===
      rows(Classifier.featureBucketsHof(edge, "id", "text", 64)))
  }

  test("predictFused is row-for-row identical to the composable predict") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf001)
    val model = Classifier.syntheticModel(spark, 4096, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(rows(Classifier.predictFused(docs, "doc_id", "text", model, 4096)) ===
      rows(Classifier.predict(docs, "doc_id", "text", model, 4096)))
  }

  test("predictFused plan has no exchange before the scores — inference is scan-local") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val model = Classifier.syntheticModel(spark, 64, 2)
    val plan = Classifier.predictFused(docs, "id", "text", model, 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused inference must be one scan:\n$plan")
    assert(!plan.contains("Join"), s"no model join expected:\n$plan")
  }

  test("syntheticModel covers B·C rows with milli-unit weights") {
    val s = spark
    import s.implicits._
    val m = Classifier.syntheticModel(spark, buckets = 64, nClasses = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(m.size === 192)
    assert(m.map(r => (r._1, r._2)).toSet.size === 192)
    assert(m.forall(r => r._3 >= -1000 && r._3 <= 1000))
  }

  test("trainPerceptron separates a toy set, covers the full grid, " +
      "and is partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana", 0L), (2L, "apple fruit apple", 0L),
      (3L, "dog dog cat", 1L), (4L, "dog bark dog", 1L),
      (5L, "apple apple apple", 0L), (6L, "cat dog cat", 1L))
      .toDF("doc_id", "text", "lab")
    val w = Classifier.trainPerceptron(docs, "doc_id", "text", "lab",
      buckets = 256, nClasses = 2, rounds = 4)
    val wRows = w.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(wRows.size === 512, "every (bucket, cls) pair must be present")
    assert(wRows.map(r => (r._1, r._2)).distinct.size === 512)
    // the trained weights drive fused inference to a perfect fit
    val preds = Classifier.predictFused(docs, "doc_id", "text", w, 256)
      .select("doc_id", "pred_cls").as[(Long, Long)].collect().toMap
    assert(preds === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 0L, 6L -> 1L))
    // exact integer updates: identical weights under any partitioning
    val w2 = Classifier.trainPerceptron(docs.repartition(5), "doc_id",
      "text", "lab", buckets = 256, nClasses = 2, rounds = 4)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(wRows === w2)
  }

  test("trainPerceptron validates its parameters") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a", 0L)).toDF("doc_id", "text", "lab")
    intercept[IllegalArgumentException](
      Classifier.trainPerceptron(docs, "doc_id", "text", "lab", 8, 1, 2))
    intercept[IllegalArgumentException](
      Classifier.trainPerceptron(docs, "doc_id", "text", "lab", 8, 2, 0))
  }

  test("trainPerceptron rejects out-of-range and null labels (silent-corruption guard)") {
    val s = spark
    import s.implicits._
    val outOfRange = Seq((1L, "a b", 0L), (2L, "c d", 5L)).toDF("doc_id", "text", "lab")
    val e = intercept[IllegalArgumentException](
      Classifier.trainPerceptron(outOfRange, "doc_id", "text", "lab", 8, 2, 1))
    assert(e.getMessage.contains("out-of-range"))
    val withNull = Seq((1L, "a b", Some(0L)), (2L, "c d", None))
      .toDF("doc_id", "text", "lab")
    intercept[IllegalArgumentException](
      Classifier.trainPerceptron(withNull, "doc_id", "text", "lab", 8, 2, 1))
  }

  test("predict is partitioning-invariant (exact integer scores)") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf001).limit(50)
    val model = Classifier.syntheticModel(spark, 256, 3)
    val a = Classifier.predict(docs, "doc_id", "text", model, 256)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val bOut = Classifier.predict(docs.repartition(7), "doc_id", "text", model, 256)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === bOut)
  }

  test("trainNaiveBayes separates a disjoint-vocabulary toy set; grid complete; priors favor the bigger class") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa aa bb", 0L), (2L, "aa bb bb", 0L), (3L, "bb aa", 0L),
      (4L, "cc dd cc", 1L), (5L, "dd cc", 1L)).toDF("doc_id", "text", "lab")
    val (model, priors) = Classifier.trainNaiveBayes(docs, "doc_id", "text",
      "lab", buckets = 128, nClasses = 2)
    assert(model.count() === 256L, "model must cover the full B*C grid")
    assert(priors.count() === 2L)
    val preds = Classifier.predictNaiveBayes(docs, "doc_id", "text", model,
      priors, 128).select("doc_id", "pred_cls")
      .as[(Long, Long)].collect().toMap
    assert(preds === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
    // class 0 has 3 docs, class 1 has 2 → its prior is strictly larger
    val p = priors.as[(Long, Long)].collect().toMap
    assert(p(0L) > p(1L), s"bigger class must carry the bigger prior: $p")
  }

  test("trainNaiveBayes is partitioning-invariant and rejects bad labels") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf001).limit(80)
      .withColumn("lab", when(col("lang") === "en", 0L).otherwise(1L))
    def run(d: org.apache.spark.sql.DataFrame) = {
      val (m, p) = Classifier.trainNaiveBayes(d, "doc_id", "text", "lab", 64, 2)
      Classifier.predictNaiveBayes(d, "doc_id", "text", m, p, 64)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    }
    assert(run(docs) === run(docs.repartition(13)))
    val bad = Seq((1L, "a b", 0L), (2L, "c d", 7L)).toDF("doc_id", "text", "lab")
    val e = intercept[IllegalArgumentException](
      Classifier.trainNaiveBayes(bad, "doc_id", "text", "lab", 8, 2))
    assert(e.getMessage.contains("out-of-range"))
  }

  test("trainDecisionTree: a separable stump finds the exact threshold") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 1L), (4L, 4L, 1L))
      .toDF("id", "f0", "lab")
    val nodes = Classifier.trainDecisionTree(rows, "id", "lab", Seq("f0"),
      depth = 1, nClasses = 2)
    val split = nodes.filter(col("fi").isNotNull)
      .select("node", "fi", "thr").as[(Long, Long, Long)].collect().toSeq
    assert(split === Seq((1L, 0L, 2L)), s"must split at f0 <= 2: $split")
    val preds = Classifier.applyTree(rows, "id", Seq("f0"), nodes, depth = 1)
      .select("id", "leaf", "pred_cls").as[(Long, Long, Long)].collect().toSet
    assert(preds === Set((1L, 2L, 0L), (2L, 2L, 0L), (3L, 3L, 1L), (4L, 3L, 1L)))
  }

  test("trainDecisionTree: depth 2 solves XOR that no single split can") {
    val s = spark
    import s.implicits._
    // 3 copies of each XOR corner so counts are unambiguous
    val rows = (for {
      r <- 0 until 3; a <- 0 to 1; b <- 0 to 1
    } yield ((r * 4 + a * 2 + b).toLong, a.toLong, b.toLong, (a ^ b).toLong))
      .toDF("id", "f0", "f1", "lab")
    val nodes = Classifier.trainDecisionTree(rows, "id", "lab",
      Seq("f0", "f1"), depth = 2, nClasses = 2)
    val preds = Classifier.applyTree(rows, "id", Seq("f0", "f1"), nodes, 2)
      .join(rows, Seq("id"))
      .filter(col("pred_cls") =!= col("lab")).count()
    assert(preds === 0L, "depth-2 tree must fit XOR exactly")
    assert(nodes.filter(col("fi").isNotNull).count() === 3L, "3 internal nodes")
  }

  test("trainDecisionTree: constant features yield a root leaf; bad labels rejected; partitioning-invariant") {
    val s = spark
    import s.implicits._
    val const = Seq((1L, 5L, 0L), (2L, 5L, 1L), (3L, 5L, 1L))
      .toDF("id", "f0", "lab")
    val nodes = Classifier.trainDecisionTree(const, "id", "lab", Seq("f0"), 2, 2)
    assert(nodes.filter(col("fi").isNotNull).count() === 0L)
    val out = Classifier.applyTree(const, "id", Seq("f0"), nodes, 2)
      .select("leaf", "pred_cls").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L)), "all rows stay at the root, majority = 1")
    intercept[IllegalArgumentException](Classifier.trainDecisionTree(
      Seq((1L, 1L, 9L)).toDF("id", "f0", "lab"), "id", "lab", Seq("f0"), 1, 2))
    // partitioning invariance on real data
    val docs = Tables.documents(spark, sf001).limit(120)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("lab"),
        expr("CAST(least(length(text) DIV 256, 31) AS BIGINT)").as("f0"),
        expr("CAST(least(n_chars DIV 512, 31) AS BIGINT)").as("f1"))
    def fit(d: org.apache.spark.sql.DataFrame) =
      Classifier.trainDecisionTree(d, "doc_id", "lab", Seq("f0", "f1"), 2, 2)
        .as[(Long, Option[Long], Option[Long], Option[Long])]
        .collect().sortBy(_._1).toSeq
    assert(fit(docs) === fit(docs.repartition(11)))
  }
}
