package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines and shuffles here now"),
    (4L, "THE  Quick Brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1 modulo case/space
    (5L, "tiny doc") // shorter than one shingle
  ).toDF("doc_id", "text")

  test("fingerprintClusters groups case/whitespace-identical docs") {
    val out = Dedup.fingerprintClusters(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(out(1L) == 2)      // docs 1 and 4 share a fingerprint, keeper = min id
    assert(out(2L) == 1)
    assert(out.values.sum == 5)
  }

  test("shingleSet emits distinct n-grams, none for too-short docs") {
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 4)
    assert(sh.filter($"id" === 5L).isEmpty)
    val d1 = sh.filter($"id" === 1L).as[(Long, String)].collect().map(_._2)
    assert(d1.contains("the quick brown fox"))
    assert(d1.length == 11) // 14 words → 11 4-grams, all distinct
  }

  test("jaccardPairs finds the near-dup pair with exact jaccard") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4,
      dfCap = 100, num = 1, den = 10)
      .select("doc_a", "doc_b", "shared", "na", "nb")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    // docs 1/2 share 10 of their 11 4-gram shingles; 1/4 are identical
    assert(pairs((1L, 2L)) == (10L, 11L, 11L))
    assert(pairs((1L, 4L)) == (11L, 11L, 11L))
    assert(pairs((2L, 4L)) == (10L, 11L, 11L))
    assert(!pairs.contains((1L, 3L)))
  }

  test("minhashLshPairs surfaces the same near-dups as exact jaccard") {
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 4, k = 12, rowsPerBand = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 4L))) // identical shingle sets always collide
    assert(got.contains((1L, 2L)) || got.contains((2L, 4L))) // 0.82 jaccard: some band agrees
    assert(!got.contains((1L, 3L)))
  }

  test("simhashPairs: identical token sets at hamming 0, unrelated docs absent") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 1)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got((1L, 4L)) == 0) // same tokens → same signature
    assert(!got.contains((1L, 3L)))
  }

  test("winnowFingerprints: identical text ⇒ identical digest; density ~2/(w+1); short docs dropped") {
    val data = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical
      (3L, "a completely different sentence about spark engines"),
      (4L, "short")                                        // < k chars → no fingerprints
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(data, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Int, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(fps(1L) == fps(2L), "same text must fingerprint identically")
    assert(fps(1L)._2 != fps(3L)._2)
    assert(!fps.contains(4L))
    // winnowing keeps roughly one hash per w positions — far fewer than all
    val positions = data.filter($"doc_id" === 1L).as[(Long, String)].collect().head._2.length - 7
    assert(fps(1L)._1 < positions / 2 && fps(1L)._1 >= positions / (4 * 2))
  }

  test("jaccardPairsPrefix equals the un-blocked exact join at the threshold (lossless)") {
    // exact pairs at t=1/2 over the shared fixture: 1-2 (10/12), 1-4
    // (identical), 2-4 — same as jaccardPairs at a high threshold with
    // no df cap in play
    val got = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 4, num = 1, den = 2)
      .select("doc_a", "doc_b", "shared").as[(Long, Long, Long)].collect().sorted
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 4,
        dfCap = Int.MaxValue, num = 1, den = 2)
      .select("doc_a", "doc_b", "shared").as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq === exact.toSeq)
    assert(got.nonEmpty)
  }

  test("jaccardPairsPrefix at t=1 reduces to exact-duplicate pairs") {
    val got = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 4, num = 1, den = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 4L))) // identical shingle sets only
  }

  test("editDistancePairs: blocked candidates, bounded distance") {
    val df = Seq(
      (1L, "cold widget", "B1"),
      (2L, "bold widget", "B1"), // dist 1 from #1
      (3L, "cold widget", "B2"), // identical text, different block → excluded
      (4L, "cold gadget", "B1"), // dist 2 from #1, dist 3 from #2
      (5L, "entirely other name x", "B1") // length prune removes before scoring
    ).toDF("id", "name", "b")
    val out = Dedup.editDistancePairs(df, "id", "name", org.apache.spark.sql.functions.col("b"), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 2L, 1L), (1L, 4L, 2L)))
  }

  test("editDistancePairs rejects negative maxDist") {
    val df = Seq((1L, "a", "b")).toDF("id", "name", "b")
    intercept[IllegalArgumentException](
      Dedup.editDistancePairs(df, "id", "name", org.apache.spark.sql.functions.col("b"), -1))
  }

  test("dedupIncrement: known fingerprints suppressed, batch winner is min id, novel admitted") {
    val s = spark
    import s.implicits._
    // state knows the canonical form of "hello world"
    val known = Seq(("hello world!!")).toDF("t")
      .select(graft.functions.TextFns.fingerprint($"t").as("fp")).distinct()
    val batch = Seq(
      (5L, "Hello, WORLD"),   // dup of state (canonicalizes equal) → dropped
      (7L, "fresh doc"),      // novel, later twin below
      (6L, "fresh doc"),      // same fp, smaller id → the batch winner
      (9L, "another novel")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupIncrement(batch, "doc_id", "text", known, "fp")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(6L, 9L))
  }

  test("containmentPairs catches quote-inclusion that Jaccard misses, ONE direction only") {
    // doc 1 is quoted wholesale inside doc 2, which is ~4x longer:
    // containment(1→2) = 1.0 but Jaccard ≈ 1/4 — below a 6/10 bar
    val quote = "alpha beta gamma delta epsilon zeta eta theta"
    val long = quote + " " + (1 to 30).map(i => s"filler$i word$i more$i extra$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, long), (3L, "unrelated text entirely different content here")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
        n = 4, dfCap = 100, num = 6, den = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L)), s"expected exactly the directed inclusion, got $cont")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 4, dfCap = 100, num = 6, den = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty, s"Jaccard at the same 6/10 bar must miss the inclusion, got $jac")
  }

  test("dedupIncrement: a reprocessed chunk (repeated / variant rows per id) emits each id ONCE") {
    val s = spark
    import s.implicits._
    val known = Seq(("seen before")).toDF("t")
      .select(graft.functions.TextFns.fingerprint($"t").as("fp")).distinct()
    val batch = Seq(
      (1L, "alpha doc"),   // exact repeat of the row below
      (1L, "alpha doc"),
      (2L, "beta v1"),     // same id, variant texts → one deterministic row
      (2L, "beta v2"),
      (3L, "gamma doc")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupIncrement(batch, "doc_id", "text", known, "fp")
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"each admitted id exactly once, got $ids")
    // the kept variant for id 2 is the min-fp one — deterministic, so
    // appending out.fp to the state appends no duplicate fingerprints
    val fps = out.select("fp").as[String].collect().toSeq
    assert(fps.distinct.size == fps.size)
    val minFp = batch.filter($"doc_id" === 2L)
      .select(graft.functions.TextFns.fingerprint($"text").as("fp"))
      .as[String].collect().min
    assert(out.filter($"doc_id" === 2L).select("fp").as[String].collect().head == minFp)
  }

  test("dedupIncrementLsh: batch-by-batch admission equals the one-shot ranking") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    def empty = Dedup.lshBandState(docs.filter($"doc_id" < 0), "doc_id", "text", 4, 12, 3)
    def admit(b: org.apache.spark.sql.DataFrame, st: org.apache.spark.sql.DataFrame) =
      Dedup.dedupIncrementLsh(b, "doc_id", "text", 4, 12, 3, st)
    // one-shot = a single batch against the empty state
    val oneShot = admit(docs, empty).select("doc_id").as[Long].collect().sorted.toSeq
    assert(oneShot.size < docs.count(), "the corpus must contain near-dups to reject")
    // two id-ordered batches, state accumulating EVERY seen doc's bands
    val (b1, b2) = (docs.filter($"doc_id" < 250), docs.filter($"doc_id" >= 250))
    val twoBatch = (admit(b1, empty).select("doc_id").as[Long].collect() ++
      admit(b2, Dedup.lshBandState(b1, "doc_id", "text", 4, 12, 3))
        .select("doc_id").as[Long].collect()).sorted.toSeq
    assert(twoBatch === oneShot, "append must equal rebuild")
    // a different batch boundary lands on the same admissions
    val (c1, c2) = (docs.filter($"doc_id" < 100), docs.filter($"doc_id" >= 100))
    val other = (admit(c1, empty).select("doc_id").as[Long].collect() ++
      admit(c2, Dedup.lshBandState(c1, "doc_id", "text", 4, 12, 3))
        .select("doc_id").as[Long].collect()).sorted.toSeq
    assert(other === oneShot, "admission must not depend on the batch boundary")
  }

  test("dedupIncrementSimhash: batch-by-batch admission equals the one-shot ranking") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    def empty = Dedup.simhashSignatures(docs.filter($"doc_id" < 0), "doc_id", "text")
    def admit(b: org.apache.spark.sql.DataFrame, st: org.apache.spark.sql.DataFrame) =
      Dedup.dedupIncrementSimhash(b, "doc_id", "text", 1, st)
    val oneShot = admit(docs, empty).select("doc_id").as[Long].collect().sorted.toSeq
    assert(oneShot.size < docs.count(), "the corpus must contain near-dups to reject")
    for (cut <- Seq(250L, 100L)) {
      val (b1, b2) = (docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut))
      val twoBatch = (admit(b1, empty).select("doc_id").as[Long].collect() ++
        admit(b2, Dedup.simhashSignatures(b1, "doc_id", "text"))
          .select("doc_id").as[Long].collect()).sorted.toSeq
      assert(twoBatch === oneShot, s"cut=$cut: append must equal rebuild")
    }
  }

  test("dedupIncrementLsh rejects an exact near-dup of a stored doc and admits fresh text") {
    val s = spark
    import s.implicits._
    val stored = Seq((1L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val state = Dedup.lshBandState(stored, "doc_id", "text", 4, 12, 3)
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"), // dup of stored
      (11L, "completely different content about training data pipelines at scale"),
      (12L, "completely different content about training data pipelines at scale"), // dup of 11
      (13L, "zz")) // < n tokens: no shingles, always admitted
      .toDF("doc_id", "text")
    val got = Dedup.dedupIncrementLsh(batch, "doc_id", "text", 4, 12, 3, state)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(11L, 13L))
  }
}
