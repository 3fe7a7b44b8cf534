package graft.operators

import graft.SparkSpec

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("skipGramPairs counts unordered pairs within the window, row-locally") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val got = Cooccur.skipGramPairs(docs, "doc_id", "text", window = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // positions a1 b2 c3 a4 b5; distances <= 2:
    // (a1,b2) (a1,c3) (b2,c3) (b2,a4) (c3,a4) (c3,b5) (a4,b5)
    assert(got === Map(("a", "b") -> 3L, ("a", "c") -> 2L, ("b", "c") -> 2L))
  }

  test("skipGramPairs: window cuts distant pairs; docs never pair across") {
    val docs = Seq((1L, "a b c"), (2L, "c d")).toDF("doc_id", "text")
    val got = Cooccur.skipGramPairs(docs, "doc_id", "text", window = 1)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L))
  }

  test("pmiCollocations: hand-computed milli-bit PMI, symmetric per-word ranking") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    val out = Cooccur.pmiCollocations(docs, "doc_id", "text",
      window = 2, minCount = 1L, k = 2)
      .as[(String, String, Long, Long, Int)].collect()
      .map(r => (r._1, r._5) -> ((r._2, r._4))).toMap
    // N=5, P=7; mlog2: 1→0, 2→1000, 3→1500, 5→2250, 7→2750
    // pmi(a,b) = 1500 + 4500 − 2750 − 1000 − 1000 = 1250
    // pmi(a,c) = 1000 + 4500 − 2750 − 1000 − 0    = 1750
    // pmi(b,c) = 1000 + 4500 − 2750 − 1000 − 0    = 1750
    assert(out(("a", 1)) === (("c", 1750L)))
    assert(out(("a", 2)) === (("b", 1250L)))
    assert(out(("b", 1)) === (("c", 1750L)))
    assert(out(("b", 2)) === (("a", 1250L)))
    // c ranks BOTH partners (symmetrized), tie 1750 broken by partner name
    assert(out(("c", 1)) === (("a", 1750L)))
    assert(out(("c", 2)) === (("b", 1750L)))
  }

  test("pmiCollocations is partitioning-invariant; minCount prunes before totals") {
    val docs = Seq((1L, "x y x y x y"), (2L, "x z")).toDF("doc_id", "text")
    def run(parts: Int) = Cooccur.pmiCollocations(
      docs.repartition(parts), "doc_id", "text", window = 1, minCount = 2L, k = 3)
      .as[(String, String, Long, Long, Int)].collect().sortBy(r => (r._1, r._5)).toSeq
    val a = run(1)
    assert(a === run(5))
    // (x,z) occurs once -> pruned by minCount=2: z never appears
    assert(!a.exists(r => r._1 == "z" || r._2 == "z"))
  }
}
