package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilaritySearch

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAggregator keeps the k best with deterministic tiebreaks") {
    val data = Seq((1L, 0.9, 10L), (1L, 0.9, 5L), (1L, 0.1, 7L), (1L, 0.95, 2L),
      (2L, 0.5, 1L))
      .toDF("g", "score", "id").as[(Long, Double, Long)]
    val agg = new TopKAggregator(2).toColumn
    val got = data.groupByKey(_._1).mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk")).collect().toMap
    assert(got(1L) == Seq(Scored(0.95, 2L), Scored(0.9, 5L))) // tie 0.9: lower id wins
    assert(got(2L) == Seq(Scored(0.5, 1L)))
  }

  test("aggregator search equals the window-sort search") {
    val e = graft.Tables.embeddings(spark, sf001)
    val q = e.filter($"vec_id" < 5)
    val a = SimilaritySearch.bruteForceTopK(q, e, "vec_id", "embedding", 4)
      .select("qid", "nid", "rank")
    val b = SimilaritySearch.bruteForceTopKAgg(q, e, "vec_id", "embedding", 4)
      .select("qid", "nid", "rank")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
