package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("connectedComponents labels a path graph by its minimum node") {
    val s = spark
    import s.implicits._
    // path 7-5-9-11 plus component {2,3}: diameter 3 forces several
    // propagation rounds, not a single-hop min
    val edges = Seq((7L, 5L), (5L, 9L), (9L, 11L), (2L, 3L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 7L -> 5L, 9L -> 5L, 11L -> 5L, 2L -> 2L, 3L -> 2L))
  }

  test("connectedComponents on empty edges returns no rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponents(empty, "a", "b").count() === 0L)
  }

  test("connectedComponents is invariant to edge direction and duplicates") {
    val s = spark
    import s.implicits._
    val e1 = Seq((1L, 4L), (4L, 1L), (1L, 4L), (4L, 6L)).toDF("a", "b")
    val got = Graph.connectedComponents(e1, "a", "b").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 4L -> 1L, 6L -> 1L))
  }
}
