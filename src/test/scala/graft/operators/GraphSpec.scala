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

  test("pageRank matches the hand-computed fixed-point iteration on a path graph") {
    val s = spark
    import s.implicits._
    // path 1-2-3: deg 1:1, 2:2, 3:1; SCALE=1e9, damping 85/100
    // iter1: pr(1)=pr(3)=0.15e9+85%·(1e9 div 2)=575000000; pr(2)=0.15e9+85%·2e9=1850000000
    // iter2: pr(1)=pr(3)=0.15e9+85%·(1850000000 div 2)=936250000
    //        pr(2)=0.15e9+85%·(575000000+575000000)=1127500000
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.pageRank(edges, "a", "b", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 936250000L, 2L -> 1127500000L, 3L -> 936250000L))
  }

  test("pageRank is deterministic under repartitioning (exact integer arithmetic)") {
    val s = spark
    import s.implicits._
    val edges = (1L to 30L).map(i => (i, i % 10 + 100L)).toDF("a", "b")
    val a = Graph.pageRank(edges, "a", "b", 3).as[(Long, Long)].collect().sorted
    val b = Graph.pageRank(edges.repartition(7), "a", "b", 3)
      .as[(Long, Long)].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("pageRank rejects out-of-range iteration counts") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException](Graph.pageRank(edges, "a", "b", 0))
    intercept[IllegalArgumentException](Graph.pageRank(edges, "a", "b", 51))
  }

  test("triangleCount: K4 has 4 triangles; dangling edges add none") {
    val s = spark
    import s.implicits._
    val k4 = for (i <- 1L to 4L; j <- i + 1 to 4L) yield (i, j)
    val edges = (k4 ++ Seq((4L, 9L), (9L, 10L))).toDF("a", "b")
    val n = Graph.triangleCount(edges, "a", "b").as[Long].collect().head
    assert(n === 4L)
  }

  test("triangleCount is invariant to edge direction, duplicates and self-loops") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 2L), (2L, 2L))
      .toDF("a", "b")
    val n = Graph.triangleCount(edges, "a", "b").as[Long].collect().head
    assert(n === 1L)
  }

  test("triangleCount on a triangle-free graph is zero") {
    val s = spark
    import s.implicits._
    // star graph: no triangles
    val edges = (2L to 8L).map(i => (1L, i)).toDF("a", "b")
    assert(Graph.triangleCount(edges, "a", "b").as[Long].collect().head === 0L)
  }

  test("connectedComponentsStar labels a path graph by its minimum node") {
    val s = spark
    import s.implicits._
    val edges = Seq((7L, 5L), (5L, 9L), (9L, 11L), (2L, 3L)).toDF("a", "b")
    val got = Graph.connectedComponentsStar(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(5L -> 5L, 7L -> 5L, 9L -> 5L, 11L -> 5L, 2L -> 2L, 3L -> 2L))
  }

  test("connectedComponentsStar on empty edges returns no rows") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.connectedComponentsStar(empty, "a", "b").count() === 0L)
  }

  test("connectedComponentsStar ≡ label propagation on random graphs (property)") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      // ~sparse: 120 nodes, 90 edges → many components of varied shape,
      // plus direction flips and duplicates
      val edges = Seq.fill(90)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b }
        .toDF("a", "b")
      val lp = Graph.connectedComponents(edges, "a", "b", maxIter = 200)
        .as[(Long, Long)].collect().toMap
      val st = Graph.connectedComponentsStar(edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(st === lp, s"seed $seed")
    }
  }

  test("pageRankDirected: a sink's mass redistributes — exact 2-node hand computation") {
    val s = spark
    import s.implicits._
    // a→b, b is a sink. N=2, pr0 = (1e9, 1e9). Round 1:
    //   dang = 1e9, share = 5e8
    //   pr(a) = 1.5e8 + (85·(0 + 5e8)) div 100   = 575000000
    //   pr(b) = 1.5e8 + (85·(1e9 + 5e8)) div 100 = 1425000000
    // and mass 2e9 is conserved exactly.
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val got = Graph.pageRankDirected(edges, "a", "b", 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 575000000L, 2L -> 1425000000L))
  }

  test("pageRankDirected reduces to undirected pageRank on a symmetric edge set") {
    val s = spark
    import s.implicits._
    // undirected pageRank(E) treats each edge both ways; feeding BOTH
    // directions to the directed operator gives no sinks, dang = 0, and
    // identical integer updates — results must be equal, row for row
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("a", "b")
    val sym = und.union(und.select($"b".as("a"), $"a".as("b")))
    val d = Graph.pageRankDirected(sym, "a", "b", 3).as[(Long, Long)].collect().sorted.toSeq
    val u = Graph.pageRank(und, "a", "b", 3).as[(Long, Long)].collect().sorted.toSeq
    assert(d == u)
  }

  test("pageRankDirected conserves rank mass up to floor remainders, deterministically") {
    val s = spark
    import s.implicits._
    // digraph with two sinks (5, 6) and a hub; after any number of
    // rounds Σpr stays within N·100 of N·SCALE (each node's update
    // drops < 100 in the two floor divisions) — the invariant that
    // breaks if dangling mass is simply lost
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L), (4L, 1L))
      .toDF("a", "b")
    val pr = Graph.pageRankDirected(edges, "a", "b", 5).as[(Long, Long)].collect()
    val n = pr.length
    val mass = pr.map(_._2).sum
    assert(n == 6)
    assert(math.abs(mass - n * 1000000000L) < n * 5 * 100L,
      s"mass $mass drifted from ${n * 1000000000L}")
    val again = Graph.pageRankDirected(edges.repartition(5), "a", "b", 5)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(again == pr.sorted.toSeq)
  }

  test("connectedComponentsStar converges in O(log n) rounds on a chain (label propagation needs n)") {
    val s = spark
    import s.implicits._
    // 0-1-2-...-64: diameter 64. Label propagation needs ~64 rounds;
    // star contraction must close it in ≤ log2(65) + 4 ≈ 10 rounds
    // (the +4 covers the seed round and the fixpoint-confirming round).
    val n = 64L
    val chain = (0L until n).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) = Graph.ccStarWithRounds(chain, "a", "b")
    val got = df.as[(Long, Long)].collect().toMap
    assert(got === (0L to n).map(i => i -> 0L).toMap)
    assert(rounds <= (math.log(n + 1) / math.log(2)).ceil.toInt + 4,
      s"took $rounds rounds")
  }

  test("kCore peels a pendant chain off a triangle (k=2)") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus chain 3-4-5: the 2-core is exactly the
    // triangle, and reaching it takes TWO peeling rounds (5 dies first,
    // then 4 — degree cascades are what the loop exists for)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = Graph.kCore(edges, "a", "b", k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore is idempotent past the fixpoint and k=1 keeps every non-isolated node") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (6L, 7L)).toDF("a", "b")
    val r3 = Graph.kCore(edges, "a", "b", k = 2, rounds = 3)
      .as[(Long, Long)].collect().sorted.toSeq
    val r8 = Graph.kCore(edges.repartition(5), "a", "b", k = 2, rounds = 8)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(r3 == r8)
    val k1 = Graph.kCore(edges, "a", "b", k = 1, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(k1.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(k1(5L) == 1L && k1(6L) == 1L && k1(3L) == 3L)
  }

  test("bfsHops: min distance to any seed, round-bounded reach, off-graph seeds at 0") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5-6 plus seed 9 not in the graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val seeds = Seq(1L, 9L).toDF("id")
    val got = Graph.bfsHops(edges, "a", "b", seeds, "id", rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 3 rounds reach hop 3; node 5 (hop 4) and 6 are absent
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 9L -> 0L))
    // two seeds: distances take the MIN over seeds
    val got2 = Graph.bfsHops(edges, "a", "b", Seq(1L, 6L).toDF("id"), "id", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
    // idempotent past the fixpoint
    val got3 = Graph.bfsHops(edges.repartition(5), "a", "b",
      Seq(1L, 6L).toDF("id"), "id", rounds = 8).as[(Long, Long)].collect().toMap
    assert(got3 === got2)
  }

  test("clusteringCoeff: clique = 1000 milli, chain = 0, shared-edge case exact") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 plus pendant 3-4: coefficients 1000,1000 for 1,2;
    // node 3 has deg 3, 1 triangle -> 2000*1/(3*2) = 333; node 4 deg 1 -> 0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoeff(edges, "a", "b")
      .select("id", "deg", "n_tri", "coeff_mb")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 1000L)))
    assert(got(2L) == ((2L, 2L, 1L, 1000L)))
    assert(got(3L) == ((3L, 3L, 1L, 333L)))
    assert(got(4L) == ((4L, 1L, 0L, 0L)))
    // K4: every node in 3 triangles, deg 3 -> coefficient 1000
    val k4 = (for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)).toDF("a", "b")
    val g4 = Graph.clusteringCoeff(k4, "a", "b")
      .as[(Long, Long, Long, Long)].collect()
    assert(g4.forall(r => r._2 == 3L && r._3 == 3L && r._4 == 1000L))
  }

  test("kCore of a clique is the whole clique with full degree") {
    val s = spark
    import s.implicits._
    val nodes = 0L until 6L
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b)).toDF("a", "b")
    val got = Graph.kCore(edges, "a", "b", k = 5, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === nodes.map(_ -> 5L).toMap)
    // k above the clique degree empties the core
    assert(Graph.kCore(edges, "a", "b", k = 6, rounds = 2).count() == 0)
  }
}
