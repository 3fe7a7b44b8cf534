package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.SafeCastFns

/** Property-based laws (SURVEY §5.2): safe_cast totality, upsert
  * idempotence, merge identity, import-once stability. Uses raw
  * ScalaCheck generators with fixed seeds (deterministic CI) sampled a
  * few times each — every property evaluation spins Spark jobs, so the
  * iteration count is kept small.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowGen: Gen[List[(String, String, Int, String)]] =
    Gen.listOfN(8, for {
      pk <- Gen.oneOf("p1", "p2", "p3")
      rk <- Gen.oneOf("r1", "r2", "r3", "r4")
      n <- Gen.chooseNum(-5, 5)
      s <- Gen.oneOf("", "a", "b")
    } yield (pk, rk, n, s))

  test("safe_cast is total over arbitrary printable strings") {
    samples(Gen.listOfN(12, Gen.asciiPrintableStr), 5).foreach { strs =>
      val out = strs.toDF("v")
        .select(SafeCastFns.safeInt($"v", 7).as("i"), SafeCastFns.safeBool($"v").as("b"))
        .as[(Int, Boolean)].collect()
      assert(out.length == strs.length) // no row lost, nothing thrown
    }
  }

  test("upsertReplace idempotence: apply(u) == apply(u) ∘ apply(u)") {
    val pairs = samples(rowGen, 5).zip(samples(rowGen, 5).reverse)
    pairs.foreach { case (base, upd) =>
      val t = base.toDF("pk", "rk", "n", "s")
      val u = upd.distinctBy(r => (r._1, r._2)).toDF("pk", "rk", "n", "s")
      val once = KeyedTable.upsertReplace(
        t.withColumn("_v", lit(1)), u.withColumn("_v", lit(2)),
        Seq("pk", "rk"), "_v", Seq("n", "s"))
      val twice = KeyedTable.upsertReplace(
        once, u.withColumn("_v", lit(2)), Seq("pk", "rk"), "_v", Seq("n", "s"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    }
  }

  test("upsertMerge with all-default updates is identity on matched keys") {
    samples(rowGen, 5).foreach { base =>
      val t = base.distinctBy(r => (r._1, r._2)).toDF("pk", "rk", "n", "s")
      val u = t.select($"pk", $"rk", lit(0).as("n"), lit("").as("s"))
      val merged = KeyedTable.upsertMerge(t, u, Seq("pk", "rk"),
        Map("n" -> 0, "s" -> ""))
      assert(merged.exceptAll(t).isEmpty && t.exceptAll(merged).isEmpty)
    }
  }

  test("insertIfAbsent preserves existing rows and never duplicates keys") {
    val pairs = samples(rowGen, 5).zip(samples(rowGen, 5).reverse)
    pairs.foreach { case (base, ins) =>
      val t = base.distinctBy(r => (r._1, r._2)).toDF("pk", "rk", "n", "s")
      val u = ins.distinctBy(r => (r._1, r._2)).toDF("pk", "rk", "n", "s")
      val out = KeyedTable.insertIfAbsent(t, u, Seq("pk", "rk"))
      assert(t.exceptAll(out).isEmpty)
      assert(out.groupBy("pk", "rk").count().filter($"count" > 1).isEmpty)
    }
  }

  test("importOnce is monotone and idempotent at partition grain") {
    val pairs = samples(rowGen, 5).zip(samples(rowGen, 5).reverse)
    pairs.foreach { case (base, inc) =>
      val t = base.toDF("pk", "rk", "n", "s")
      val i = inc.toDF("pk", "rk", "n", "s")
      val once = KeyedTable.importOnce(t, i, "pk")
      val twice = KeyedTable.importOnce(once, i, "pk")
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(t.exceptAll(once).isEmpty)
    }
  }

  test("bloom semiJoin ≡ plain semi-join on arbitrary key sets") {
    val keyGen = Gen.listOfN(60, Gen.chooseNum(0L, 40L))
    samples(keyGen, 4).foreach { ks =>
      val probe = ks.toDF("id")
      val build = ks.take(12).map(_ * 3).toDF("k") // partial overlap
      val got = Bloom.semiJoin(probe, "id", build, "k", k = 3, m = 512)
        .as[Long].collect().sorted
      val exp = probe.join(build.select($"k".as("id")), Seq("id"), "left_semi")
        .as[Long].collect().sorted
      assert(got.toSeq === exp.toSeq)
    }
  }

  test("incremental merge equals full recompute under arbitrary batch splits") {
    val batchGen = Gen.listOfN(40, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-100, 100)
    } yield (g, v / 4.0))
    samples(Gen.listOfN(3, batchGen), 4).foreach { batches =>
      val dfs = batches.map(_.toDF("g", "v"))
      val full = Incremental.finish(
        Incremental.state(dfs.reduce(_ unionByName _), Seq("g"), Seq("v")),
        Seq("g"), Seq("v"))
      val merged = Incremental.finish(
        Incremental.merge(dfs.map(Incremental.state(_, Seq("g"), Seq("v"))),
          Seq("g"), Seq("v")), Seq("g"), Seq("v"))
      assert(full.exceptAll(merged).isEmpty && merged.exceptAll(full).isEmpty)
    }
  }

  test("hll states are insensitive to duplication and split-merge") {
    val keyGen = Gen.listOfN(50, Gen.chooseNum(0L, 5000L))
    samples(keyGen, 4).foreach { ks =>
      val (l, r) = ks.splitAt(ks.length / 2)
      val whole = Sketches.hllState(ks.toDF("id"), "id", 8)
      val merged = Sketches.hllMerge(Seq(
        Sketches.hllState((l ++ l).toDF("id"), "id", 8), // duplicated half
        Sketches.hllState(r.toDF("id"), "id", 8)))
      assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    }
  }

  test("zValue is a bijection on the bucket grid") {
    val gen = Gen.listOfN(30, for {
      x <- Gen.chooseNum(0L, 255L); y <- Gen.chooseNum(0L, 255L)
    } yield (x, y))
    samples(gen, 3).foreach { pts =>
      val distinctPts = pts.distinct
      val zs = distinctPts.toDF("x", "y")
        .select(Layout.zValue($"x", $"y", 8)).as[Long].collect()
      assert(zs.length === distinctPts.length)
      assert(zs.distinct.length === distinctPts.length) // injective
      assert(zs.forall(z => z >= 0 && z < (1L << 16)))  // into the 16-bit grid
    }
  }

  test("epochedMixture laws: served ≤ min(budget, Σcaps); epochs ≤ maxEpochs; " +
      "full-epoch rows are exact multiples of n_s") {
    val gen = Gen.listOfN(40, for {
      id <- Gen.chooseNum(0L, 999L)
      src <- Gen.oneOf("a", "b", "c")
    } yield (id, src))
    samples(gen, 3).foreach { rows =>
      val df = rows.distinct.toDF("id", "src")
      val maxE = 3
      val out = Sampling.epochedMixture(df, "id", "src",
        budget = 60L, maxEpochs = maxE).localCheckpoint(true)
      val plan = out.select("src", "n_s", "served_s").distinct()
        .as[(String, Long, Long)].collect()
      val caps = plan.map(p => p._2 * maxE).sum
      assert(plan.map(_._3).sum <= math.min(60L, caps))
      assert(plan.forall(p => p._3 <= p._2 * maxE))
      assert(out.agg(max("epoch")).as[Long].collect().head <= maxE)
      // every doc of a source appears in each of its full epochs exactly once
      val perEpoch = out.groupBy("src", "epoch").count()
        .as[(String, Long, Long)].collect()
      val nS = plan.map(p => p._1 -> p._2).toMap
      val fullE = plan.map(p => p._1 -> p._3 / p._2).toMap
      perEpoch.filter { case (s, e, _) => e <= fullE(s) }
        .foreach { case (s, _, c) => assert(c == nS(s)) }
    }
  }

  test("versioned GraftTable law: readAt(v) is immutable under later mutations") {
    val pairs = samples(rowGen, 3)
    pairs.foreach { rows =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prop_v").toString + "/t"
      val t = new GraftTable(spark, dir, Seq("pk", "rk"), "day")
        .createIfNotExists(
          Seq.empty[(String, String, String, Int)].toDF("day", "pk", "rk", "n").schema)
      val df = rows.map { case (pk, rk, n, s) => (s"d$n", pk, rk, n) }
        .toDF("day", "pk", "rk", "n")
      t.upsertReplace(df)
      val v = t.currentVersion
      val before = t.readAt(v).collect().map(_.toString).sorted.toSeq
      // arbitrary later churn: delete half the keys, compact, add rows
      t.deleteByKeys(df.filter($"n" % 2 === 0).select("pk", "rk").distinct())
      t.compact()
      t.insertIfAbsent(Seq(("dx", "px", "rx", 99)).toDF("day", "pk", "rk", "n"))
      val after = t.readAt(v).collect().map(_.toString).sorted.toSeq
      assert(after === before, "history must be immutable")
    }
  }

  test("merge equals a driver-side reference implementation on arbitrary tables and sources") {
    import GraftTable.{src, MatchedDelete, MatchedUpdate}
    // fixed clause set over random data: delete v%5=0, else update n:=v
    // where v%3=0, else keep; insert unmatched where v%2=0
    val tableGen: Gen[List[(String, String, String, Int)]] =
      Gen.listOfN(10, for {
        day <- Gen.oneOf("d1", "d2")
        pk <- Gen.oneOf("p1", "p2")
        rk <- Gen.oneOf("r1", "r2", "r3", "r4", "r5")
        n <- Gen.chooseNum(0, 50)
      } yield (day, pk, rk, n))
    val srcGen: Gen[List[(String, String, Int)]] =
      Gen.listOfN(8, for {
        pk <- Gen.oneOf("p1", "p2", "p9")
        rk <- Gen.oneOf("r1", "r2", "r3", "r6", "r7")
        v <- Gen.chooseNum(0, 50)
      } yield (pk, rk, v))
    samples(tableGen, 4).zip(samples(srcGen, 4)).foreach { case (rows0, src0) =>
      val rows = rows0.distinctBy(r => (r._2, r._3)) // table keyed (pk, rk)
      val srcRows = src0.distinctBy(r => (r._1, r._2)) // merge needs key-unique
      val dir = java.nio.file.Files.createTempDirectory("graft_pmerge").toString + "/t"
      val t = new GraftTable(spark, dir, keys = Seq("pk", "rk"), partitionCol = "day")
      t.createIfNotExists(Seq.empty[(String, String, String, Int)]
        .toDF("day", "pk", "rk", "n").schema)
      t.importOnce(rows.toDF("day", "pk", "rk", "n"))
      t.merge(srcRows.toDF("pk", "rk", "v"),
        matched = Seq(
          MatchedDelete(src("v") % 5 === 0),
          MatchedUpdate(src("v") % 3 === 0, Map("n" -> src("v")))),
        notMatchedInsert = Some((src("v") % 2 === 0, Map(
          "day" -> lit("dz"), "pk" -> src("pk"), "rk" -> src("rk"),
          "n" -> src("v")))))
      val got = t.read.select("day", "pk", "rk", "n")
        .as[(String, String, String, Int)].collect().toSet
      // reference: plain Scala over the same inputs
      val byKey = srcRows.map(r => (r._1, r._2) -> r._3).toMap
      val kept = rows.flatMap { case (day, pk, rk, n) =>
        byKey.get((pk, rk)) match {
          case Some(v) if v % 5 == 0 => None
          case Some(v) if v % 3 == 0 => Some((day, pk, rk, v))
          case _ => Some((day, pk, rk, n))
        }
      }
      val tableKeys = rows.map(r => (r._2, r._3)).toSet
      val ins = srcRows.collect {
        case (pk, rk, v) if !tableKeys((pk, rk)) && v % 2 == 0 =>
          ("dz", pk, rk, v)
      }
      assert(got === (kept ++ ins).toSet,
        s"merge must equal the reference on rows=$rows src=$srcRows")
    }
  }

  test("restore(v) reproduces readAt(v) under random mutation sequences (DV interplay included)") {
    val opGen: Gen[List[Int]] = Gen.listOfN(5, Gen.chooseNum(0, 3))
    samples(opGen, 4).zipWithIndex.foreach { case (opsList, run) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_prest").toString + "/t"
      val t = new GraftTable(spark, dir, keys = Seq("pk", "rk"), partitionCol = "day")
      t.createIfNotExists(Seq.empty[(String, String, String, Int)]
        .toDF("day", "pk", "rk", "n").schema)
      t.importOnce((0 until 12).map(i =>
        ("d" + (i % 3), "p", "r" + i, i * 7 + run)).toDF("day", "pk", "rk", "n"))
      opsList.zipWithIndex.foreach { case (op, step) =>
        val s0 = 13 + step * 3 + run
        op match {
          case 0 => t.upsertReplace(Seq(("d" + (s0 % 3), "p", "r" + (s0 % 14), s0))
            .toDF("day", "pk", "rk", "n"))
          case 1 => t.deleteWhere(col("n") % 4 === (s0 % 4))
          case 2 => t.deleteByKeys(Seq(("p", "r" + (s0 % 14))).toDF("pk", "rk"))
          case 3 => t.insertIfAbsent(Seq(("d" + (s0 % 3), "p", "r" + (s0 % 20), s0))
            .toDF("day", "pk", "rk", "n"))
        }
      }
      // restore to a mid-history version and compare against the
      // PRE-restore time-travel read of the same version
      val vs = t.versions
      val target = vs(vs.size / 2)
      val want = t.readAt(target).collect().map(_.toString).sorted.toSeq
      t.restore(target)
      val got = t.read.collect().map(_.toString).sorted.toSeq
      assert(got === want,
        s"restore($target) after ops=$opsList must equal readAt($target)")
      // and the restored table keeps mutating sanely
      t.insertIfAbsent(Seq(("dq", "p", "rq", 1)).toDF("day", "pk", "rk", "n"))
      assert(t.read.count() == want.size + 1)
    }
  }

  test("readChangesRowsSince(v) equals the reference state diff under " +
    "random mutation sequences (upsert/keyed-delete/DV-delete/insert)") {
    // day is a FUNCTION of the key (keys never move partitions), so the
    // table-global keyed contract the feed requires holds throughout
    def dayOf(r: Int) = "d" + (r % 3)
    val opGen: Gen[List[Int]] = Gen.listOfN(5, Gen.chooseNum(0, 3))
    samples(opGen, 4).zipWithIndex.foreach { case (opsList, run) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_pcdc").toString + "/t"
      val t = new GraftTable(spark, dir, keys = Seq("pk", "rk"), partitionCol = "day")
      t.createIfNotExists(Seq.empty[(String, String, String, Int)]
        .toDF("day", "pk", "rk", "n").schema)
      t.importOnce((0 until 12).map(i =>
        (dayOf(i), "p", "r" + i, i * 7 + run)).toDF("day", "pk", "rk", "n"))
      def snap() = t.read.collect().map(r2 =>
        (r2.getAs[String]("pk"), r2.getAs[String]("rk")) ->
          (r2.getAs[String]("day"), r2.getAs[Int]("n"))).toMap
      // (version, state) after every op — a no-match deleteWhere
      // commits nothing, so versions must be RECORDED, not inferred
      val states = scala.collection.mutable.ListBuffer(
        (t.currentVersion, snap()))
      opsList.zipWithIndex.foreach { case (op, step) =>
        val s0 = 13 + step * 3 + run
        val r = s0 % 18
        op match {
          case 0 => t.upsertReplace(Seq((dayOf(r), "p", "r" + r, s0))
            .toDF("day", "pk", "rk", "n"))
          case 1 => t.deleteByKeys(Seq(("p", "r" + (s0 % 12))).toDF("pk", "rk"))
          case 2 => t.deleteWhere(col("n") % 5 === (s0 % 5))
          case 3 => t.insertIfAbsent(Seq((dayOf(r), "p", "r" + r, s0 + 100))
            .toDF("day", "pk", "rk", "n"))
        }
        states += ((t.currentVersion, snap()))
      }
      // compare the feed against the reference diff for EVERY since
      (0 until states.size - 1).foreach { i =>
        val (since, old) = states(i)
        val cur = states.last._2
        val want = (cur.keySet -- old.keySet).map(k =>
          (k, cur(k), "insert")) ++
          (old.keySet -- cur.keySet).map(k => (k, old(k), "delete")) ++
          old.keySet.intersect(cur.keySet).filter(k => old(k) != cur(k))
            .flatMap(k => Seq((k, old(k), "update_preimage"),
              (k, cur(k), "update_postimage")))
        val got = t.readChangesRowsSince(since).collect().map(r2 =>
          (((r2.getAs[String]("pk"), r2.getAs[String]("rk")),
            (r2.getAs[String]("day"), r2.getAs[Int]("n")),
            r2.getAs[String]("_change_type")))).toSet
        assert(got === want.toSet,
          s"feed since=$since ops=$opsList step=$i: got $got want $want")
      }
    }
  }
}
