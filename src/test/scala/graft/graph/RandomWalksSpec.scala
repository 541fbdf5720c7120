package graft.graph

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Random walks: edge validity of every hop, determinism, walk
  * accounting, and an INDEPENDENT pure-JVM replay of the md5-draw
  * trajectory on a hand graph (MessageDigest, not Spark's md5 — the
  * same engine-independence the DuckDB oracle pins at gate scale).
  */
class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  private def sym(edges: Seq[(Long, Long)]): DataFrame =
    EdgeFrames.symmetrizedWeighted(edges.toDF("id_a", "id_b"))

  private def walks(edges: Seq[(Long, Long)], seeds: Seq[Long],
      perNode: Int = 2, steps: Int = 4,
      salt: String = "rw"): Seq[(Long, Int, Long)] =
    RandomWalks.uniformWalksOn(sym(edges), seeds.toDF("__n"),
        perNode, steps, salt)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  // two triangles joined by a bridge — every node has degree >= 2
  private val graph: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))

  /** The operator's draw contract, replayed with java.security md5. */
  private def drawIdx(salt: String, walkId: Long, step: Int,
      deg: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$salt$walkId-$step".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % deg).toInt
  }

  test("every hop follows an edge of the graph") {
    val und = graph.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val byWalk = walks(graph, Seq(1L, 4L)).groupBy(_._1)
    byWalk.values.foreach { t =>
      t.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) =>
          assert(und.contains((a, b)), s"non-edge hop $a -> $b")
        case _ =>
      }
    }
  }

  test("walk accounting: perNode walks per seed, steps+1 rows each") {
    val w = walks(graph, Seq(1L, 3L, 5L), perNode = 3, steps = 5)
    val byWalk = w.groupBy(_._1)
    assert(byWalk.size == 9)
    byWalk.foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted == (0 to 5),
        s"walk $id has gaps: ${rows.map(_._2).sorted}")
      // step 0 is the seed the walk id encodes
      assert(rows.minBy(_._2)._3 == id / 3)
    }
  }

  test("deterministic: identical runs, salt changes the trajectories") {
    val a = walks(graph, Seq(1L, 4L))
    val b = walks(graph, Seq(1L, 4L))
    assert(a == b)
    val c = walks(graph, Seq(1L, 4L), salt = "other")
    assert(a.map(_._1).toSet == c.map(_._1).toSet) // same walks exist
    assert(a != c) // but some hop differs
  }

  test("independent MessageDigest replay reproduces every trajectory") {
    val adj = graph.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct.sorted }
    val got = walks(graph, Seq(2L, 6L), perNode = 2, steps = 4)
    val expected = for {
      seed <- Seq(2L, 6L); rep <- 0 until 2
    } yield {
      val id = seed * 2 + rep
      var cur = seed
      (id, 0, seed) +: (1 to 4).map { i =>
        val ns = adj(cur)
        cur = ns(drawIdx("rw", id, i, ns.size))
        (id, i, cur)
      }
    }
    assert(got == expected.flatten.sortBy(t => (t._1, t._2)))
  }

  test("a walker seeded outside the graph stops at step 0") {
    val w = walks(graph, Seq(1L, 99L), perNode = 1, steps = 3)
    assert(w.filter(_._1 == 99L) == Seq((99L, 0, 99L)))
    assert(w.filter(_._1 == 1L).size == 4)
  }

  private def biased(edges: Seq[(Long, Long)], seeds: Seq[Long],
      p: Double, q: Double, perNode: Int = 2, steps: Int = 4,
      salt: String = "n2v"): Seq[(Long, Int, Long)] =
    RandomWalks.biasedWalksOn(sym(edges), seeds.toDF("__n"),
        perNode, steps, p, q, salt)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("p = q = 1 biased walk: every hop is a graph edge, full length") {
    val und = graph.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val w = biased(graph, Seq(1L, 4L), p = 1.0, q = 1.0)
    assert(w.groupBy(_._1).forall(_._2.size == 5))
    w.groupBy(_._1).values.foreach { t =>
      t.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) => assert(und.contains((a, b)))
        case _ =>
      }
    }
  }

  test("independent MessageDigest replay of the biased trajectories") {
    val adjSet = graph.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val adj = adjSet.toSeq.groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).distinct.sorted }
    val (p, q) = (4.0, 0.25)
    val (wRet, wLoc, wOut) =
      (math.round(1e6 / p), 1000000L, math.round(1e6 / q))
    def draw(id: Long, step: Int, tot: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"n2v$id-$step".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % tot
    }
    val expected = (for {
      seed <- Seq(1L, 4L); rep <- 0 until 2
    } yield {
      val id = seed * 2 + rep
      var prev = seed
      var cur = adj(seed)(draw(id, 1, adj(seed).size.toLong).toInt)
      (id, 0, seed) +: (id, 1, cur) +: (2 to 4).map { i =>
        val cands = adj(cur)
        val wts = cands.map(c =>
          if (c == prev) wRet
          else if (adjSet.contains((prev, c))) wLoc
          else wOut)
        val x = draw(id, i, wts.sum)
        val his = wts.scanLeft(0L)(_ + _).tail
        val k = his.indexWhere(x < _)
        prev = cur; cur = cands(k)
        (id, i, cur)
      }
    }).flatten.sortBy(t => (t._1, t._2))
    assert(biased(graph, Seq(1L, 4L), p, q) == expected)
  }

  test("huge p suppresses immediate backtracking on a path graph") {
    // path 1-2-3-4-5-6-7-8: from an interior node the only non-return
    // move is forward, so with p -> inf every hop must advance
    val path = (1L to 7L).map(i => (i, i + 1))
    val w = biased(path, Seq(2L), p = 1e6, q = 1.0, perNode = 4,
      steps = 3)
    w.groupBy(_._1).values.foreach { t =>
      val seq = t.sortBy(_._2).map(_._3)
      seq.sliding(3).foreach {
        // at an endpoint the return is the ONLY candidate — skip
        case Seq(a, b, c) if b != 1L && b != 8L =>
          assert(a != c, s"backtracked: $seq")
        case _ =>
      }
    }
  }
}
