package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  // Every semantic case runs under BOTH physical routings: the
  // broadcast-build form and the large-table shuffled equi-join —
  // routing must never change the answer.
  private val forms =
    Seq("broadcast" -> Some(true), "shuffled" -> Some(false))

  for ((label, form) <- forms) {
    test(s"fuzzyPairs($label): only in-block pairs within the edit budget, id_a < id_b") {
      val df = Seq(
        (1L, "smith", 1), (2L, "smyth", 1), (3L, "smith", 2),
        (4L, "jones", 1), (5L, "jonas", 1), (6L, "wildly-different", 1))
        .toDF("id", "name", "blk")
      val pairs = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"),
        maxDistance = 1, broadcastBuild = form).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(4)))
      // (1,2) smith~smyth d=1; (4,5) jones~jonas d=1. (1,3) identical but
      // different blocks -> excluded by blocking, the documented trade-off.
      assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (4L, 5L)))
      assert(pairs.forall(_._3 <= 1))
      assert(pairs.forall(p => p._1 < p._2))
    }

    test(s"fuzzyPairs($label): identical strings pair at distance 0") {
      val df = Seq((1L, "abc", 1), (2L, "abc", 1)).toDF("id", "name", "blk")
      val p = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 2,
        broadcastBuild = form).collect()
      assert(p.length == 1 && p.head.getInt(4) == 0)
    }

    test(s"fuzzyPairs($label): length guard never drops a within-budget pair") {
      // lengths differ by exactly maxDistance — must survive the guard
      val df = Seq((1L, "abcd", 1), (2L, "abc", 1)).toDF("id", "name", "blk")
      val p = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 1,
        broadcastBuild = form).collect()
      assert(p.length == 1 && p.head.getInt(4) == 1)
    }
  }

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("fuzzyPairs: shuffled form adds no broadcast hint") {
    // With the planner's auto-broadcast disabled, the ONLY way a
    // BroadcastExchange could appear is a forced broadcast() hint —
    // which would override the threshold. Its absence proves the
    // shuffled form leaves the build side unhinted.
    val df = Seq((1L, "smith", 1), (2L, "smyth", 1)).toDF("id", "name", "blk")
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = physicalPlan(EntityResolution.fuzzyPairs(
        df, "id", "name", col("blk"), 1, broadcastBuild = Some(false)))
      assert(!plan.contains("BroadcastExchange"),
        s"shuffled form must not broadcast:\n$plan")
      // sanity: the forced broadcast form still broadcasts under the
      // same disabled threshold (the hint is what routes it)
      val forced = physicalPlan(EntityResolution.fuzzyPairs(
        df, "id", "name", col("blk"), 1, broadcastBuild = Some(true)))
      assert(forced.contains("BroadcastExchange"))
    } finally spark.conf.set(key, prev)
  }

  test("fuzzyPairs: auto default broadcasts small inputs, shuffles past the threshold") {
    val df = Seq((1L, "smith", 1), (2L, "smyth", 1)).toDF("id", "name", "blk")
    // Small input under the default 10 MB threshold -> broadcast form.
    val small = physicalPlan(EntityResolution.fuzzyPairs(
      df, "id", "name", col("blk"), 1))
    assert(small.contains("BroadcastExchange"),
      s"auto should broadcast a tiny input:\n$small")
    // Same input with the threshold squeezed to 1 byte models the
    // corpus-sized case: the estimate exceeds it -> plain equi-join.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1")
      val large = physicalPlan(EntityResolution.fuzzyPairs(
        df, "id", "name", col("blk"), 1))
      assert(!large.contains("BroadcastExchange"),
        s"auto must not broadcast past the threshold:\n$large")
    } finally spark.conf.set(key, prev)
  }

  test("deletionVariants: the string plus every single-char deletion") {
    val v = spark.range(1).select(
      EntityResolution.deletionVariants(lit("abc")).as("v"))
      .collect()(0).getSeq[String](0)
    assert(v == Seq("abc", "bc", "ac", "ab"))
  }

  test("deletion-neighborhood theorem: lev <= 1 implies shared variant (exhaustive over short strings)") {
    // brute-force over all pairs from a small alphabet: every pair at
    // edit distance <= 1 must share a deletion-neighborhood key
    val strs = (for {
      a <- Seq("a", "b"); b <- Seq("", "a", "b"); c <- Seq("", "a", "b")
    } yield a + b + c).distinct
    def variants(s: String): Set[String] =
      Set(s) ++ s.indices.map(i => s.take(i) + s.drop(i + 1))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (x <- strs; y <- strs if x < y && lev(x, y) <= 1)
      assert(variants(x).intersect(variants(y)).nonEmpty, s"($x, $y)")
  }

  test("blockingUnion: union of rule pair-sets, deduped, nulls opt out") {
    val df = Seq(
      (1L, "aa", "x"), (2L, "aa", "y"), (3L, "ab", "x"),
      (4L, "zz", null.asInstanceOf[String]), (5L, "zz", null.asInstanceOf[String]))
      .toDF("id", "k1", "k2")
    val pairs = EntityResolution.blockingUnion(df, "id",
        rules = Seq(col("k1"), col("k2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // k1 pairs: (1,2) on "aa", (4,5) on "zz"; k2 pairs: (1,3) on "x";
    // nulls (4,5 on k2) opt out of that rule but still pair via k1
    assert(pairs == Set((1L, 2L), (4L, 5L), (1L, 3L)))
  }

  test("blockingUnion: a null ARRAY rule opts the row out of that rule only") {
    // rows 1/2 have null names (null deletion neighborhood) but share
    // city "x" — the scalar rule must still pair them; flatten()'s
    // null-poisoning is coalesced away per rule
    val df = Seq(
      (1L, null.asInstanceOf[String], "x"),
      (2L, null.asInstanceOf[String], "x"),
      (3L, "ab", "y"), (4L, "ab", "z"))
      .toDF("id", "name", "city")
    val pairs = EntityResolution.blockingUnion(df, "id",
        rules = Seq(EntityResolution.deletionVariants(col("name")),
          col("city")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) via city; (3,4) via the name neighborhood
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("blockingUnion: a pair caught by two rules appears once (dedup)") {
    val df = Seq((1L, "a", "b"), (2L, "a", "b")).toDF("id", "k1", "k2")
    val out = EntityResolution.blockingUnion(df, "id",
      rules = Seq(col("k1"), col("k2")), payload = Seq("k1")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 2L)
    assert(out(0).getString(2) == "a" && out(0).getString(3) == "a")
  }

  test("fuzzyPairsUnion(deletion neighborhood) equals the quadratic truth on a 400-row corpus") {
    val df = spark.range(400).select(
      col("id"),
      concat(lit("name-"), (col("id") % 40).cast("string"),
        when(col("id") % 7 === 0, lit("x")).otherwise(lit(""))).as("name"),
      (col("id") % 5).cast("int").as("blk"))
    val union = EntityResolution.fuzzyPairsUnion(df, "id", "name",
        rules = Seq(transform(
          EntityResolution.deletionVariants(col("name")),
          v => concat(col("blk").cast("string"), lit(":"), v))),
        maxDistance = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    // ground truth from the existing (within-block exhaustive) form
    val truth = EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 1,
        broadcastBuild = Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(union == truth)
    assert(union.nonEmpty)
  }

  test("blockingUnion plan: no cartesian product, single equi-join on the exploded keys") {
    val df = Seq((1L, "aa", "x"), (2L, "aa", "y")).toDF("id", "k1", "k2")
    val plan = physicalPlan(EntityResolution.blockingUnion(df, "id",
      rules = Seq(col("k1"), col("k2"))))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("fuzzyPairs: broadcast and shuffled forms agree on a 300-row corpus") {
    val df = spark.range(300).select(
      col("id"),
      concat(lit("name-"), (col("id") % 40).cast("string"),
        when(col("id") % 7 === 0, lit("x")).otherwise(lit(""))).as("name"),
      (col("id") % 5).cast("int").as("blk"))
    def run(form: Option[Boolean]) =
      EntityResolution.fuzzyPairs(df, "id", "name", col("blk"), 1,
        broadcastBuild = form)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    assert(run(Some(true)) == run(Some(false)))
    assert(run(Some(false)).nonEmpty)
  }
}
