package graft.linkage

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** FS-EM behavior on pairs drawn from a KNOWN generative model
  * (parameter recovery), plus the scoring identities and invariances
  * the gate's exact hash can't articulate on its own.
  */
class FellegiSunterSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq("f1", "f2")

  /** pairs drawn from λ=0.2, m=(0.9, 0.8), u=(0.2, 0.1) */
  private def synthetic(n: Int, seed: Int): Seq[(Int, Int)] = {
    val rnd = new Random(seed)
    Seq.fill(n) {
      val isMatch = rnd.nextDouble() < 0.2
      def draw(pm: Double, pu: Double) =
        if (rnd.nextDouble() < (if (isMatch) pm else pu)) 1 else 0
      (draw(0.9, 0.2), draw(0.8, 0.1))
    }
  }

  test("EM recovers the generating parameters on synthetic pairs") {
    val df = synthetic(20000, 3).toDF("f1", "f2")
    val p = FellegiSunter.emFit(df, fields, iters = 30).collect()(0)
    val (lam, m1, m2, u1, u2) = (p.getAs[Double]("lam"),
      p.getAs[Double]("m_f1"), p.getAs[Double]("m_f2"),
      p.getAs[Double]("u_f1"), p.getAs[Double]("u_f2"))
    info(s"lam=$lam m=($m1,$m2) u=($u1,$u2)")
    assert(math.abs(lam - 0.2) < 0.08, s"lambda off: $lam")
    assert(math.abs(m1 - 0.9) < 0.1 && math.abs(m2 - 0.8) < 0.1)
    assert(math.abs(u1 - 0.2) < 0.08 && math.abs(u2 - 0.1) < 0.08)
  }

  test("EM depends on pairs only through pattern frequencies") {
    // doubling every pair leaves all ratios — hence the whole
    // trajectory — unchanged
    val base = synthetic(4000, 5)
    val once = FellegiSunter.emFit(base.toDF("f1", "f2"), fields).collect()(0)
    val twice = FellegiSunter.emFit((base ++ base).toDF("f1", "f2"),
      fields).collect()(0)
    assert(once == twice)
  }

  test("match_weight is the sum of per-field log2 likelihood ratios") {
    val params = spark.range(1).select(lit(0.1).as("lam"),
      lit(0.9).as("m_f1"), lit(0.6).as("m_f2"),
      lit(0.3).as("u_f1"), lit(0.05).as("u_f2"))
    val pairs = Seq((1, 1), (1, 0), (0, 1), (0, 0)).toDF("f1", "f2")
    val got = FellegiSunter.score(pairs, fields, params)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getAs[Double]("match_weight"))).toMap
    def lr(g: Int, m: Double, u: Double) =
      if (g == 1) math.log(m / u) / math.log(2.0)
      else math.log((1 - m) / (1 - u)) / math.log(2.0)
    for (((g1, g2), w) <- got) {
      val expect = lr(g1, 0.9, 0.3) + lr(g2, 0.6, 0.05)
      assert(math.abs(w - expect) < 1e-5, s"($g1,$g2): $w vs $expect")
    }
  }

  test("posterior is monotone in agreement when every m_k > u_k") {
    val params = spark.range(1).select(lit(0.1).as("lam"),
      lit(0.9).as("m_f1"), lit(0.8).as("m_f2"),
      lit(0.2).as("u_f1"), lit(0.1).as("u_f2"))
    val pairs = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("f1", "f2")
    val post = FellegiSunter.score(pairs, fields, params)
      .collect().map(r => (r.getInt(0) + r.getInt(1), r.getInt(0),
        r.getAs[Double]("posterior")))
    assert(post.maxBy(_._1)._3 == post.map(_._3).max) // (1,1) highest
    assert(post.minBy(_._1)._3 == post.map(_._3).min) // (0,0) lowest
  }

  test("degenerate field (always agrees) clamps instead of hitting 1.0") {
    val pairs = Seq.fill(100)((1, 1)).toDF("f1", "f2")
    val p = FellegiSunter.emFit(pairs, fields, iters = 3).collect()(0)
    assert(p.getAs[Double]("m_f1") <= 0.999999)
    assert(p.getAs[Double]("u_f1") <= 0.999999)
  }

  test("uFromRandomPairs recovers by-chance agreement rates on independent fields") {
    // 2000 rows, two independent attributes: u_k should approach the
    // collision probability sum(p_v^2) of each value distribution
    val df = spark.range(2000).select(col("id"),
      (col("id") % 4).cast("string").as("c4"),   // uniform-4: u ~ 0.25
      (col("id") % 10).cast("string").as("c10")) // uniform-10: u ~ 0.10
    val u = FellegiSunter.uFromRandomPairs(df, "id", Seq("c4", "c10"),
      j => j.select(
        when(col("c4_a") === col("c4_b"), 1).otherwise(0).as("g4"),
        when(col("c10_a") === col("c10_b"), 1).otherwise(0).as("g10")),
      Seq("g4", "g10"), nBuckets = 500).collect()(0)
    assert(math.abs(u.getAs[Double]("u_g4") - 0.25) < 0.05)
    assert(math.abs(u.getAs[Double]("u_g10") - 0.10) < 0.04)
  }

  test("uFromRandomPairs with zero drawn pairs reports null u, not a fabricated prior") {
    val one = spark.range(1).selectExpr("id", "cast(id % 2 as string) as c")
    val u = FellegiSunter.uFromRandomPairs(one, "id", Seq("c"),
      j => j.select(when(col("c_a") === col("c_b"), 1).otherwise(0).as("g")),
      Seq("g"), nBuckets = 10).collect()(0)
    assert(u.isNullAt(u.fieldIndex("u_g")))
  }

  test("emFitFixedU holds u fixed, fits (lam, m), and emits the full param surface") {
    val df = synthetic(20000, 7).toDF("f1", "f2")
    val uFixed = Map("f1" -> 0.2, "f2" -> 0.1) // the generating u
    val p = FellegiSunter.emFitFixedU(df, fields, uFixed, iters = 30)
      .collect()(0)
    // u passes through verbatim
    assert(p.getAs[Double]("u_f1") == 0.2 && p.getAs[Double]("u_f2") == 0.1)
    // with the true u pinned, lam and m should recover the generator
    assert(math.abs(p.getAs[Double]("lam") - 0.2) < 0.08)
    assert(math.abs(p.getAs[Double]("m_f1") - 0.9) < 0.1)
    assert(math.abs(p.getAs[Double]("m_f2") - 0.8) < 0.12)
    // scoring consumes the emitted surface directly
    val scored = FellegiSunter.score(df.limit(5),
      fields, FellegiSunter.emFitFixedU(df, fields, uFixed, iters = 5))
    assert(scored.collect().forall(r => !r.isNullAt(3)))
  }

  test("degenerate corpus cannot drive lam to exactly 0/1 — params stay finite") {
    // every pattern identical + extreme init pushes the E-step posterior
    // to round to exactly 1.0 at quantize=9; unclamped, lam=1.0 zeroes
    // wu and the next iteration's u-aggregates evaluate 0/0
    val allOnes = Seq.fill(50)((1, 1)).toDF("f1", "f2")
    val p = FellegiSunter.emFit(allOnes, fields, iters = 4,
      lambda0 = 0.9, m0 = 0.9, u0 = 1e-6).collect()(0)
    Seq("lam", "m_f1", "m_f2", "u_f1", "u_f2").foreach { c =>
      val v = p.getAs[Double](c)
      assert(!v.isNaN && v > 0.0 && v < 1.0, s"$c degenerate: $v")
    }
  }

  test("degenerate params score as nulls, not a driver crash") {
    val pairs = Seq((1, 0), (0, 1)).toDF("f1", "f2")
    // emFit over ZERO pairs: one aggregate row, all-null params
    val nullParams = FellegiSunter.emFit(
      pairs.limit(0), fields, iters = 2)
    val scored = FellegiSunter.score(pairs, fields, nullParams).collect()
    assert(scored.length == 2)
    assert(scored.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // a caller-supplied empty frame yields an empty result
    assert(FellegiSunter.score(pairs, fields, nullParams.limit(0))
      .count() == 0)
  }

  test("scoring is a literal scan projection — no join, no shuffle, codegen'd") {
    val params = FellegiSunter.emFit(synthetic(1000, 9).toDF("f1", "f2"),
      fields)
    val plan = FellegiSunter.score(synthetic(1000, 9).toDF("f1", "f2"),
      fields, params).queryExecution.executedPlan.toString
    // weights-in-plan: the fitted params embed as literals, so the
    // pair frame flows through one fused projection — a broadcast
    // param row would hide the expression behind a non-codegen
    // BroadcastNestedLoopJoin
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("Exchange"))
    assert(!plan.contains("Window"))
    // on a parquet-backed corpus this is a *(1) codegen'd scan
    // projection; on in-memory test data Catalyst goes further and
    // constant-folds the whole thing into the LocalTableScan
    assert(plan.contains("*(1)") || plan.contains("LocalTableScan"),
      s"projection must fuse:\n$plan")
  }
}
