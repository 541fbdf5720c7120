// in graft.llmdata so the mix60 private[llmdata] kernel is reachable;
// the graft.functions kernels under test are public
package graft.llmdata

import graft.functions.{Interp1D, NormalPpf, TokenStats}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pins for the pure kernels inside the native
  * expressions — these run WITHOUT Spark (the expressions delegate to
  * these exact static methods from both interpreted eval and generated
  * code), so hundreds of random cases cost milliseconds.
  */
class FunctionPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: $r")
  }

  test("Interp1D.interp: clamps at ends, exact at knots, bounded between neighbors") {
    val knots = for {
      n <- Gen.choose(2, 12)
      xs <- Gen.listOfN(n, Gen.choose(-1e3, 1e3)).map(_.distinct.sorted)
        .suchThat(_.size >= 2)
      ys <- Gen.listOfN(xs.size, Gen.choose(-1e3, 1e3))
    } yield (xs.toArray, ys.toArray)
    check(Prop.forAll(knots, Gen.choose(-2e3, 2e3)) { case ((xs, ys), x) =>
      val v = Interp1D.interp(x, xs, ys)
      if (x <= xs.head) v == ys.head
      else if (x >= xs.last) v == ys.last
      else {
        val hi = xs.indexWhere(_ > x)
        val lo = hi - 1
        val (a, b) = (math.min(ys(lo), ys(hi)), math.max(ys(lo), ys(hi)))
        v >= a - 1e-9 && v <= b + 1e-9
      }
    }, "interp bounds")
    check(Prop.forAll(knots) { case (xs, ys) =>
      xs.indices.forall(i => Interp1D.interp(xs(i), xs, ys) == ys(i))
    }, "interp exact at knots")
  }

  test("NormalPpf.ppf: monotone, symmetric, pinned quantiles") {
    check(Prop.forAll(Gen.choose(1e-6, 1.0 - 1e-6), Gen.choose(1e-6, 1.0 - 1e-6)) {
      (p, q) => (p < q) == (NormalPpf.ppf(p) < NormalPpf.ppf(q)) || p == q
    }, "ppf monotone")
    check(Prop.forAll(Gen.choose(1e-6, 1.0 - 1e-6)) { p =>
      math.abs(NormalPpf.ppf(p) + NormalPpf.ppf(1.0 - p)) < 1e-9
    }, "ppf symmetric")
    assert(math.abs(NormalPpf.ppf(0.975) - 1.959964) < 1e-3)
    assert(NormalPpf.ppf(0.5) == 0.0)
  }

  test("Dedup.mix60: stays in [0, 2^60), is injective on sampled inputs") {
    val D = Dedup
    val in60 = Gen.choose(0L, (1L << 60) - 1)
    check(Prop.forAll(in60) { x =>
      val v = D.mix60(x); v >= 0L && v < (1L << 60)
    }, "mix60 range")
    // each xorshift step is a bijection on Z_2^60 → no collisions ever;
    // sample-check injectivity
    check(Prop.forAll(in60, in60) { (a, b) =>
      a == b || D.mix60(a) != D.mix60(b)
    }, "mix60 injective")
    // the exact arithmetic the DuckDB oracle mirrors
    check(Prop.forAll(in60) { x =>
      val m60 = (1L << 60) - 1
      var h = x
      h = h ^ ((h & ((1L << 47) - 1)) << 13)
      h = h ^ (h >>> 7)
      h = h ^ ((h & ((1L << 43) - 1)) << 17)
      D.mix60(x) == h
    }, "mix60 formula")
  }

  test("TokenStats.compute matches a naive split-based recount") {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const("the"), Gen.const("héllo"))
    val text = Gen.listOf(word).map(_.mkString(" "))
    val stop = new java.util.HashSet[String]()
    stop.add("the"); stop.add("a")
    check(Prop.forAll(text) { t =>
      val got = TokenStats.compute(t, stop).toLongArray().toSeq
      val toks = t.split(" ", -1).toSeq
      val want = Seq(
        toks.size.toLong,
        toks.map(w => w.codePointCount(0, w.length).toLong).sum,
        toks.distinct.size.toLong,
        toks.count(stop.contains).toLong,
        toks.map(w => (w.codePointCount(0, w.length) + 3L) / 4L).sum)
      got == want
    }, "token stats recount")
  }

  test("RepetitionStats.compute matches a naive group-by recount") {
    import graft.functions.RepetitionStats
    // small vocab so repeats actually occur
    val word = Gen.oneOf("aa", "b", "ccc", "the", "", "héllo")
    val text = Gen.listOf(word).map(_.mkString(" "))
    val n = Gen.choose(1, 4)
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    check(Prop.forAll(text, n) { (t, nn) =>
      val got = RepetitionStats.compute(t, nn, "b").toLongArray().toSeq
      val toks = t.split(" ", -1).toSeq
      val grams = toks.sliding(nn).filter(_.size == nn).map(_.mkString(" ")).toSeq
      val gc = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val topScore = if (gc.isEmpty) 0L else gc.map { case (g, c) => c * cp(g) }.max
      val dupChars = gc.collect { case (g, c) if c >= 2 => c * cp(g) }.sum
      // literal-separator split keeping empties: use -1-limit regex on the
      // quoted separator
      val lines = t.split(java.util.regex.Pattern.quote("b"), -1).toSeq
      val lc = lines.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = Seq(
        topScore, dupChars, cp(t),
        lines.size.toLong, lc.size.toLong,
        lc.collect { case (_, c) if c > 1 => c }.sum,
        lc.collect { case (l, c) if c > 1 => c * cp(l) }.sum,
        lc.map { case (l, c) => c * cp(l) }.sum)
      got == want
    }, "repetition stats recount")
  }
}
