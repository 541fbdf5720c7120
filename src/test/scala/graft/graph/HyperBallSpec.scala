package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.relational.Sketches

class HyperBallSpec extends SparkSpec {

  /** Undirected path 0–1–2–…–9 plus an isolated triangle 20-21-22. */
  private def pathGraph(): DataFrame = {
    import spark.implicits._
    val path = (0L until 9L).map(i => (i, i + 1))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    EdgeFrames.symmetrizedWeighted((path ++ tri).toDF("id_a", "id_b"))
  }

  test("round-r registers equal the direct sketch of the exact r-ball") {
    val sym = pathGraph()
    val rounds = HyperBall.registerRounds(sym, rounds = 3, p = 6, salt = "hb")
    // exact ball membership via pair expansion
    var reach = sym.select(col("__s").as("g"), col("__s").as("member"))
      .distinct()
    for (r <- 0 to 3) {
      val direct = Sketches.hllGroupedRegisters(reach, col("g"),
          col("member"), "hb", p = 6)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val merged = rounds(r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(merged == direct,
        s"round $r max-merge must equal the direct ball sketch")
      reach = reach.unionByName(
          reach.join(sym, col("member") === col("__s"))
            .select(col("g"), col("__t").as("member")))
        .distinct()
    }
  }

  test("neighborhood function grows monotonically and flags the 90% radius") {
    val nf = HyperBall.neighborhoodFunction(pathGraph(), rounds = 9, p = 6)
      .orderBy("r")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getBoolean(3)))
    val vals = nf.map(_._2)
    assert(vals.zip(vals.tail).forall { case (a, b) => b >= a },
      s"monotone growth violated: ${vals.toSeq}")
    assert(nf.count(_._3) == 1, "exactly one effective-diameter row")
    val effR = nf.find(_._3).get._1
    // path truth: N(r) saturates at r = 9 (end-to-end), is >= 90% well
    // before; the triangle saturates at r = 1. The flag must sit at
    // the FIRST r whose fraction crosses 0.9.
    val nff = vals.last
    assert(vals(effR) >= 0.9 * nff && (effR == 0 || vals(effR - 1) < 0.9 * nff))
  }

  test("estimates track the exact neighborhood function on a known graph") {
    val sym = pathGraph()
    val est = HyperBall.neighborhoodFunction(sym, rounds = 4, p = 6)
      .select(col("r"), col("nf")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val truth = HyperBall.exactNeighborhoodFunction(sym, rounds = 4)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exact truth for the 10-path + 3-triangle: N(0)=13,
    // N(1)=10+2·9+9=37 path(28)+triangle(9), N(r) grows along the path
    assert(truth(0) == 13L && truth(1) == 37L, s"truth: $truth")
    for (r <- 0 to 4) {
      val rel = math.abs(est(r) - truth(r)) / truth(r)
      assert(rel <= 0.25, s"r=$r estimate ${est(r)} vs ${truth(r)}: $rel")
    }
  }
}
