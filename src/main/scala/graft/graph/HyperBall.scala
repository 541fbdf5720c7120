package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.relational.Sketches

/** HyperBall / ANF: the HyperLogLog neighborhood function (Boldi,
  * Rosa & Vigna, "HyperANF: approximating the neighbourhood function
  * of very large graphs on a budget", WWW'11; Palmer, Gibbons &
  * Faloutsos KDD'02 ANF) — per-node reachable-set growth b(v, r) and
  * the effective-diameter readout, the web-scale alternative to
  * all-pairs BFS.
  *
  * Each node carries one HLL register frame ([[Sketches]] machinery —
  * the house h60 split, so every register and rank replays in DuckDB
  * integer arithmetic). Round r max-merges each node's sketch with its
  * neighbors' round-(r−1) sketches:
  *
  *   R_r(v) = maxmerge(R_{r−1}(v), ∪_{(v,u)∈E} R_{r−1}(u))
  *
  * which by HLL idempotence IS the sketch of the exact r-hop ball
  * membership (spec'd against per-node BFS truth). Per round the
  * engine moves Σ_v deg(v)·2^p = |E|·2^p register rows through ONE
  * edge-keyed equi-join + ONE (node, register) max rollup with
  * map-side partial max — never a pair frame, never node² state; the
  * frame is localCheckpoint'ed per round so the k-round plan never
  * re-executes prefix rounds. That is the HyperBall cost model: at
  * 100 TB, p stays 4–6 and rounds stop at the effective diameter.
  */
object HyperBall {

  /** Per-round register frames R_0..R_rounds (g = node, register,
    * rank). R_0 sketches each node's own id.
    */
  def registerRounds(sym: DataFrame, rounds: Int, p: Int = 6,
      salt: String = "hb"): Seq[DataFrame] = {
    require(rounds >= 1, s"need rounds >= 1, got $rounds")
    val nodes = sym.select(col("__s").as("g")).distinct()
    var regs = Sketches.hllGroupedRegisters(nodes, col("g"), col("g"),
      salt, p).localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    out += regs
    for (_ <- 1 to rounds) {
      val via = sym.join(regs, col("__s") === col("g"))
        .select(col("__t").as("g"), col("register"), col("rank"))
      regs = regs.unionByName(via)
        .groupBy("g", "register").agg(max("rank").as("rank"))
        .localCheckpoint()
      out += regs
    }
    out.result()
  }

  /** Neighborhood function N(r) = Σ_v |ball(v, r)|-estimate for
    * r = 0..rounds, with the growth fraction against N(rounds) and the
    * effective-diameter flag (smallest r with N(r) ≥ `effFrac`·N(rounds),
    * the standard 90%-effective-diameter readout). Per-node estimates
    * are the [[Sketches.hllGroupedEstimate]] integer-power-sum form,
    * rounded 6 before the sum; N, frac round 6 — the whole trajectory
    * replays as chained CTEs.
    *
    * @return (r, nf, frac, is_eff_diameter), rounds+1 rows
    */
  def neighborhoodFunction(sym: DataFrame, rounds: Int = 4, p: Int = 6,
      salt: String = "hb", effFrac: Double = 0.9): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    // Memory is O(1) in rounds, not O(rounds): each round's scalar
    // N(r) is materialized EAGERLY off the live register frame and the
    // previous round's checkpoint is released — retaining every
    // round's |V|·2^p frame is exactly what OOMs a 16× scale run in
    // one JVM (and wastes block-manager memory on a cluster). The
    // collected values re-enter the plan as literals, so the readout
    // arithmetic below is unchanged.
    def nfOf(regs: DataFrame): Double =
      Sketches.hllGroupedEstimate(regs, p)
        .agg(round(sum("estimate"), 6).as("nf"))
        .head().getDouble(0)
    val nodes = sym.select(col("__s").as("g")).distinct()
    var regs = Sketches.hllGroupedRegisters(nodes, col("g"), col("g"),
      salt, p).localCheckpoint()
    val nfs = scala.collection.mutable.ArrayBuffer(nfOf(regs))
    for (_ <- 1 to rounds) {
      val via = sym.join(regs, col("__s") === col("g"))
        .select(col("__t").as("g"), col("register"), col("rank"))
      val next = regs.unionByName(via)
        .groupBy("g", "register").agg(max("rank").as("rank"))
        .localCheckpoint()
      nfs += nfOf(next)
      regs.unpersist(blocking = false)
      regs = next
    }
    regs.unpersist(blocking = false)
    val all = nfs.toSeq.zipWithIndex
      .map { case (nf, i) => (i, nf) }.toDF("r", "nf")
    val fin = broadcast(all.filter(col("r") === rounds)
      .select(col("nf").as("__nff")))
    val frac = all.crossJoin(fin)
      .select(col("r"), col("nf"),
        round(col("nf") / col("__nff"), 6).as("frac"))
    val eff = broadcast(frac.filter(col("frac") >= effFrac)
      .agg(min("r").as("__re")))
    frac.crossJoin(eff)
      .select(col("r"), col("nf"), col("frac"),
        (col("r") === col("__re")).as("is_eff_diameter"))
  }

  /** Exact neighborhood function by iterated pair expansion — the BFS
    * ground truth the sketch is gated against. PAIR-FRAME SIZED
    * (≤ |V|·|ball|): only for bounded slices and specs, never the
    * scale path.
    */
  def exactNeighborhoodFunction(sym: DataFrame, rounds: Int): DataFrame = {
    val nodes = sym.select(col("__s")).distinct()
    var reach = nodes.select(col("__s").as("__v"), col("__s").as("__u"))
      .localCheckpoint()
    val out = Seq.newBuilder[DataFrame]
    out += reach.agg(count(lit(1)).as("nf_true"))
      .select(lit(0).as("r"), col("nf_true"))
    for (i <- 1 to rounds) {
      val via = reach.join(sym, col("__u") === col("__s"))
        .select(col("__v"), col("__t").as("__u"))
      reach = reach.unionByName(via).distinct().localCheckpoint()
      out += reach.agg(count(lit(1)).as("nf_true"))
        .select(lit(i).as("r"), col("nf_true"))
    }
    out.result().reduce(_ unionByName _)
  }
}
