package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted PageRank (Brin & Page 1998) — the link-graph quality
  * signal crawl pipelines attach to documents (Common Crawl publishes
  * exactly this as host-level ranks).
  *
  * Scale shape per iteration: `edges ⋈ ranks` on src (shuffled
  * equi-join; ranks is node-sized, edges edge-sized — neither side is
  * ever collected), one groupBy(dst) with map-side partial sums, and a
  * 1-row dangling-mass frame cross-joined back (never a driver
  * collect). The edge frame with per-src out-weights is computed once
  * and persisted across iterations.
  *
  * Determinism: rank updates are quantized to `quantize` decimals at
  * every iteration handoff — the same trick the Lloyd gate uses — so
  * an independent engine replaying the iterations (chained CTEs)
  * follows the bit-identical trajectory even though per-destination
  * sum order differs.
  *
  * rank_{t+1}(n) = (1−d)/N + d·( Σ_{e:s→n} rank_t(s)·w_e/outw_s
  *                               + dangling_t/N )
  */
object PageRank {

  /** Persisted per-iteration frames, registered so Bench's between-pass
    * Memos.clearAll() releases executor storage (NgramLm pattern).
    */
  private def track(df: DataFrame): DataFrame =
    graft.core.Memos.tracked("pr", df)

  /** @param edges (srcCol, dstCol, weightCol) — multi-edges allowed
    *   (weights add); self-loops allowed.
    * @return (node, rank) for every node appearing as src or dst.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, damping: Double = 0.85, iters: Int = 10,
      quantize: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__t"),
      col(weightCol).cast("double").as("__w"))
    val outw = e.groupBy("__s").agg(sum("__w").as("__ow"))
    val ew = e.join(outw, Seq("__s"))
      .select(col("__s"), col("__t"), (col("__w") / col("__ow")).as("__frac"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(ew)
    val nodes = e.select(col("__s").as("__n"))
      .union(e.select(col("__t").as("__n"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(nodes)
    // dangling = nodes never appearing as a src; computed once
    val danglingNodes = nodes.join(outw.select(col("__s").as("__n")),
        Seq("__n"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(danglingNodes)
    val n = nodes.count() // bounded: one long
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("__n"),
      round(lit(1.0) / n, quantize).as("__r"))
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, col("__s") === col("__n"))
        .groupBy(col("__t"))
        .agg(sum(col("__frac") * col("__r")).as("__m"))
      val dangling = ranks.join(danglingNodes, Seq("__n"), "left_semi")
        .agg(coalesce(sum("__r"), lit(0.0)).as("__dm"))
      ranks = nodes
        .join(contrib, col("__n") === col("__t"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("__n"),
          round(lit(base) + lit(damping) *
            (coalesce(col("__m"), lit(0.0)) + col("__dm") / n),
            quantize).as("__r"))
        // eager lineage truncation: each iteration references the
        // previous one twice (contribution + dangling mass), so an
        // un-truncated loop's logical plan grows 2^iters. Production
        // swaps this for reliable checkpoint(); same plan semantics.
        .localCheckpoint()
    }
    ranks.select(col("__n").as("node"), col("__r").as("rank"))
  }

  /** Personalized PageRank with a seed teleport set — TrustRank
    * (Gyöngyi, Garcia-Molina & Pedersen, "Combating Web Spam with
    * TrustRank", VLDB 2004): the production quality-propagation move a
    * corpus pipeline runs on its link graph — hand-vet a small seed set
    * of known-good hosts, teleport ONLY to seeds, and the stationary
    * mass becomes a trust score that decays with link distance from the
    * vetted set (spam farms far from seeds get ~0 even with dense
    * internal linkage, which uniform PageRank rewards).
    *
    * Same per-iteration shape as [[pageRank]] (one edge⋈rank join, one
    * groupBy(dst), a 1-row dangling frame); the only deltas are the
    * teleport vector s(n) = 1/|S| on seeds else 0 (a node-sized
    * persisted column, never a collect) and dangling mass restarting
    * ∝ s(n) (the TrustRank convention — lost mass returns to the vetted
    * set, not the whole graph):
    *
    * rank_{t+1}(n) = (1−d)·s(n) + d·( Σ_{e:m→n} rank_t(m)·w_e/outw_m
    *                                  + dangling_t·s(n) )
    *
    * @param seeds 1-column frame of seed node ids; rows not present in
    *   the graph are ignored (|S| counts the intersection). Must be
    *   non-empty after the intersect.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, seeds: DataFrame,
      damping: Double = 0.85, iters: Int = 10,
      quantize: Int = 10): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__t"),
      col(weightCol).cast("double").as("__w"))
    val outw = e.groupBy("__s").agg(sum("__w").as("__ow"))
    val ew = e.join(outw, Seq("__s"))
      .select(col("__s"), col("__t"), (col("__w") / col("__ow")).as("__frac"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(ew)
    val seedIds = seeds.select(seeds.columns.head).toDF("__n").distinct()
    val nodes = e.select(col("__s").as("__n"))
      .union(e.select(col("__t").as("__n"))).distinct()
    // teleport vector: node-sized, persisted once; |S| is one bounded long
    val seedNodes = nodes.join(seedIds, Seq("__n"), "left_semi")
    val ns = seedNodes.count()
    require(ns > 0, "no seed id is present in the graph")
    val sv = nodes.join(seedIds.select(col("__n"), lit(1).as("__is")),
        Seq("__n"), "left")
      .select(col("__n"),
        when(col("__is").isNotNull, lit(1.0) / ns).otherwise(lit(0.0))
          .as("__sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(sv)
    val danglingNodes = sv.join(outw.select(col("__s").as("__n")),
        Seq("__n"), "left_anti")
      .select(col("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(danglingNodes)
    var ranks = sv.select(col("__n"), round(col("__sv"), quantize).as("__r"))
    for (_ <- 1 to iters) {
      val contrib = ew.join(ranks, col("__s") === col("__n"))
        .groupBy(col("__t"))
        .agg(sum(col("__frac") * col("__r")).as("__m"))
      val dangling = ranks.join(danglingNodes, Seq("__n"), "left_semi")
        .agg(coalesce(sum("__r"), lit(0.0)).as("__dm"))
      ranks = sv
        .join(contrib, col("__n") === col("__t"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("__n"),
          round(lit(1.0 - damping) * col("__sv") + lit(damping) *
            (coalesce(col("__m"), lit(0.0)) + col("__dm") * col("__sv")),
            quantize).as("__r"))
        // same lineage truncation as pageRank: each round references
        // the previous twice
        .localCheckpoint()
    }
    ranks.select(col("__n").as("node"), col("__r").as("rank"))
  }
}
