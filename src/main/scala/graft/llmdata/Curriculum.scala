package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection and curriculum phase assignment — the
  * step between scoring (quality classifier / LM perplexity) and
  * training: "take the best documents until the token budget is
  * full", and the two-phase pretrain→anneal data schedule built on it
  * (bulk phase on the whole selection, final phase on the
  * highest-quality slice — the public Llama-3/MiniCPM-style recipe of
  * annealing on upsampled high-quality data at the end of training).
  *
  * Semantics (the oracle contract): rank documents by
  * (round(score, 6) DESC, id ASC) — the repo's cross-engine ordering
  * convention — and select the maximal prefix whose running token sum
  * stays ≤ budget: exactly `sum(tokens) OVER (ORDER BY s DESC, id) ≤
  * B` in SQL.
  *
  * Plan shape — the naive form of that contract is a GLOBAL ordered
  * window (one task sorts the corpus: a scale-killer), so selection
  * runs in two stages that never globally sort row-level data:
  *
  *  1. aggregate per ROUNDED score: ≤ |distinct round-6 scores| rows
  *     (bounded by score range · 10⁶, independent of corpus size); a
  *     window over that aggregate frame finds the boundary score s* —
  *     the first group, descending, whose running sum exceeds the
  *     budget — and the budget r remaining for it. One driver collect
  *     of ≤ 1 row.
  *  2. rows with s > s* pass by a scan-fused FILTER (map-only, no
  *     shuffle, parquet-pushable); only the boundary group — documents
  *     sharing one exact rounded score, vanishingly small for any
  *     continuous score — pays an ordered prefix window.
  *
  * A degenerate score (e.g. constant) concentrates the corpus into
  * one boundary group and stage 2 degrades to the global window —
  * score degeneracy is a caller bug, not a plan property.
  */
object Curriculum {

  /** The stage-1 cut: boundary rounded-score and its remaining token
    * budget, or None when the whole corpus fits the budget.
    */
  private def budgetCut(base: DataFrame, budget: Long): Option[(Double, Long)] = {
    // prefix sum over the per-score AGGREGATE frame — corpus-sized for
    // near-unique scores, so it runs as a range-partitioned two-pass
    // prefix sum (guide §2, r15; long addend, regrouping exact)
    val boundary = graft.core.Prefix.cumSums(
        base.groupBy(col("__s")).agg(sum(col("__t")).as("__gt")),
        Seq(col("__s").desc), Seq((col("__gt"), "__gcum", true)))
      .filter(col("__gcum") > budget)
      .orderBy(col("__s").desc)
      .limit(1)
      .select(col("__s"),
        (lit(budget) - (col("__gcum") - col("__gt"))).as("__r"))
      .collect()
    boundary.headOption.map(r => (r.getDouble(0), r.getLong(1)))
  }

  private def withScoreTokens(df: DataFrame, idCol: String, score: Column,
      tokens: Column): DataFrame =
    df.withColumn("__s", round(score, 6))
      .withColumn("__t", tokens.cast("long"))

  /** Select the best-scoring documents until `budget` tokens are
    * reached (see object doc for the exact prefix contract and the
    * two-stage plan). Output: (id, score_r, n_units), the selected
    * rows only.
    */
  def budgetSelect(df: DataFrame, idCol: String, score: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = withScoreTokens(df, idCol, score, tokens)
    val out = budgetCut(base, budget) match {
      case None => base // everything fits
      case Some((sStar, r)) =>
        val full = base.filter(col("__s") > sStar)
        // ordered prefix WITHIN the one boundary score group only
        val wb = Window.orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundarySel = base.filter(col("__s") === sStar)
          .withColumn("__w", sum(col("__t")).over(wb))
          .filter(col("__w") <= r)
          .drop("__w")
        full.unionByName(boundarySel)
    }
    out.select(col(idCol), col("__s").as("score_r"), col("__t").as("n_units"))
  }

  /** Two-phase curriculum labels over an already-selected corpus:
    * 'anneal' for the same budget-prefix [[budgetSelect]] would pick
    * with `annealBudget`, 'main' for the rest — ONE output frame with
    * every input row labeled, so the caller splits the training stream
    * without a join back. Same two-stage plan; the non-boundary path
    * is a scan-fused CASE, not a filter.
    */
  def annealPhases(df: DataFrame, idCol: String, score: Column,
      tokens: Column, annealBudget: Long): DataFrame = {
    require(annealBudget >= 0, s"annealBudget must be >= 0, got $annealBudget")
    val base = withScoreTokens(df, idCol, score, tokens)
    val out = budgetCut(base, annealBudget) match {
      case None => base.withColumn("phase", lit("anneal"))
      case Some((sStar, r)) =>
        val rest = base.filter(col("__s") =!= sStar)
          .withColumn("phase",
            when(col("__s") > sStar, "anneal").otherwise("main"))
        val wb = Window.orderBy(col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundary = base.filter(col("__s") === sStar)
          .withColumn("__w", sum(col("__t")).over(wb))
          .withColumn("phase",
            when(col("__w") <= r, "anneal").otherwise("main"))
          .drop("__w")
        rest.unionByName(boundary)
    }
    out.select(col(idCol), col("__s").as("score_r"),
      col("__t").as("n_units"), col("phase"))
  }
}
