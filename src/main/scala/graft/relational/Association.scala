package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (Agrawal & Srikant VLDB'94's
  * 2-itemset level, the market-basket support/confidence/lift readout):
  * which items co-occur in baskets beyond chance.
  *
  * Scale shape: item supports are ONE distinct+groupBy; pair supports
  * come from the within-basket self-join, whose volume is Σ|basket|²/2
  * — bounded by the basket-size distribution, never the item-catalog
  * square (the apriori candidate explosion is exactly what stopping at
  * pairs avoids). The support floor prunes BEFORE the metric
  * arithmetic. All counts integral; lift/confidence are fixed-order
  * scalar math on them, rounded 6 before the ranking.
  */
object Association {

  /** Top-k item pairs by lift among pairs with support ≥ minSupport.
    * @return (id_a, id_b, support_pair, support_a, support_b,
    *   confidence_ab, confidence_ba, lift) ranked
    *   (lift DESC, id_a, id_b), id_a < id_b. */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, k: Int): DataFrame = {
    require(minSupport >= 1 && k >= 1)
    val baskets = df.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = baskets.agg(countDistinct("bk").as("nb"))
    val itemSup = baskets.groupBy(col("it")).agg(count(lit(1)).as("sup"))
    val pairSup = baskets.alias("a").join(baskets.alias("b"),
        col("a.bk") === col("b.bk") && col("a.it") < col("b.it"))
      .groupBy(col("a.it").as("id_a"), col("b.it").as("id_b"))
      .agg(count(lit(1)).as("support_pair"))
      .where(col("support_pair") >= minSupport)
    pairSup
      .join(itemSup.select(col("it").as("id_a"), col("sup").as("support_a")),
        Seq("id_a"))
      .join(itemSup.select(col("it").as("id_b"), col("sup").as("support_b")),
        Seq("id_b"))
      .join(broadcast(nBaskets))
      .select(col("id_a"), col("id_b"), col("support_pair"),
        col("support_a"), col("support_b"),
        round(col("support_pair") / col("support_a"), 6)
          .as("confidence_ab"),
        round(col("support_pair") / col("support_b"), 6)
          .as("confidence_ba"),
        // multiply in DOUBLE: support_pair·nb are BIGINTs that wrap
        // silently past 2^63 at 100 TB basket counts (~6e11 rows)
        round(col("support_pair").cast("double") * col("nb")
          / (col("support_a").cast("double") * col("support_b")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("id_a"), col("id_b")).limit(k)
  }
}
