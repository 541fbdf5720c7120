package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join (entity resolution / record linkage): find
  * near-identical string pairs without the O(n²) cross product.
  *
  * The classic blocking scheme: candidate pairs are generated ONLY
  * within a block (equi-join on the blocking key — a plain shuffle
  * hash join that scales linearly in block count), then the expensive
  * edit-distance predicate runs on the candidates. At 100 TB the
  * blocking key choice bounds the quadratic term to per-block sizes;
  * skewed blocks are AQE-splittable because the join is a standard
  * equi-join, never a cartesian.
  */
object EntityResolution {

  /** Pairs (id_a < id_b) within the same block whose `nameCol` values
    * are within `maxDistance` Levenshtein edits. Output:
    * (id_a, id_b, name_a, name_b, distance).
    *
    * The quadratic probe dominates everything else, so the plan is
    * tuned around it: (1) in the broadcast form the build side
    * broadcasts (3 narrow columns) and the probe side is
    * round-robin-spread to the session's shuffle parallelism — the
    * probe work is embarrassingly parallel and a narrow-row shuffle is
    * ~free next to the per-pair edit-distance loop, which would
    * otherwise run on however few partitions the scan produced;
    * (2) the cheap prunes (id order, length gap — an edit-distance
    * lower bound) sit BEFORE the levenshtein conjunct in the join
    * condition, so the O(|a|·|b|) DP runs only on pairs that survive
    * them.
    *
    * `broadcastBuild = Some(false)` is the LARGE-table form: both
    * sides shuffle on the block key as a plain equi-join — no
    * driver-side broadcast materialization (which hard-caps at Spark's
    * broadcast limit), and skewed blocks become AQE-splittable.
    *
    * The default (`None`) AUTO-selects: it broadcasts only when
    * Catalyst's size estimate for the (id, name, block) projection
    * fits under the session's `spark.sql.autoBroadcastJoinThreshold`
    * (and that threshold is enabled). A corpus-sized input therefore
    * never routes through the driver — the 100 TB default is the
    * shuffled equi-join, the broadcast form an automatic small-input
    * optimization, the same contract Spark's own join planning gives.
    */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKey: Column, maxDistance: Int,
      broadcastBuild: Option[Boolean] = None): DataFrame = {
    require(maxDistance >= 1, s"maxDistance must be >= 1, got $maxDistance")
    val conf = df.sparkSession.sessionState.conf
    val nParts = conf.numShufflePartitions
    val a0 = df.select(col(idCol).as("id_a"), col(nameCol).as("name_a"),
      blockKey.as("__blk"))
    val b0 = df.select(col(idCol).as("id_b"), col(nameCol).as("name_b"),
      blockKey.as("__blkb"))
    val useBroadcast = broadcastBuild.getOrElse {
      val threshold = conf.autoBroadcastJoinThreshold
      threshold > 0 &&
        b0.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
    }
    val a = if (useBroadcast) a0.repartition(nParts) else a0
    val b = if (useBroadcast) broadcast(b0) else b0
    a.join(b, col("__blk") === col("__blkb") &&
        col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDistance)
      .withColumn("distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "name_a", "name_b", "distance")
  }
}
