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
  * the shuffled form additionally salts the probe side (see
  * [[fuzzyPairs]]) because a CPU-quadratic block can be byte-tiny —
  * too small for AQE's byte-threshold skew splitting to notice.
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
    * broadcast limit). The probe side is SALTED (a salt column derived
    * from the probe id, the build side replicated across all salts, the
    * salt pair joining alongside the block key): join parallelism
    * becomes |blocks| × |salts| tasks instead of |blocks|, with the
    * total edit-distance work unchanged — essential when the block key
    * has few distinct values, because a CPU-quadratic block is tiny in
    * BYTES, so AQE's byte-threshold skew splitting never fires on it.
    * Build-side shuffle volume pays ×|salts| on 3 narrow columns; at
    * corpus scale prefer a finer block key over a larger salt.
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
    val joined = if (useBroadcast) {
      a0.repartition(nParts).join(broadcast(b0),
        col("__blk") === col("__blkb") &&
          col("id_a") < col("id_b") &&
          abs(length(col("name_a")) - length(col("name_b"))) <= maxDistance)
    } else {
      // salt: each probe row keeps ONE salt (a pure function of its
      // id); the build side replicates across all salts — every
      // (a, b) pair still meets exactly once, in the task owning
      // (block, salt(a)). The probe side is explicitly repartitioned
      // on (block, salt): that is the join's own co-partitioning when
      // it runs as a shuffle join, and it keeps the quadratic probe
      // loop spread across the cluster even when AQE re-plans the
      // (narrow, replicated) build side into a broadcast join — a
      // CPU-quadratic probe can be byte-tiny, and without this the
      // whole pair loop would run at the scan's input parallelism.
      val salts = math.max(nParts, 1)
      val a = a0.withColumn("__salt",
          pmod(xxhash64(col("id_a")), lit(salts.toLong)))
        .repartition(nParts, col("__blk"), col("__salt"))
      val b = b0.withColumn("__saltb",
        explode(sequence(lit(0L), lit(salts.toLong - 1))))
      a.join(b, col("__blk") === col("__blkb") &&
        col("__salt") === col("__saltb") &&
        col("id_a") < col("id_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDistance)
    }
    joined
      .withColumn("distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "name_a", "name_b", "distance")
  }
}
