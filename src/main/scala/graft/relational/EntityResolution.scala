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
  /** Splink-style UNION-OF-BLOCKING-RULES candidate generation — the
    * scale-safe composition a single blocking key can't give: each
    * rule is FINE (bounds its block sizes), and the union of the
    * per-rule pair sets preserves recall (a true pair survives if ANY
    * rule catches it). This is how production linkage engines square
    * the blocking dilemma: one key fine enough to bound blocks loses
    * recall; one key coarse enough to keep recall grows quadratic
    * blocks — several fine keys UNIONED keep both.
    *
    * Each rule is a Column producing a blocking key for the row —
    * scalar, or ARRAY-typed for multi-key rules (e.g. a deletion
    * neighborhood, q-gram keys); null (or null array elements) opt
    * the row out of that rule. Two rows are candidates iff some rule
    * index yields the same non-null key for both.
    *
    * Plan shape: one narrow projection exploded to (id, payload…,
    * rule#, key) — a ×Σ|keys| fan-out of a FEW columns, linear in the
    * corpus — then ONE self-equi-join on (rule#, key) and a distinct
    * on the pair. No cross product anywhere; within-block pair counts
    * are bounded by construction (that's the caller's contract when
    * picking rules: every rule fine). Keys are normalized to string
    * so heterogeneous rules coexist in one join column.
    *
    * `payload` columns ride along (as `<name>_a` / `<name>_b`) so
    * consumers don't need two more corpus joins to recover the
    * compared attributes — they're functions of the ids, so the
    * distinct stays a pure pair-dedup.
    */
  def blockingUnion(df: DataFrame, idCol: String,
      rules: Seq[Column], payload: Seq[String] = Nil): DataFrame = {
    require(rules.nonEmpty, "blockingUnion needs at least one rule")
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    // normalize every rule to array<string>, tag with its rule index
    // (rule dataTypes resolve against the frame — a bare Column's
    // expression is unresolved until analyzed)
    val ruleTypes = df.select(rules: _*).schema.map(_.dataType)
    val tagged = rules.zip(ruleTypes).zipWithIndex.map {
      case ((r, t), i) =>
        val arr =
          if (t.isInstanceOf[org.apache.spark.sql.types.ArrayType]) r
          else array(r)
        // coalesce per rule: flatten() nulls out if ANY element array
        // is null, so one null ARRAY rule would otherwise opt the row
        // out of EVERY rule instead of just its own
        coalesce(
          transform(arr, k => struct(lit(i).as("r"), k.cast("string").as("k"))),
          expr("array()").cast("array<struct<r:int,k:string>>"))
    }
    val keyed = df.select(
        (col(idCol) +: payload.map(col)) :+
          explode(flatten(array(tagged: _*))).as("__rk"): _*)
      .filter(col("__rk.k").isNotNull)
    val a = keyed.select(
      (col(idCol).as("id_a") +: payload.map(c => col(c).as(s"${c}_a"))) :+
        col("__rk").as("__rka"): _*)
    val b = keyed.select(
      (col(idCol).as("id_b") +: payload.map(c => col(c).as(s"${c}_b"))) :+
        col("__rk").as("__rkb"): _*)
    // explicit co-partitioning on the key (the fuzzyPairs convention):
    // the fan-out is CPU-shaped but byte-narrow, so AQE's byte
    // thresholds under-parallelize it if left to the defaults
    a.repartition(nParts, col("__rka"))
      .join(b, col("__rka") === col("__rkb") && col("id_a") < col("id_b"))
      .select(col("id_a") +: col("id_b") +:
        payload.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b"))): _*)
      .distinct()
  }

  /** The order-1 deletion neighborhood of `s`: the string itself plus
    * every single-character deletion — `lev(a, b) <= 1` implies the
    * two neighborhoods intersect (a substitution at p deletes to the
    * same string from both sides; an insertion/deletion means one IS
    * a deletion variant of the other). Used as an ARRAY rule for
    * [[blockingUnion]], it makes edit-distance-1 joins fully
    * recall-preserving with blocks bounded by the true-match cluster
    * size — the SymSpell blocking scheme — instead of quadratic
    * attribute blocks. |keys| = len(s)+1 per row: linear fan-out.
    */
  def deletionVariants(s: Column): Column =
    transform(sequence(lit(0), length(s)), i =>
      when(i === 0, s).otherwise(concat(
        s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))

  /** [[fuzzyPairs]] semantics (same-block pairs within `maxDistance`
    * edits) over a [[blockingUnion]] candidate set: the scale-safe
    * form when no single fine key preserves recall. The caller's
    * rules must guarantee candidate recall for the distance bound —
    * [[deletionVariants]] (optionally concatenated with a partition
    * attribute) gives that guarantee for `maxDistance = 1`.
    */
  def fuzzyPairsUnion(df: DataFrame, idCol: String, nameCol: String,
      rules: Seq[Column], maxDistance: Int): DataFrame = {
    require(maxDistance >= 1, s"maxDistance must be >= 1, got $maxDistance")
    blockingUnion(df, idCol, rules, payload = Seq(nameCol))
      .filter(abs(length(col(s"${nameCol}_a")) -
        length(col(s"${nameCol}_b"))) <= maxDistance)
      // banded threshold form — see [[fuzzyPairs]]; identical distances
      // for kept pairs, O(k·n) instead of O(n²) per candidate
      .withColumn("distance",
        levenshtein(col(s"${nameCol}_a"), col(s"${nameCol}_b"), maxDistance))
      .filter(col("distance") >= 0)
      .select(col("id_a"), col("id_b"), col(s"${nameCol}_a").as("name_a"),
        col(s"${nameCol}_b").as("name_b"), col("distance"))
  }

  /** Blocked similarity pairs scored with the native Jaro–Winkler
    * comparator (functions/JaroWinkler.scala) instead of a Levenshtein
    * bound — the Fellegi–Sunter-tradition name comparator, scored
    * inside WholeStageCodegen on [[blockingUnion]] candidates. Same
    * scale contract as [[fuzzyPairsUnion]]: the rules bound block
    * sizes, the union preserves recall, no cross product anywhere.
    * Scores are rounded to 6 before thresholding so the kept set is
    * engine-reproducible.
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, nameCol: String,
      rules: Seq[Column], minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim out of range: $minSim")
    blockingUnion(df, idCol, rules, payload = Seq(nameCol))
      .withColumn("sim", round(graft.functions.JaroWinkler(
        col(s"${nameCol}_a"), col(s"${nameCol}_b")), 6))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col(s"${nameCol}_a").as("name_a"),
        col(s"${nameCol}_b").as("name_b"), col("sim"))
  }

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
    // banded DP (r15 optimization, guide §3): the 3-arg levenshtein
    // computes only the ±maxDistance diagonal band and aborts early
    // (returns -1 past the threshold) — O(k·n) per pair instead of the
    // O(n²) full DP, with identical distances for every kept pair. The
    // pair loop is the whole cost of this operator; the probe work per
    // pair drops ~n/k-fold.
    joined
      .withColumn("distance",
        levenshtein(col("name_a"), col("name_b"), maxDistance))
      .filter(col("distance") >= 0)
      .select("id_a", "id_b", "name_a", "name_b", "distance")
  }
}
