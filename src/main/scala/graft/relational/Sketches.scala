package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/** Mergeable cardinality / frequency sketches — the 100 TB profiling
  * primitives (Flajolet et al. AofA'07 HyperLogLog; Cormode &
  * Muthukrishnan J.Alg'05 Count-Min). At cluster scale a COUNT(DISTINCT)
  * or a per-key frequency table over a join column is itself a shuffle of
  * the full key stream; both sketches here reduce the corpus to a tiny
  * mergeable frame with ONE map-side-combinable aggregate:
  *
  *  - HLL: `registers` is a groupBy(register).max(rank) — partial max
  *    merges on the map side, the reduce moves ≤ 2^p rows total, and two
  *    sketches (shards, days, snapshots) merge by unioning register
  *    frames and taking max again. No key stream ever crosses the wire.
  *  - CMS: `cmsSketch` is a groupBy((row, bucket)).count over a
  *    depth-way explode — partial sums combine map-side, the sketch is
  *    ≤ depth·width rows, and sketches merge by adding counts.
  *
  * Everything derives from the house h60 content hash (core/Hashing),
  * so every register index, rank, and bucket is reproducible in DuckDB
  * integer arithmetic — the gates are hash-exact, not tolerance checks.
  * Rank extraction stays in integer/string space (`bin`/`lpad`/`instr`,
  * identical semantics in both engines) and the register power sum is
  * computed as Σ 2^(maxRank − rank) — an exact BIGINT (≤ 2^61 at p=9) —
  * so no float accumulation order can fork the estimate.
  */
object Sketches {

  /** 60-bit house hash split: high p bits select the register, the
    * remaining (60−p) bits feed the rank (leading-zero count + 1).
    */
  def hllRegisters(df: DataFrame, key: Column, salt: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val lowBits = 60 - p
    val maxRank = lowBits + 1
    val h = Hashing.h60(key, salt)
    val low = h.bitwiseAND(lit((1L << lowBits) - 1))
    val rank = when(low === 0L, lit(maxRank))
      .otherwise(instr(lpad(bin(low), lowBits, "0"), "1"))
    df.select(shiftright(h, lowBits).as("register"),
        rank.cast("int").as("rank"))
      .groupBy("register").agg(max("rank").as("rank"))
  }

  /** Sketch union: max per register. Associative/commutative/idempotent —
    * the distributed-merge contract. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("register").agg(max("rank").as("rank"))

  /** Grouped sketches — one register frame PER group value (per day,
    * per tenant, per shard): still ONE map-side-combinable groupBy, the
    * realistic production form of the sketch. ≤ |groups|·2^p rows. */
  def hllGroupedRegisters(df: DataFrame, group: Column, key: Column,
      salt: String, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val lowBits = 60 - p
    val maxRank = lowBits + 1
    val h = Hashing.h60(key, salt)
    val low = h.bitwiseAND(lit((1L << lowBits) - 1))
    val rank = when(low === 0L, lit(maxRank))
      .otherwise(instr(lpad(bin(low), lowBits, "0"), "1"))
    df.select(group.as("g"), shiftright(h, lowBits).as("register"),
        rank.cast("int").as("rank"))
      .groupBy("g", "register").agg(max("rank").as("rank"))
  }

  /** Per-group HLL estimates off a grouped register frame — the same
    * integer-exact power sum and small-range correction as
    * [[hllEstimate]], one output row per group. */
  def hllGroupedEstimate(registers: DataFrame, p: Int = 9): DataFrame = {
    val m = 1L << p
    val maxRank = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers.groupBy("g")
      .agg(count(lit(1)).as("__nz"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - rank)"))
          .as("__psum"))
      .select(col("g"), (lit(m) - col("__nz")).as("zero_registers"),
        (col("__psum") + (lit(m) - col("__nz")) * shiftleft(lit(1L), maxRank))
          .as("__isum"))
      .select(col("g"), col("zero_registers"),
        round(lit(alpha) * lit(m.toDouble) * lit(m.toDouble)
          * pow(lit(2.0), lit(maxRank)) / col("__isum"), 6).as("raw_estimate"))
      .select(col("g"), col("zero_registers"), col("raw_estimate"),
        round(when(col("raw_estimate") <= lit(2.5 * m)
            && col("zero_registers") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zero_registers")))
          .otherwise(col("raw_estimate")), 6).as("estimate"))
  }

  /** The HLL estimate off a register frame: integer-exact power sum,
    * then the Flajolet bias-corrected estimator with the small-range
    * linear-counting fallback. Returns one row
    * (m, zero_registers, raw_estimate, estimate). */
  def hllEstimate(registers: DataFrame, p: Int = 9): DataFrame = {
    val m = 1L << p
    val maxRank = 60 - p + 1
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    registers
      .agg(count(lit(1)).as("__nz"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - rank)"))
          .as("__psum"))
      .select(lit(m).as("m"), (lit(m) - col("__nz")).as("zero_registers"),
        // Σ 2^-rank = (psum + zeros·2^maxRank) / 2^maxRank, kept integer
        (col("__psum") + (lit(m) - col("__nz")) * shiftleft(lit(1L), maxRank))
          .as("__isum"))
      .select(col("m"), col("zero_registers"),
        round(lit(alpha) * lit(m.toDouble) * lit(m.toDouble)
          * pow(lit(2.0), lit(maxRank)) / col("__isum"), 6).as("raw_estimate"))
      .select(col("m"), col("zero_registers"), col("raw_estimate"),
        round(when(col("raw_estimate") <= lit(2.5 * m)
            && col("zero_registers") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zero_registers")))
          .otherwise(col("raw_estimate")), 6).as("estimate"))
  }

  /** Count-Min sketch: depth independent h60 hash rows × width buckets.
    * ONE pass — the depth-way explode is map-side; the rollup frame is
    * ≤ depth·width rows regardless of corpus size. */
  def cmsSketch(df: DataFrame, key: Column, salt: String,
      depth: Int = 4, width: Long = 4096): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth out of range: $depth")
    val rows = (0 until depth).map(i => Hashing.bucket(key, s"$salt$i", width))
    df.select(posexplode(array(rows: _*)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Sketch union: counts add per cell (missing cell = 0). */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Mergeable relative-error quantile sketch (Masson, Rim & Lee,
    * "DDSketch: a fast and fully-mergeable quantile sketch with
    * relative-error guarantees", VLDB'19) — the grouped approximate
    * quantile whose state merges, completing the sketch family
    * (MG / HLL / CMS / GK). Chosen over KLL (Karnin–Lang–Liberty
    * FOCS'16) deliberately: KLL's randomized compaction makes the
    * sketch a function of partition/merge ORDER, so shard-merge ≡
    * whole-sketch only holds in distribution and no engine-independent
    * oracle can replay it; DDSketch's log-spaced buckets make the
    * sketch a pure FUNCTION OF THE MULTISET — bit-identical under any
    * partitioning, any merge tree, and in DuckDB integer/log
    * arithmetic — with the α-relative-error guarantee a telemetry
    * pipeline actually quotes (it is the production quantile sketch at
    * Datadog for exactly this mergeability reason).
    *
    * Bucket index for v > 0: ceil(ln(v)/ln(γ)) with γ = (1+α)/(1−α);
    * the log ratio is QUANTIZED (round 6) before ceil so a 1-ulp libm
    * divergence between engines cannot flip a boundary bucket. State
    * is ≤ ⌈ln(max/min)/ln(γ)⌉ buckets per group (~920 for α=0.01 over
    * 8 decades) from ONE map-side-combinable groupBy; sketches merge
    * by adding counts. The value at quantile p is read at rank
    * ⌊p·(n−1)⌋+1 and estimated by the bucket midpoint 2γ^b/(γ+1),
    * which is within α of the true order statistic by construction.
    *
    * Contract: values must be strictly positive (prices, latencies,
    * sizes); callers with zero/negative domains shift or split first
    * (the paper's zero-bucket/negative-mirror extensions).
    */
  def ddGamma(alpha: Double): Double = (1.0 + alpha) / (1.0 - alpha)

  /** One grouped pass → (g, bucket, cnt); ≤ |groups|·|buckets| rows. */
  def quantileSketch(df: DataFrame, group: Column, value: Column,
      alpha: Double = 0.01): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha out of range: $alpha")
    val lg = math.log(ddGamma(alpha))
    df.select(group.as("g"),
        ceil(round(log(value) / lg, 6)).cast("long").as("bucket"))
      .groupBy("g", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Sketch union: counts add per (group, bucket). Associative and
    * commutative — the distributed-merge contract (and, unlike KLL,
    * the merged FRAME is bit-identical to the whole-corpus sketch). */
  def quantileSketchMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g", "bucket").agg(sum("cnt").as("cnt"))

  /** Quantile read-out: per (group, p) the first bucket whose
    * cumulative count reaches rank ⌊p·(n−1)⌋+1, estimated at the
    * bucket midpoint. The cumulative window runs over the TINY sketch
    * frame (≤ |buckets| rows per group), never the corpus. */
  def quantileSketchEstimate(sketch: DataFrame, ps: Seq[Double],
      alpha: Double = 0.01): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val g = ddGamma(alpha)
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = sketch.withColumn("__cum", sum("cnt").over(w))
    // aliased grouping key: cum and tot share the sketch lineage, and
    // a same-id equi-join trips the resolver when the sketch is a
    // named (memory/stream) table
    val tot = sketch.groupBy(col("g").as("__gt")).agg(sum("cnt").as("__n"))
    cum.join(tot, col("g") === col("__gt")).drop("__gt")
      .crossJoin(broadcast(ps.toDF("p")))
      .filter(col("__cum") >=
        floor(col("p") * (col("__n") - 1)).cast("long") + 1)
      .groupBy(col("g"), col("p"))
      .agg(min("bucket").as("__b"))
      .select(col("g"), col("p"),
        round(lit(2.0) * pow(lit(g), col("__b")) / lit(g + 1.0), 6)
          .as("estimate"))
  }

  /** KMV / theta distinct sketch (Bar-Yossef et al. RANDOM'02 k-minimum
    * values; Beyer et al. SIGMOD'07 unbiased estimator; the set-operation
    * algebra is the Apache DataSketches theta-sketch design) — the
    * distinct sketch that, unlike HLL, supports INTERSECTION and
    * DIFFERENCE estimates: each sketch carries an actual uniform SAMPLE
    * of the distinct keys (the k smallest h60 hashes), so any set
    * expression evaluates over the samples below the common threshold
    * θ = min(θ_A, θ_B) and scales by 2^60/θ.
    *
    * State is ≤ k rows per group from ONE map-side-combinable aggregate
    * ([[graft.functions.BottomKDistinct]] — partials are ≤ k values per
    * partition before the shuffle); sketches merge by re-taking the
    * bottom-k of the union, and the merged frame is bit-identical to
    * the whole-corpus sketch (a pure function of the distinct key set —
    * the DDSketch mergeability argument), which is what lets the DuckDB
    * oracle replay every row. Estimates are IEEE double arithmetic on
    * integer-derived values, rounded at the output boundary only.
    */
  def kmvSketch(df: DataFrame, group: Column, key: Column, salt: String,
      k: Int = 128): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    df.select(group.as("g"), Hashing.h60(key, salt).as("__h"))
      .groupBy("g")
      .agg(graft.functions.BottomKDistinct(col("__h"), k).as("__kmins"))
      .select(col("g"), posexplode(col("__kmins")).as(Seq("__p", "h")))
      .select(col("g"), (col("__p") + 1).as("pos"), col("h"))
  }

  /** Sketch union: bottom-k of the merged row sets, per group.
    * Associative/commutative/idempotent — and frame-exact: merge of any
    * shard split ≡ the whole-corpus sketch. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 128): DataFrame =
    a.unionByName(b)
      .groupBy("g")
      .agg(graft.functions.BottomKDistinct(col("h"), k).as("__kmins"))
      .select(col("g"), posexplode(col("__kmins")).as(Seq("__p", "h")))
      .select(col("g"), (col("__p") + 1).as("pos"), col("h"))

  /** Per-group distinct estimate off a sketch frame: exact count when
    * the group holds fewer than k distinct keys (the sketch IS the key
    * set), else the unbiased (k−1)·2^60/h₍k₎ read-out. One aggregate
    * over the ≤ |groups|·k sketch frame. */
  def kmvEstimate(sketch: DataFrame, k: Int = 128): DataFrame =
    sketch.groupBy("g")
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("pos") === k, col("h"))).as("__hk"))
      .select(col("g"), col("n_seen"),
        round(when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble) * pow(lit(2.0), lit(60))
            / col("__hk").cast("double")), 6).as("estimate"))

  /** Set-operation estimates between two groups of one sketch frame
    * (the theta-sketch algebra): with θ_X = 2^60 when group X holds
    * fewer than k keys else its k-th smallest hash, every estimate
    * evaluates the sample sets below θ = min(θ_A, θ_B) and scales by
    * 2^60/θ. Returns ONE row: sampled cell counts, union / intersection
    * / difference estimates and the sampled-Jaccard. A full outer join
    * of two ≤ k-row frames — driver-free, broadcast-sized. */
  def kmvSetOps(sketch: DataFrame, groupA: Any, groupB: Any,
      k: Int = 128): DataFrame = {
    val two60 = math.pow(2.0, 60)
    val a = sketch.filter(col("g") === lit(groupA))
      .select(col("h").as("ha"), col("pos").as("pa"))
    val b = sketch.filter(col("g") === lit(groupB))
      .select(col("h").as("hb"), col("pos").as("pb"))
    val thetaA = a.agg(
      when(count(lit(1)) < k, lit(1L << 60))
        .otherwise(max(when(col("pa") === k, col("ha")))).as("theta_a"))
    val thetaB = b.agg(
      when(count(lit(1)) < k, lit(1L << 60))
        .otherwise(max(when(col("pb") === k, col("hb")))).as("theta_b"))
    val cells = a.join(b, col("ha") === col("hb"), "full_outer")
      .crossJoin(broadcast(thetaA)).crossJoin(broadcast(thetaB))
      .select(coalesce(col("ha"), col("hb")).as("h"),
        col("ha").isNotNull.as("in_a"), col("hb").isNotNull.as("in_b"),
        least(col("theta_a"), col("theta_b")).as("theta"))
      .filter(col("h") < col("theta"))
      .agg(max(col("theta")).as("theta"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("in_a") && !col("in_b"), 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!col("in_a") && col("in_b"), 1L).otherwise(0L)).as("n_only_b"))
    val scale = lit(two60) / col("theta").cast("double")
    cells.select(
      col("n_both"), col("n_only_a"), col("n_only_b"),
      round((col("n_both") + col("n_only_a") + col("n_only_b")) * scale, 6)
        .as("union_est"),
      round(col("n_both") * scale, 6).as("intersection_est"),
      round((col("n_only_a")) * scale, 6).as("difference_a_est"),
      round(col("n_both").cast("double")
        / (col("n_both") + col("n_only_a") + col("n_only_b")), 6)
        .as("jaccard_est"))
  }

  /** Point-query the sketch for each probe key: min over the depth rows
    * of the cell counts (the one-sided CMS estimate — never below the
    * true count). The sketch side is tiny, so the probe join broadcasts.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, key: Column,
      salt: String, depth: Int = 4, width: Long = 4096): DataFrame = {
    val rows = (0 until depth).map(i => Hashing.bucket(key, s"$salt$i", width))
    probes
      .select(key.as("key"), posexplode(array(rows: _*)).as(Seq("row", "bucket")))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }
}
