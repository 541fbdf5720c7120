package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus shard writer — the LAST mile of the pipeline: materialize a
  * cleaned/packed corpus as directory-partitioned parquet shards a
  * trainer (or the next pipeline stage) consumes, and prove what was
  * written.
  *
  * Layout choices are the 100 TB ones: `repartition(shardCol)` gives
  * each shard to one task so a shard's files are written by one
  * writer (no thousand-file-per-shard fragmentation across tasks);
  * `maxRecordsPerFile` bounds individual files so a hot shard splits
  * into trainer-friendly sizes instead of one giant file (for
  * pathological shard skew, pre-salt the shard column —
  * relational/SkewJoin conventions apply). The manifest is computed
  * by RE-READING the written files, not from the input plan — it
  * audits the sink, so a dropped, duplicated, or truncated file flips
  * exactly its shard's checksum (the [[graft.llmdata.Contrastive]]
  * manifest convention: order-independent bit_xor of 60-bit id
  * hashes).
  */
object Sinks {

  /** One aggregate pass over a (written or about-to-be-written) frame:
    * per shard — row count, size sum, order-independent content
    * checksum. Same h60 convention as Contrastive.shardManifest, so
    * input-side and readback-side manifests are directly comparable.
    */
  def writtenManifest(df: DataFrame, shardCol: String, idCol: String,
      sizeCol: String, salt: String = "sink"): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("total_size"),
        expr(s"bit_xor(cast(conv(substring(md5(concat('$salt', " +
          s"cast($idCol as string))), 1, 15), 16, 10) as bigint))")
          .as("checksum"))

  /** Write `df` as parquet shards under `outDir/<shardCol>=…/` and
    * return the readback manifest. Overwrites idempotently (re-runs
    * converge to the same layout).
    */
  def writeShards(df: DataFrame, outDir: String, shardCol: String,
      idCol: String, sizeCol: String,
      maxRecordsPerFile: Int = 1 << 20): DataFrame = {
    require(maxRecordsPerFile > 0,
      s"maxRecordsPerFile must be positive, got $maxRecordsPerFile")
    df.repartition(col(shardCol))
      .write.mode("overwrite")
      // force STATIC overwrite even if the session default is dynamic:
      // dynamic mode would leave a shard the new input no longer has
      // on disk, and the readback manifest would report it as written
      .option("partitionOverwriteMode", "static")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy(shardCol)
      .parquet(outDir)
    // read back with the INPUT frame's schema: partition-column type
    // inference would otherwise read numeric-looking shard values as
    // integers (and a cast back cannot restore zero-padded strings —
    // '07' becomes 7 becomes '7'), silently forking the readback
    // manifest keys from writtenManifest(df, ...)
    val readback = df.sparkSession.read.schema(df.schema).parquet(outDir)
    writtenManifest(readback, shardCol, idCol, sizeCol)
  }

  /** INCREMENTAL RECOMPUTATION driver — the 100 TB operations move: a
    * pipeline re-run never reprocesses the whole corpus; it diffs the
    * previous run's shard manifest against the current input's and
    * touches only the shards whose content changed. Manifests are
    * ≤|shards| rows, so the diff is a tiny full-outer join; the
    * order-independent bit_xor checksum makes "changed" exact (any
    * added/removed/modified id flips it) without comparing rows.
    *
    * Output per shard: status ∈ {added, removed, changed, unchanged},
    * n_prev, n_cur. Rows needing recomputation = the current table
    * semi-joined to the added/changed shards (directory-prunable when
    * the shard is the partition column, e.g. the writeShards layout).
    */
  def shardDelta(prev: DataFrame, cur: DataFrame,
      shardCol: String): DataFrame =
    prev.select(col(shardCol), col("n_docs").as("n_prev"),
        col("checksum").as("__ck_prev"))
      .join(cur.select(col(shardCol), col("n_docs").as("n_cur"),
        col("checksum").as("__ck_cur")), Seq(shardCol), "full_outer")
      .select(col(shardCol),
        when(col("__ck_prev").isNull, lit("added"))
          .when(col("__ck_cur").isNull, lit("removed"))
          .when(col("__ck_prev") === col("__ck_cur") &&
            col("n_prev") === col("n_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))

  /** Splice a re-run: keep the previous RESULT rows for unchanged
    * shards, take the fresh rows for added/changed shards, drop
    * removed shards — the whole update costs two broadcast semi-joins
    * against the ≤|shards|-row delta, never a corpus re-shuffle.
    */
  def spliceByDelta(prevResult: DataFrame, freshResult: DataFrame,
      delta: DataFrame, shardCol: String): DataFrame = {
    val keep = broadcast(
      delta.filter(col("status") === "unchanged").select(col(shardCol)))
    val redo = broadcast(
      delta.filter(col("status").isin("added", "changed"))
        .select(col(shardCol)))
    prevResult.join(keep, Seq(shardCol), "left_semi")
      .unionByName(freshResult.join(redo, Seq(shardCol), "left_semi"))
  }
}
