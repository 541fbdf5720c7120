package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample stages a training-data pipeline needs.
  *
  * The decode step is STUBBED (this container has no image/audio codecs)
  * with a clearly-marked deterministic fake; everything Spark-side —
  * schema, batch shape, partitioning, the mapPartitions contract — is
  * real. Swap [[decodeStub]] for a real codec (e.g. a JNI/FFI decoder or
  * a `mapInPandas` Python UDF in the PySpark surface) without touching
  * the pipeline.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("media_meta", MapType(StringType, StringType), nullable = true)))

  /** Make an opaque binary media column from any source column (here:
    * utf-8 bytes — the testdata has no real media; the binary path is
    * what matters).
    */
  def binarize(df: DataFrame, srcCol: String, modality: String): DataFrame =
    df.withColumn("content", encode(col(srcCol), "utf-8"))
      .withColumn("modality", lit(modality))
      .withColumn("media_meta", map(
        lit("codec"), lit("raw"),
        lit("origin"), lit(srcCol)))

  /** Cheap metadata that needs no decode: byte length + content hash —
    * pure expressions, scan-fused.
    */
  def withByteStats(df: DataFrame, binCol: String = "content"): DataFrame =
    df.withColumn("byte_len", length(col(binCol)))
      .withColumn("content_md5", md5(col(binCol)))

  /** >>> DECODE STUB <<< — deterministic fake standing in for a real
    * image decode: derives a (width, height, channels) header and a
    * fixed-length "pixel histogram" from the bytes. A real
    * implementation replaces ONLY this function (per-partition batch
    * decode; same row-in/row-out contract).
    */
  def decodeStub(bytes: Array[Byte], histBins: Int = 16): (Int, Int, Int, Array[Double]) = {
    if (bytes == null || bytes.isEmpty) (0, 0, 0, Array.fill(histBins)(0.0))
    else {
      val w = 1 + (math.abs(bytes(0).toInt) % 64)
      val h = 1 + (math.abs(bytes(bytes.length / 2).toInt) % 64)
      val hist = new Array[Double](histBins)
      bytes.foreach(b => hist((b & 0xff) % histBins) += 1.0)
      val n = bytes.length.toDouble
      (w, h, 3, hist.map(_ / n))
    }
  }

  /** Decode + feature-extract over partitions: the real distributed
    * shape — one decoder instance per partition, rows streamed through
    * it (no per-row re-init), output schema typed. At 100 TB this is a
    * map-only stage; partition sizing controls decoder memory.
    */
  def extractFeatures(df: DataFrame, binCol: String = "content",
      histBins: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("features", ArrayType(DoubleType))))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      // per-partition decoder init happens HERE (stub has no state)
      it.map { r =>
        val bytes = r.get(binIdx).asInstanceOf[Array[Byte]]
        val (w, h, c, hist) = decodeStub(bytes, histBins)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, hist.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** 64-bit dHash perceptual fingerprint per media row — the
    * scan-fused codegen expression [[graft.functions.DHash64]] (see its
    * doc for the grid/gradient recipe). Near-duplicate media land
    * within a small Hamming distance; exact copies collide.
    */
  def perceptualHash(df: DataFrame, binCol: String = "content",
      hashCol: String = "phash"): DataFrame =
    df.withColumn(hashCol, graft.functions.DHash64(col(binCol)))

  /** Perceptual near-duplicate pairs (id_a, id_b, hamming ≤ maxHamming)
    * over a binary media column: one scan computes the 64-bit dHash,
    * then the generic pigeonhole band join
    * ([[Dedup.hammingNearDupPairs]] — the SimHash machinery reused
    * verbatim) generates candidates without ever self-joining content.
    * maxHamming defaults to 7 so the 64 bits split into 8 exact chunks.
    */
  def nearDuplicateMedia(df: DataFrame, idCol: String,
      binCol: String = "content", maxHamming: Int = 7,
      maxBucketSize: Int = 1000): DataFrame = {
    val hashes = perceptualHash(df.select(col(idCol), col(binCol)), binCol)
      .select(col(idCol), col("phash"))
    Dedup.hammingNearDupPairs(hashes, idCol, "phash", maxHamming, bits = 64,
      maxBucketSize = maxBucketSize)
  }

  /** Multimodal sequence packing: [[TextStats.packSequences]] extended
    * to interleaved image+text documents. An image slot costs a FIXED
    * `imageTokens` budget — the vision-encoder patch count the trainer
    * will splice in per image (public VLM recipes use a constant per
    * image, e.g. a 24×24-patch encoder's 576) — so a document's pack
    * cost is `text tokens + n_images · imageTokens` and the greedy
    * first-fit runs on that combined cost. Same per-shard window
    * contract as [[TextStats.packSequences]]: each shard packs
    * independently in (shard, id) order, one running sum of window
    * state, no corpus-wide ordering — the scale posture is unchanged
    * by the extra arithmetic, which fuses into the scan.
    *
    * `nImagesCol` is the per-document image count from the media
    * manifest (join [[withByteStats]]/[[extractFeatures]] output per
    * doc upstream); a NULL count (manifest left-join miss) coalesces
    * to 0 images — the natural semantics of an absent manifest row —
    * rather than silently nulling the doc's pack cost. Output adds
    * (n_text_tokens, n_mm_tokens, pack_id); pack ids local to the
    * shard.
    *
    * Delegates to [[TextStats.packSequences]] through its
    * `tokenCounter` hook — the window/cumulative-sum/pack arithmetic
    * lives in exactly one place.
    */
  def packMultimodal(df: DataFrame, textCol: String, idCol: String,
      shardCol: String, nImagesCol: String, budget: Int,
      imageTokens: Int = 64): DataFrame = {
    require(imageTokens >= 0,
      s"imageTokens must be >= 0, got $imageTokens")
    // materialize the text token count ONCE and let the pack cost read
    // the column — tokenCount inside the window input AND again in a
    // post-window projection would run the per-doc token scan twice
    val withText = df.withColumn("n_text_tokens",
      TextStats.tokenCount(col(textCol)))
    val mmCost: Column => Column = _ =>
      col("n_text_tokens") +
        coalesce(col(nImagesCol).cast("int"), lit(0)) * lit(imageTokens)
    TextStats.packSequences(withText, textCol, idCol, shardCol, budget,
        mmCost)
      .withColumnRenamed("n_tokens", "n_mm_tokens")
  }

  /** Frame sampling for video-like content: n deterministic offsets per
    * row exploded to (media_id, frame_no, frame_bytes) — the shape of a
    * video→frames stage; the "frame" is a byte slice in the stub.
    */
  def frameSample(df: DataFrame, binCol: String = "content", n: Int = 4): DataFrame = {
    val frames = (0 until n).map { i =>
      struct(lit(i).as("frame_no"),
        substring(col(binCol), (i * 16) + 1, 16).as("frame_bytes"))
    }
    df.withColumn("frame", explode(array(frames: _*)))
      .withColumn("frame_no", col("frame.frame_no"))
      .withColumn("frame_bytes", col("frame.frame_bytes"))
      .drop("frame")
  }
}
