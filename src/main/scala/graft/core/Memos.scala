package graft.core

/** Registry of the driver-side fit/result memos behind the
  * fit-once/gate-twice pattern (seeded KMeans fit, IVF quantizer,
  * oracle-family minhash pairs, Lloyd-fit trajectory).
  *
  * Contract shared by every registered memo:
  *  - keys are data-directory paths and the data under a dir is assumed
  *    IMMUTABLE for the life of the JVM session (the Verify/Bench mains
  *    read driver-generated parquet that never changes mid-run); a dir
  *    whose contents changed would be served stale results;
  *  - values are small driver-side summaries (center matrices, collected
  *    pair lists) — never DataFrames or row data at corpus scale.
  *
  * [[clearAll]] lets Bench drop every memo between repeat passes so each
  * pass re-pays the real fit cost and per-query medians stay honest.
  */
object Memos {
  private val maps =
    new java.util.concurrent.CopyOnWriteArrayList[java.util.Map[_, _]]()

  /** Register a memo map at construction; returns it for inline use. */
  def register[M <: java.util.Map[_, _]](m: M): M = { maps.add(m); m }

  def clearAll(): Unit = maps.forEach(_.clear())

  /** Memo of PERSISTED projection frames — the one sanctioned exception
    * to the "never DataFrames" rule: values must be bounded projections
    * (a few numeric columns per row, e.g. the k-means feature frame),
    * never full corpus rows. clear() unpersists before dropping entries
    * so Bench's between-pass [[clearAll]] releases executor storage
    * along with the driver references.
    */
  final class CachedFrameMap
      extends java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame] {
    override def clear(): Unit = {
      values().forEach(df => df.unpersist(blocking = false))
      super.clear()
    }
  }

  /** Shared registry for fire-and-forget persisted intermediates:
    * operators persist a bounded projection mid-plan and hand it here
    * so [[clearAll]] releases the executor storage; the key (prefix +
    * global sequence) is never looked up again. One registry instead
    * of a copy-pasted cache/AtomicLong/track triple per operator.
    */
  private lazy val trackedFrames = register(new CachedFrameMap)
  private val trackedSeq = new java.util.concurrent.atomic.AtomicLong()
  def tracked(prefix: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    trackedFrames.put(s"$prefix-${trackedSeq.incrementAndGet()}", df)
    df
  }
}
