package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions._

/** SQL surface for graft's native Catalyst expressions, via the
  * standard `SparkSessionExtensions` extension point:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions   // config-time
  *   GraftExtensions.register(spark)              // or on a live session
  *
  *   SELECT vec_dot(a.embedding, b.embedding)            -- double
  *   SELECT normal_ppf(0.975)                            -- double
  *   SELECT interp1d(x, array(0.0, 1.0), array(0.0, 10.0))
  *   SELECT token_stats(text, array('the','a'))          -- array<bigint>
  *   SELECT top_k_by_score(cos, id, 3) ... GROUP BY q    -- array<struct>
  * }}}
  *
  * Array/scalar configuration arguments (knots, stopwords, k) must be
  * FOLDABLE — they parameterize the expression itself, exactly like the
  * Column-API constructors they mirror.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  /** Register all functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      ExpressionBridge.registerFunction(spark, name, info, builder)
    }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def foldedDoubles(fn: String, e: Expression): Array[Double] = {
    require(e.foldable && e.dataType.isInstanceOf[ArrayType],
      s"$fn: expected a foldable double array argument")
    val arr = e.eval().asInstanceOf[ArrayData]
    val et = e.dataType.asInstanceOf[ArrayType].elementType
    require(et == DoubleType, s"$fn: array elements must be double, got $et")
    arr.toDoubleArray()
  }

  private def foldedStrings(fn: String, e: Expression): Seq[String] = {
    require(e.foldable && e.dataType.isInstanceOf[ArrayType],
      s"$fn: expected a foldable string array argument")
    val arr = e.eval().asInstanceOf[ArrayData]
    val et = e.dataType.asInstanceOf[ArrayType].elementType
    require(et == StringType, s"$fn: array elements must be string, got $et")
    arr.toObjectArray(StringType)
      .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
  }

  private def foldedString(fn: String, e: Expression): String = {
    require(e.foldable && e.dataType == StringType,
      s"$fn: expected a foldable string argument")
    e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
  }

  private def foldedInt(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      require(other.foldable, s"$fn: expected a literal int argument")
      other.eval().asInstanceOf[Number].intValue()
  }

  private def foldedDouble(fn: String, e: Expression): Double = {
    require(e.foldable, s"$fn: expected a literal double argument")
    e.eval().asInstanceOf[Number].doubleValue()
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      args => { arity("vec_dot", args, 2); VecDot(args(0), args(1)) }),
    ("normal_ppf",
      info("normal_ppf", "normal_ppf(p) - inverse standard normal CDF"),
      args => { arity("normal_ppf", args, 1); NormalPpf(args(0)) }),
    ("vec_normalize",
      info("vec_normalize", "vec_normalize(v) - L2-normalize a float/double array"),
      args => { arity("vec_normalize", args, 1); VecNormalize(args(0)) }),
    ("interp1d",
      info("interp1d",
        "interp1d(x, xs, ys) - np.interp against literal knot arrays"),
      args => {
        arity("interp1d", args, 3)
        Interp1D(args(0), foldedDoubles("interp1d", args(1)),
          foldedDoubles("interp1d", args(2)))
      }),
    ("token_stats",
      info("token_stats",
        "token_stats(text, stopwords) - [n_tokens, total_len, n_distinct, n_stop, n_bpe]"),
      args => {
        arity("token_stats", args, 2)
        TokenStats(args(0), foldedStrings("token_stats", args(1)))
      }),
    ("top_k_by_score",
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - aggregate: top-k (id, score) pairs, score desc"),
      args => {
        arity("top_k_by_score", args, 3)
        TopKByScore(args(0), args(1), foldedInt("top_k_by_score", args(2)))
      }),
    ("repetition_stats",
      info("repetition_stats",
        "repetition_stats(text, n, line_sep) - [top_ngram_score, dup_ngram_chars, " +
          "total_chars, n_lines, n_distinct_lines, dup_line_count, dup_line_chars, " +
          "total_line_chars]"),
      args => {
        arity("repetition_stats", args, 3)
        RepetitionStats(args(0), foldedInt("repetition_stats", args(1)),
          foldedString("repetition_stats", args(2)))
      }),
    ("winnowing_fp",
      info("winnowing_fp",
        "winnowing_fp(text, k, w) - array<struct<pos,fp>>: winnowed " +
          "k-gram fingerprints (SIGMOD'03), rightmost-tie rolling min"),
      args => {
        arity("winnowing_fp", args, 3)
        WinnowingFp(args(0), foldedInt("winnowing_fp", args(1)),
          foldedInt("winnowing_fp", args(2)))
      }),
    ("freq_items",
      info("freq_items",
        "freq_items(item, k) - aggregate: Misra-Gries heavy hitters, count-desc"),
      args => {
        arity("freq_items", args, 2)
        FreqItems(args(0), foldedInt("freq_items", args(1)))
      }),
    ("unicode_normalize",
      info("unicode_normalize",
        "unicode_normalize(text, form) - UAX #15 normalization; form is a " +
          "literal NFC/NFD/NFKC/NFKD"),
      args => {
        arity("unicode_normalize", args, 2)
        UnicodeNormalize(args(0), foldedString("unicode_normalize", args(1)))
      }),
    ("dhash64",
      info("dhash64",
        "dhash64(content) - 64-bit perceptual difference-hash of a binary column"),
      args => { arity("dhash64", args, 1); DHash64(args(0)) }),
    ("bpe_token_count",
      info("bpe_token_count",
        "bpe_token_count(text, merge_lefts, merge_rights) - learned-BPE subword " +
          "count; the two literal string arrays are the rank-ordered merge table"),
      args => {
        arity("bpe_token_count", args, 3)
        val l = foldedStrings("bpe_token_count", args(1))
        val r = foldedStrings("bpe_token_count", args(2))
        require(l.length == r.length,
          s"bpe_token_count: merge arrays differ in length (${l.length} vs ${r.length})")
        BpeTokenCount(args(0), l.zip(r))
      }),
    ("bpe_encode",
      info("bpe_encode",
        "bpe_encode(text, merge_lefts, merge_rights) - learned-BPE subword " +
          "token array; same merge semantics as bpe_token_count"),
      args => {
        arity("bpe_encode", args, 3)
        val l = foldedStrings("bpe_encode", args(1))
        val r = foldedStrings("bpe_encode", args(2))
        require(l.length == r.length,
          s"bpe_encode: merge arrays differ in length (${l.length} vs ${r.length})")
        BpeEncode(args(0), l.zip(r))
      }),
    ("jaro_winkler",
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity over UTF-8 bytes " +
          "(prefix boost 0.1 above 0.7, DuckDB-compatible)"),
      args => { arity("jaro_winkler", args, 2); JaroWinkler(args(0), args(1)) }),
    ("hashed_linear_score",
      info("hashed_linear_score",
        "hashed_linear_score(text, weights, intercept) - hashed bag-of-words " +
          "linear margin: intercept + sum of w[md5_bucket(token) % len(weights)]"),
      args => {
        arity("hashed_linear_score", args, 3)
        HashedLinearScore(args(0),
          foldedDoubles("hashed_linear_score", args(1)).toIndexedSeq,
          foldedDouble("hashed_linear_score", args(2)))
      })
  )
}
