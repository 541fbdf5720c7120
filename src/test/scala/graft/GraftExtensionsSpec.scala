package graft

import org.apache.spark.sql.Row

/** The SQL surface of the native expressions must agree with their
  * Column-API forms (same Expression underneath).
  */
class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("vec_dot / normal_ppf / interp1d evaluate from SQL") {
    val r = spark.sql(
      """SELECT
        | vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS dot,
        | normal_ppf(0.5d) AS med,
        | interp1d(1.5d, array(1.0d, 2.0d), array(10.0d, 20.0d)) AS it
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(r.getDouble(2) == 15.0)
    val nv = spark.sql("SELECT vec_normalize(array(3.0d, 4.0d)) AS v").head()
      .getSeq[Double](0)
    assert(nv == Seq(0.6, 0.8))
    // parity with the Column API
    assert(graft.functions.NormalPpf.ppf(0.5) == r.getDouble(1))
  }

  test("token_stats from SQL matches the Column form") {
    import spark.implicits._
    Seq("the cat sat on the mat").toDF("text").createOrReplaceTempView("t_ext")
    val sqlRow = spark.sql(
      "SELECT token_stats(text, array('the', 'on')) AS ts FROM t_ext").head()
    assert(sqlRow.getSeq[Long](0) == Seq(6L, 17L, 5L, 3L, 6L))
  }

  test("repetition_stats from SQL matches the kernel") {
    import spark.implicits._
    Seq("a b a b c").toDF("text").createOrReplaceTempView("rep_ext")
    val r = spark.sql(
      "SELECT repetition_stats(text, 2, 'c') AS rs FROM rep_ext").head()
    // 2-grams: "a b"×2, "b a", "b c" → top = 2*3 = 6 = dup chars;
    // lines on 'c': ["a b a b ", ""] → no dups, 8 line chars
    assert(r.getSeq[Long](0) == Seq(6L, 6L, 9L, 2L, 2L, 0L, 0L, 8L))
  }

  test("unicode_normalize: NFC/NFD/NFKC semantics, SQL == Column API") {
    import spark.implicits._
    val decomposed = "Cafe\u0301"      // e + combining acute
    val compat = "\uFB01le\u00A0x"     // fi ligature + NBSP
    Seq((decomposed, compat)).toDF("a", "b").createOrReplaceTempView("un_ext")
    val r = spark.sql(
      """SELECT unicode_normalize(a, 'NFC') AS nfc,
        |  unicode_normalize(nfc_a, 'NFD') AS nfd,
        |  unicode_normalize(b, 'NFKC') AS nfkc
        |FROM (SELECT a, b, unicode_normalize(a, 'NFC') AS nfc_a
        |      FROM un_ext)""".stripMargin).head()
    assert(r.getString(0) == "Caf\u00E9")  // recomposed, 4 codepoints
    assert(r.getString(1) == decomposed)   // NFD round-trips back
    assert(r.getString(2) == "file x")     // ligature folds, NBSP -> space
    // Column API parity + ASCII identity fast path
    val c = Seq(decomposed, "plain ascii").toDF("t")
      .select(graft.functions.UnicodeNormalize(
        org.apache.spark.sql.functions.col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(c.toSeq == Seq("Caf\u00E9", "plain ascii"))
    // non-literal form rejected (must be plan-literal)
    val err = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(a, a) FROM un_ext").collect()
    }
    assert(err.getMessage.contains("foldable"))
  }

  test("dhash64 / bpe_token_count / hashed_linear_score evaluate from SQL") {
    import spark.implicits._
    Seq("join the join").toDF("text").createOrReplaceTempView("r7_ext")
    val r = spark.sql(
      """SELECT
        | dhash64(encode(text, 'utf-8')) AS dh,
        | bpe_token_count(text, array('j','jo','joi'), array('o','i','n')) AS bpe,
        | bpe_encode(text, array('j','jo','joi'), array('o','i','n')) AS bpe_toks,
        | hashed_linear_score(text, array(0.5d, 0.25d), 1.0d) AS hls
        |FROM r7_ext""".stripMargin).head()
    assert(r.getLong(0) ==
      graft.functions.DHash64.compute("join the join".getBytes("UTF-8")))
    assert(r.getInt(1) == 5, "join(1) + the(3 unmerged chars) + join(1)")
    assert(r.getSeq[String](2) == Seq("join", "t", "h", "e", "join"),
      "encode mirrors the count's merge semantics")
    val w = Array(0.5, 0.25)
    assert(r.getDouble(3) ==
      graft.functions.HashedLinearScore.compute("join the join", w, 1.0))
  }

  test("winnowing_fp evaluates from SQL and matches the library operator") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    Seq((1L, text)).toDF("doc_id", "text").createOrReplaceTempView("r7_win")
    val viaSql = spark.sql(
      "SELECT s.pos, s.fp FROM r7_win " +
        "LATERAL VIEW explode(winnowing_fp(text, 12, 8)) t AS s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaOp = graft.llmdata.TextStats.winnowingFingerprints(
      Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id", k = 12, w = 8)
      .orderBy("pos")
      .collect().map(r => (r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(viaSql == viaOp && viaSql.nonEmpty)
  }

  test("top_k_by_score works as a SQL aggregate with partial merge") {
    import spark.implicits._
    (for (g <- 0 until 3; i <- 0 until 50)
      yield (g.toLong, i.toLong, ((i * 37) % 11).toDouble))
      .toDF("g", "id", "score").repartition(7)
      .createOrReplaceTempView("scores_ext")
    val rows = spark.sql(
      """SELECT g, top_k_by_score(score, id, 2) AS nn
        |FROM scores_ext GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val nn = r.getSeq[Row](1)
      assert(nn.length == 2)
      // (i*37)%11 == 10 at i ≡ 8 (mod 11): ties broken by ascending id
      assert(nn.head.getDouble(1) == 10.0 && nn.head.getLong(0) == 8L)
      assert(nn(1).getDouble(1) == 10.0 && nn(1).getLong(0) == 19L)
    }
  }

  test("unregistered-session isolation: class form injects via extensions") {
    // the class is instantiable and produces injections for config use
    val exts = new GraftExtensions()
    assert(GraftExtensions.registrations.map(_._1).toSet ==
      Set("vec_dot", "normal_ppf", "interp1d", "token_stats", "top_k_by_score",
        "freq_items", "vec_normalize", "repetition_stats",
        "dhash64", "bpe_token_count", "bpe_encode", "hashed_linear_score",
        "unicode_normalize", "winnowing_fp", "jaro_winkler"))
    assert(exts.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
