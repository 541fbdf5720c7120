package graft.preprocessing

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class PreprocessingSpec extends SparkSpec {

  lazy val li = Tables.lineitem(spark, sfDir).cache()

  test("StandardScaler: transformed column has mean 0, std 1; roundtrip id") {
    val m = new StandardScaler(Seq("l_quantity")).fit(li)
    val t = m.transform(li)
    val row = t.agg(avg("l_quantity"), stddev_pop("l_quantity")).head()
    assert(row.getDouble(0) ~== 0.0)
    assert(row.getDouble(1) ~== 1.0)
    // roundtrip on a frame carrying the original alongside ((l_orderkey,
    // l_linenumber) is NOT unique in this data, so no join-on-key checks)
    val withOrig = li.withColumn("orig", col("l_quantity"))
    val rt = m.inverseTransform(m.transform(withOrig))
    val diff = rt.agg(max(abs(col("l_quantity") - col("orig")))).head().getDouble(0)
    assert(diff < 1e-9)
  }

  test("StandardScaler: zero-variance column scales by 1") {
    val df = li.withColumn("const", lit(5.0))
    val m = new StandardScaler(Seq("const")).fit(df)
    assert(m.scales(0) == 1.0)
    val v = m.transform(df).agg(max(abs(col("const")))).head().getDouble(0)
    assert(v ~== 0.0)
  }

  test("MinMaxScaler: range [0,1] attained") {
    val m = new MinMaxScaler(Seq("l_extendedprice")).fit(li)
    val row = m.transform(li).agg(min("l_extendedprice"), max("l_extendedprice")).head()
    assert(row.getDouble(0) ~== 0.0)
    assert(row.getDouble(1) ~== 1.0)
  }

  test("RobustScaler exact: median maps to 0") {
    val m = new RobustScaler(Seq("l_quantity"), exact = true).fit(li)
    // median of 1..50-ish integers; transformed median must be 0
    val medAfter = m.transform(li)
      .agg(percentile(col("l_quantity"), lit(0.5))).head().getDouble(0)
    assert(medAfter ~== 0.0)
  }

  test("SimpleImputer mean fills nulls with the mean of non-nulls") {
    val df = li.withColumn("t", when(col("l_tax") === 0, lit(null)).otherwise(col("l_tax")))
      .withColumn("orig", when(col("l_tax") === 0, lit(null)).otherwise(col("l_tax")))
    val mean = df.agg(avg("t")).head().getDouble(0)
    val out = new SimpleImputer(Seq("t"), "mean").fit(df).transform(df)
    assert(out.filter(col("t").isNull).count() == 0)
    val filled = out.filter(col("orig").isNull).select("t").distinct().collect()
    assert(filled.length == 1 && (filled(0).getDouble(0) ~== mean))
  }

  test("SimpleImputer most_frequent uses deterministic mode") {
    val df = li.withColumn("f",
      when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag")))
    val m = new SimpleImputer(Seq("f"), "most_frequent").fit(df)
    assert(Set("A", "R").contains(m.statistics("f").asInstanceOf[String]))
  }

  test("LabelEncoder: codes are 0..K-1 over sorted classes; inverse roundtrips") {
    val m = new LabelEncoder("l_returnflag", "code").fit(li)
    assert(m.classes.toSeq == Seq("A", "N", "R"))
    val t = m.transform(li)
    val pairs = t.select("l_returnflag", "code").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(pairs == Map("A" -> 0, "N" -> 1, "R" -> 2))
    val rt = m.inverseTransform(t.drop("l_returnflag").withColumnRenamed("code", "code"))
    assert(rt.filter(col("l_returnflag").isNull).count() == 0)
  }

  test("LabelEncoder: unseen label raises when errorOnUnseen") {
    val m = new LabelEncoder("l_returnflag", "code").fit(li)
    val bad = li.withColumn("l_returnflag", lit("Z"))
    intercept[Exception] { m.transform(bad).collect() }
  }

  test("DummyEncoder roundtrip") {
    val m = new DummyEncoder(Seq("l_returnflag")).fit(li)
    val wide = m.transform(li.withColumn("orig", col("l_returnflag")))
    assert(wide.columns.count(_.startsWith("l_returnflag_")) == 3)
    val back = m.inverseTransform(wide)
    assert(back.filter(col("l_returnflag") =!= col("orig")).count() == 0)
  }

  test("DummyEncoder dropFirst roundtrip (all-zero row = first category)") {
    val m = new DummyEncoder(Seq("l_returnflag"), dropFirst = true).fit(li)
    val wide = m.transform(li.withColumn("orig", col("l_returnflag")))
    assert(wide.columns.count(_.startsWith("l_returnflag_")) == 2)
    val back = m.inverseTransform(wide)
    assert(back.filter(col("l_returnflag") =!= col("orig")).count() == 0)
  }

  test("OneHotEncoder array output sums to 1 per row; inverse roundtrips") {
    val m = new OneHotEncoder("l_returnflag", "oh").fit(li)
    val t = m.transform(li)
    val sums = t.select(aggregate(col("oh"), lit(0.0), (a, x) => a + x).as("s"))
      .distinct().collect().map(_.getDouble(0))
    assert(sums.toSeq == Seq(1.0))
    val back = m.inverseTransform(t.withColumnRenamed("l_returnflag", "orig"))
    assert(back.filter(col("l_returnflag") =!= col("orig")).count() == 0)
  }

  test("PolynomialFeatures degree-2 combinations") {
    val m = new PolynomialFeatures(Seq("a", "b"), degree = 2).fit(li.limit(1))
    assert(m.combinations.map(m.featureName) ==
      Seq("a", "b", "a^2", "a*b", "b^2"))
    val mi = new PolynomialFeatures(Seq("a", "b"), degree = 2,
      interactionOnly = true).fit(li.limit(1))
    assert(mi.combinations.map(mi.featureName) == Seq("a", "b", "a*b"))
  }

  test("QuantileTransformer uniform output in [0,1], monotone") {
    val m = new QuantileTransformer(Seq("l_extendedprice"), nQuantiles = 100).fit(li)
    val t = m.transform(li)
    val row = t.agg(min("l_extendedprice"), max("l_extendedprice")).head()
    assert(row.getDouble(0) >= 0.0 && row.getDouble(1) <= 1.0)
  }

  test("QuantileTransformer normal PPF sanity") {
    assert(QuantileTransformerModel.normalPpf(0.5) ~== 0.0)
    assert(QuantileTransformerModel.normalPpf(0.975) ~== (1.959964, 1e-5))
    // pinned reference quantiles (scipy.stats.norm.ppf, |err| < 1.15e-9)
    assert(QuantileTransformerModel.normalPpf(0.025) ~== (-1.9599639845400545, 1e-8))
    assert(QuantileTransformerModel.normalPpf(0.001) ~== (-3.090232306167813, 1e-8))
    assert(QuantileTransformerModel.normalPpf(0.84134474) ~== (1.0, 1e-6))
    // symmetric; boundary clip keeps tails finite
    assert(QuantileTransformerModel.normalPpf(0.3) ~== (-QuantileTransformerModel.normalPpf(0.7), 1e-12))
    assert(!QuantileTransformerModel.normalPpf(0.0).isInfinite)
    assert(!QuantileTransformerModel.normalPpf(1.0).isInfinite)
    // the codegen'd Column path agrees with the local kernel
    import spark.implicits._
    val out = Seq(0.1, 0.5, 0.9).toDF("p")
      .select(graft.functions.NormalPpf(org.apache.spark.sql.functions.col("p")))
      .collect().map(_.getDouble(0))
    assert(out(0) ~== (QuantileTransformerModel.normalPpf(0.1), 1e-15))
    assert(out(2) ~== (QuantileTransformerModel.normalPpf(0.9), 1e-15))
  }

  test("Categorizer records categories and attaches metadata") {
    val m = new Categorizer().fit(li)
    assert(m.categories("l_returnflag").toSeq == Seq("A", "N", "R"))
    val t = m.transform(li)
    assert(t.schema("l_returnflag").metadata.getStringArray("categories").toSeq ==
      Seq("A", "N", "R"))
  }

  test("VarianceThreshold: drops constant and low-variance columns; transform projects") {
    import spark.implicits._
    val df = Seq((1.0, 5.0, 0.0), (2.0, 5.0, 0.1), (9.0, 5.0, 0.2))
      .toDF("a", "const", "tiny")
    val m = new VarianceThreshold(Seq("a", "const", "tiny")).fit(df)
    assert(m.kept == Seq("a", "tiny"), "threshold 0 keeps nonconstant only")
    assert(m.transform(df).columns.toSeq == Seq("a", "tiny"))
    val m2 = new VarianceThreshold(Seq("a", "const", "tiny"), threshold = 0.01).fit(df)
    assert(m2.kept == Seq("a"), "tiny variance (~0.0067) under 0.01 is dropped")
    intercept[IllegalArgumentException] {
      new VarianceThreshold(Seq("const"), threshold = 1.0).fit(df)
    }
  }

  test("TargetEncoder: out-of-fold means match a driver-side recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 60
    val df = (0 until n).map(i => (i.toLong, if (i % 3 == 0) "x" else "y", i.toDouble))
      .toDF("id", "cat", "t")
    val m = 5.0; val k = 4
    val enc = TargetEncoder.encode(df, "cat", "t", "id", nFolds = k,
      smoothing = m, salt = "s").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("cat_te"), r.getAs[Double]("cat_freq")))).toMap
    // recompute folds with the identical md5 expression, then the oof
    // arithmetic in plain Scala
    val folds = df.select(col("id"),
        pmod(conv(substring(md5(concat(lit("s"), col("id").cast("string"))), 1, 15),
          16, 10).cast("long"), lit(k.toLong)).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val rows = (0 until n).map(i => (i.toLong, if (i % 3 == 0) "x" else "y",
      i.toDouble, folds(i.toLong)))
    val prior = rows.map(_._3).sum / n
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((id, cat, _, f) <- rows) {
      val inCat = rows.filter(_._2 == cat)
      val oof = inCat.filter(_._4 != f)
      val expTe = (oof.map(_._3).sum + m * prior) / (oof.size + m)
      assert(enc(id)._1 ~== (r6(expTe), 1e-6), s"te mismatch for id=$id")
      assert(enc(id)._2 ~== (r6(inCat.size.toDouble / n), 1e-6))
    }
  }

  test("TargetEncoder: a category confined to one fold falls back to the prior") {
    import spark.implicits._
    // 'solo' appears only at ids whose fold we don't control — force the
    // confinement by using a single row for the category
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0), (4L, "solo", 99.0))
      .toDF("id", "cat", "t")
    val prior = (10.0 + 20 + 30 + 99) / 4
    val enc = TargetEncoder.encode(df, "cat", "t", "id", nFolds = 2,
      smoothing = 7.0, salt = "z")
    val solo = enc.filter(org.apache.spark.sql.functions.col("id") === 4L)
      .select("cat_te").head().getDouble(0)
    // oof slice empty → (0 + m·prior)/(0 + m) = prior
    assert(solo ~== (BigDecimal(prior).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-6))
    // smoothing = 0: the 0/0 case coalesces to the prior instead of null
    val enc0 = TargetEncoder.encode(df, "cat", "t", "id", nFolds = 2,
      smoothing = 0.0, salt = "z")
    val solo0 = enc0.filter(org.apache.spark.sql.functions.col("id") === 4L)
      .select("cat_te").head()
    assert(!solo0.isNullAt(0), "empty oof with m=0 must not be null")
    assert(solo0.getDouble(0) ~== (BigDecimal(prior).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-6))
  }
}
