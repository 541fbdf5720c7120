package graft.featureextraction

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cluster.SpectralClustering
import graft.compose.{ColumnTransformer, Pipeline}
import graft.core.Tables
import graft.datasets.Datasets
import graft.linear.LinearRegression
import graft.llmdata.Multimodal
import graft.preprocessing.{MinMaxScaler, StandardScaler}
import graft.streaming.OnlineLearnerSink
import graft.wrappers.LocalSGD

class M5Spec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sfDir).cache()

  test("CountVectorizer: bounded sorted vocab; counts match manual recount") {
    val m = new CountVectorizer("text", vocabSize = 10).fit(docs)
    assert(m.vocabulary.length == 10)
    assert(m.vocabulary.sorted.sameElements(m.vocabulary))
    val long = m.transformLong(docs, "doc_id")
    val total = long.agg(sum("tf")).head().getLong(0)
    val manual = docs.select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(col("t").isin(m.vocabulary.toIndexedSeq: _*)).count()
    assert(total == manual)
  }

  test("CountVectorizer minDF filters rare terms") {
    val all = new CountVectorizer("text", vocabSize = 10000, minDF = 1).fit(docs)
    val filtered = new CountVectorizer("text", vocabSize = 10000, minDF = 100).fit(docs)
    assert(filtered.vocabulary.length < all.vocabulary.length)
  }

  test("HashingVectorizer is stateless and deterministic") {
    val hv = new HashingVectorizer("text", nFeatures = 1 << 10)
    val a = hv.transform(docs).select("features").head()
    val b = hv.transform(docs).select("features").head()
    assert(a == b)
  }

  test("FeatureHasher hashes mixed columns") {
    val out = new FeatureHasher(Seq("lang", "source", "n_chars"), 1 << 8)
      .transform(docs)
    assert(out.select("features").head().get(0) != null)
  }

  test("make_blobs: balanced labels, distinguishable clusters") {
    val df = Datasets.makeBlobs(spark, 2000, nFeatures = 2, centers = 4,
      clusterStd = 0.5, seed = 7, nPartitions = 4).cache()
    val counts = df.groupBy("label").count().collect().map(_.getLong(1))
    assert(counts.length == 4 && counts.forall(_ == 500))
    // per-cluster std must be ≈ clusterStd
    val stds = df.groupBy("label").agg(stddev_pop("x0")).collect().map(_.getDouble(1))
    stds.foreach(s => assert(s ~== (0.5, 0.1)))
  }

  test("make_regression: exact linear law when noise=0") {
    val df = Datasets.makeRegression(spark, 500, nFeatures = 4,
      nInformative = 2, noise = 0.0, seed = 3, nPartitions = 4)
    val m = new LinearRegression(Seq("x0", "x1", "x2", "x3"), "y").fit(df)
    assert(m.score(df) ~== (1.0, 1e-9))
    assert(math.abs(m.coef(2)) < 1e-8 && math.abs(m.coef(3)) < 1e-8)
  }

  test("make_classification labels follow the hidden boundary") {
    val df = Datasets.makeClassification(spark, 1000, nFeatures = 3,
      flipY = 0.0, seed = 5, nPartitions = 4)
    val counts = df.groupBy("label").count().collect()
    assert(counts.length == 2)
  }

  test("ColumnTransformer applies per-column-set transforms; Pipeline chains") {
    val li = Tables.lineitem(spark, sfDir)
    val ct = new ColumnTransformer(Seq(
      "std" -> new StandardScaler(Seq("l_quantity")),
      "mm" -> new MinMaxScaler(Seq("l_extendedprice")))).fit(li)
    val out = ct.transform(li)
    val r = out.agg(avg("l_quantity"), min("l_extendedprice"), max("l_extendedprice")).head()
    assert(r.getDouble(0) ~== 0.0)
    assert(r.getDouble(1) ~== 0.0)
    assert(r.getDouble(2) ~== 1.0)
    val rt = ct.inverseTransform(out)
    val orig = li.agg(avg("l_quantity")).head().getDouble(0)
    assert(rt.agg(avg("l_quantity")).head().getDouble(0) ~== (orig, 1e-6))

    val pipe = new Pipeline(Seq(
      "s1" -> new StandardScaler(Seq("l_quantity")),
      "s2" -> new MinMaxScaler(Seq("l_quantity")))).fit(li)
    val pr = pipe.transform(li).agg(min("l_quantity"), max("l_quantity")).head()
    assert(pr.getDouble(0) ~== 0.0)
    assert(pr.getDouble(1) ~== 1.0)
  }

  test("ColumnTransformerSpec: passthrough/drop slots, remainder policies, hstack order") {
    import graft.compose.{ColumnTransformerSpec, TransformerSpec}
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_tax", "l_discount")
    val specs = Seq(
      ("std", TransformerSpec.Est(cols => new StandardScaler(cols)),
        Seq("l_quantity"): Seq[String]),
      ("keep", TransformerSpec("passthrough"), Seq("l_tax")),
      ("deny", TransformerSpec("drop"), Seq("l_discount")))
    // remainder='drop' (the reference default): only the spec sets survive
    val dropped = new ColumnTransformerSpec(specs).fit(li).transform(li)
    assert(dropped.columns.toSeq == Seq("l_quantity", "l_tax"),
      s"got ${dropped.columns.toSeq}")
    // remainder='passthrough': spec sets first, then remainder in frame order
    val m = new ColumnTransformerSpec(specs,
      remainder = TransformerSpec("passthrough")).fit(li)
    val out = m.transform(li)
    assert(out.columns.toSeq ==
      Seq("l_quantity", "l_tax", "l_orderkey", "l_linenumber"))
    assert(out.agg(avg("l_quantity")).head().getDouble(0) ~== 0.0,
      "estimator slot must actually transform")
    assert(out.agg(max("l_tax")).head().getDouble(0) ==
      li.agg(max("l_tax")).head().getDouble(0), "passthrough slot untouched")
    // remainder as an ESTIMATOR fits over the non-specified columns
    val rem = new ColumnTransformerSpec(
      specs.take(1),
      remainder = TransformerSpec.Est(cols =>
        new MinMaxScaler(cols.filter(_ == "l_tax")))).fit(li)
    val ro = rem.transform(li)
    assert(ro.columns.toSeq ==
      Seq("l_quantity", "l_orderkey", "l_linenumber", "l_tax", "l_discount"),
      s"got ${ro.columns.toSeq}")
    val rr = ro.agg(min("l_tax"), max("l_tax")).head()
    assert((rr.getDouble(0) ~== 0.0) && (rr.getDouble(1) ~== 1.0),
      "remainder estimator must transform its columns")
    // string forms + guards
    intercept[IllegalArgumentException] { TransformerSpec("bogus") }
    intercept[IllegalArgumentException] {
      new ColumnTransformerSpec(Seq(
        ("a", TransformerSpec("passthrough"), Seq("l_tax")),
        ("b", TransformerSpec("drop"), Seq("l_tax"))))
    }
    intercept[NoSuchElementException] { m("keep") }
  }

  test("trainTestSplit shuffle knob: order-preserving by default, permuting when true") {
    import graft.modelselection.Splits
    val orders = Tables.orders(spark, sfDir).select("o_orderkey").limit(500)
    val (tr0, te0) = Splits.trainTestSplit(orders, testSize = 0.25, seed = 7)
    val (tr1, te1) = Splits.trainTestSplit(orders, testSize = 0.25, seed = 7,
      shuffle = false)
    // shuffle=false is the default: identical membership, and rows come
    // out in input (key) order because randomSplit preserves order
    assert(tr0.collect().map(_.getLong(0)).toSeq ==
      tr1.collect().map(_.getLong(0)).toSeq)
    // both splits remain a partition of the input under shuffle=true
    val (tr2, te2) = Splits.trainTestSplit(orders, testSize = 0.25, seed = 7,
      shuffle = true, blockwise = false, convertMixedTypes = true)
    assert(tr2.count() + te2.count() == 500)
    val all = tr2.select("o_orderkey").union(te2.select("o_orderkey"))
      .distinct().count()
    assert(all == 500, "shuffle=true must still partition the input")
  }

  test("SpectralClustering separates non-convex-ish blobs") {
    val df = Datasets.makeBlobs(spark, 600, nFeatures = 2, centers = 3,
      clusterStd = 0.4, seed = 11, nPartitions = 4).cache()
    val m = new SpectralClustering(Seq("x0", "x1"), nClusters = 3,
      nComponents = 40, gamma = 0.5, seed = 1).fit(df)
    val out = m.transform(df)
    // purity: each predicted cluster dominated by one true label
    val purity = out.groupBy("prediction", "label").count().collect()
      .groupBy(_.getInt(0)).map { case (_, rows) =>
        rows.map(_.getLong(2)).max.toDouble / rows.map(_.getLong(2)).sum
      }
    assert(purity.forall(_ > 0.9), s"purity=$purity")
  }

  test("Spectral landmarks are a uniform content-hash sample: independent of row order, all blobs covered") {
    import spark.implicits._
    // Three well-separated blobs, corpus SORTED by blob — the mirror of
    // the IVF sample spec. A sample().limit(n)-based landmark pick (the
    // r5 `weak` finding) would take landmarks from blob 0 only; the
    // hash-ranked sample must give identical landmarks under any row
    // order/partitioning and cover every blob.
    val rnd = new scala.util.Random(7)
    val centers = Seq((30.0, 0.0), (0.0, 30.0), (15.0, 26.0))
    val rows = for (c <- 0 until 3; i <- 0 until 800) yield {
      val (cx, cy) = centers(c)
      (c * 800L + i, cx + rnd.nextGaussian() * 0.5, cy + rnd.nextGaussian() * 0.5)
    }
    val sorted = rows.toDF("id", "x0", "x1")
    def fitLm(df: org.apache.spark.sql.DataFrame) =
      new SpectralClustering(Seq("x0", "x1"), nClusters = 3,
        nComponents = 30, gamma = 0.5, seed = 1).fit(df).landmarks
    val a = fitLm(sorted)
    val b = fitLm(sorted.orderBy(org.apache.spark.sql.functions.desc("id"))
      .repartition(13))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "landmarks must not depend on row order/partitioning")
    centers.zipWithIndex.foreach { case ((cx, cy), c) =>
      val minD = a.map(lm => math.hypot(lm(0) - cx, lm(1) - cy)).min
      assert(minD <= 3.0, s"blob $c has no nearby landmark (min dist $minD)")
    }
  }

  test("Multimodal: byte stats, decode stub shape, frame sampling") {
    val media = Multimodal.binarize(docs, "text", "image")
    val stats = Multimodal.withByteStats(media)
    assert(stats.filter(col("byte_len") =!= col("n_chars")).count() == 0) // ascii
    val feats = Multimodal.extractFeatures(media, histBins = 16)
    val r = feats.select("width", "height", "channels", "features").head()
    assert(r.getInt(0) > 0 && r.getInt(2) == 3)
    assert(r.getSeq[Double](3).length == 16)
    assert(r.getSeq[Double](3).sum ~== (1.0, 1e-9)) // normalized histogram
    val frames = Multimodal.frameSample(media, n = 4)
    assert(frames.count() == docs.count() * 4)
  }

  test("OnlineLearnerSink learns from micro-batches (batch-driven)") {
    import spark.implicits._
    val sink = new OnlineLearnerSink(new LocalSGD("squared", 0.05), Seq("x"), "y")
    val rnd = new scala.util.Random(2)
    // simulate 5 micro-batches
    (0 until 5).foreach { b =>
      val batch = (1 to 200).map { _ =>
        val x = rnd.nextDouble() * 2; (x, 3 * x + 1)
      }.toDF("x", "y")
      sink.processBatch(batch, b)
    }
    val m = sink.model
    assert(m.predict(Array(1.0)) ~== (4.0, 0.3))
    assert(sink.state.seen == 1000)
  }

  test("makeCounts: deterministic, nonnegative Poisson-ish counts") {
    val a = Datasets.makeCounts(spark, 2000, nFeatures = 3, seed = 5, nPartitions = 4)
    val b = Datasets.makeCounts(spark, 2000, nFeatures = 3, seed = 5, nPartitions = 4)
    import org.apache.spark.sql.functions._
    val sa = a.agg(sum("y"), min("y"), avg("y")).head()
    val sb = b.agg(sum("y"), min("y"), avg("y")).head()
    assert(sa == sb) // same seed + partitioning => identical
    assert(sa.getLong(1) >= 0)
    // E[y] = E[exp(Xw)] >= 1 for centered gaussians; mean should be ~O(1)
    assert(sa.getDouble(2) > 0.3 && sa.getDouble(2) < 5.0)
    val c = Datasets.makeCounts(spark, 2000, nFeatures = 3, seed = 6, nPartitions = 4)
    assert(c.agg(sum("y")).head().getLong(0) != sa.getLong(0))
  }

  test("generators are bit-deterministic across partitionings (md5 draw streams)") {
    import org.apache.spark.sql.functions._
    // draws are pure functions of (seed, row id): changing nPartitions
    // must not change a single value — the property that makes the
    // generator gates hash-exact and the output stable under scale-out
    def sig(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(md5(concat_ws("|", df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*)))
        .collect().map(_.getString(0)).sorted.toSeq
    assert(sig(Datasets.makeCounts(spark, 1000, 3, seed = 5, nPartitions = 2)) ==
      sig(Datasets.makeCounts(spark, 1000, 3, seed = 5, nPartitions = 7)))
    assert(sig(Datasets.makeClassificationDf(spark, 1000, 2, seed = 9, nPartitions = 3)) ==
      sig(Datasets.makeClassificationDf(spark, 1000, 2, seed = 9, nPartitions = 8)))
    assert(sig(Datasets.makeBlobs(spark, 1000, 2, centers = 3, seed = 1, nPartitions = 2)) ==
      sig(Datasets.makeBlobs(spark, 1000, 2, centers = 3, seed = 1, nPartitions = 5)))
    assert(sig(Datasets.makeRegression(spark, 1000, 3, noise = 0.5, seed = 2, nPartitions = 2)) ==
      sig(Datasets.makeRegression(spark, 1000, 3, noise = 0.5, seed = 2, nPartitions = 9)))
  }

  test("makeClassificationDf: date column within range, deterministic") {
    import org.apache.spark.sql.functions._
    val df = Datasets.makeClassificationDf(spark, 1000, nFeatures = 2, seed = 9,
      startDate = "2022-03-01", endDate = "2022-06-30", nPartitions = 4)
    val r = df.agg(min("date"), max("date"), countDistinct("date")).head()
    assert(r.getDate(0).toString >= "2022-03-01")
    assert(r.getDate(1).toString <= "2022-06-30")
    assert(r.getLong(2) > 50) // dates actually spread over the range
    val again = Datasets.makeClassificationDf(spark, 1000, nFeatures = 2, seed = 9,
      startDate = "2022-03-01", endDate = "2022-06-30", nPartitions = 4)
    assert(again.agg(min("date"), max("date"), countDistinct("date")).head() == r)
  }

  test("CountVectorizer dense transform counts via broadcast map") {
    import spark.implicits._
    val d = Seq((1L, "a b a c"), (2L, "b b d")).toDF("id", "text")
    val m = new CountVectorizer("text", vocabSize = 10).fit(d)
    val vocab = m.vocabulary.toSeq
    val tf = m.transform(d).orderBy("id").select("tf").collect()
      .map(_.getSeq[Int](0))
    // row 1: a->2, b->1, c->1, d->0 in vocab order
    val idx = vocab.zipWithIndex.toMap
    assert(tf(0)(idx("a")) == 2 && tf(0)(idx("b")) == 1 && tf(0)(idx("d")) == 0)
    assert(tf(1)(idx("b")) == 2 && tf(1)(idx("d")) == 1 && tf(1)(idx("a")) == 0)
  }

  // Pin the JVM-side murmur3 bucket replication the generated hashing
  // oracles embed as literal tables: if either drifts from the real
  // MLlib transform, the exact gates would go red — fail here first.
  test("hashingTfBuckets match actual HashingTF transform buckets") {
    import spark.implicits._
    val words = TextFeatureQueries.hashVocab
    val d = words.map(w => Tuple1(w)).toDF("text")
    val out = new HashingVectorizer("text", nFeatures = 1 << 12).transform(d)
      .select("text", "features").collect()
    out.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector]("features").toSparse
      assert(v.indices.toSeq == Seq(TextFeatureQueries.hashingTfBuckets(r.getString(0))))
    }
  }

  test("fhBucket replicates MLlib FeatureHasher bucketing (cat + numeric)") {
    import spark.implicits._
    val d = TextFeatureQueries.catVocab.zipWithIndex
      .map { case (v, i) => (v, (i + 1) / 10.0) }.toDF("cat", "num")
    val out = new FeatureHasher(Seq("cat", "num"), nFeatures = 1 << 12)
      .transform(d).collect()
    val numB = TextFeatureQueries.fhBucket("num")
    out.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector]("features").toSparse
      val catB = TextFeatureQueries.fhBucket(s"cat=${r.getString(0)}")
      val got = v.indices.zip(v.values).toMap
      assert(got(catB) == 1.0, s"cat=${r.getString(0)}")
      assert(got(numB) == r.getDouble(1))
      assert(got.size == 2)
    }
  }
}
