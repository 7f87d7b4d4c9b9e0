package graft.similarity

import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

class LateInteractionSpec extends SparkTestBase {

  test("maxSim computes sum-of-per-token-maxima on a hand corpus") {
    import spark.implicits._
    // Query 1 has two tokens: t0 = x-axis, t1 = y-axis.
    // Doc 10 has tokens {x-axis, y-axis}: both query tokens find a
    // perfect match -> score 2e6. Doc 20 has {x-axis, -y-axis}: t0
    // matches (1e6), t1's best is max(cos=0 vs x, cos=-1 vs -y) = 0 ->
    // score 1e6. Doc 30 has one diagonal token: each query token scores
    // cos 45° = sqrt(0.5) -> 2*round(707107).
    val x = Seq(1f, 0f); val y = Seq(0f, 1f); val ny = Seq(0f, -1f)
    val diag = Seq(math.sqrt(0.5).toFloat, math.sqrt(0.5).toFloat)
    val qv = Seq((1L, 0L, x), (1L, 1L, y))
      .toDF("query_id", "token_idx", "embedding").repartition(2)
    val dv = Seq((10L, 0L, x), (10L, 1L, y), (20L, 0L, x), (20L, 1L, ny),
        (30L, 0L, diag))
      .toDF("doc_id", "token_idx", "embedding").repartition(2)
    val got = LateInteraction.maxSimTopK(qv, dv, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, 10L, 2000000L), (2, 30L, 1414214L),
      (3, 20L, 1000000L)))
  }

  test("maxSimRerank over the full candidate set equals maxSimTopK") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val qv = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") % 5).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val dv = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
    val full = LateInteraction.maxSimTopK(qv, dv, k = 3).collect().toSet
    val allCand = qv.select("query_id").distinct()
      .crossJoin(dv.select("doc_id").distinct())
    val rer = LateInteraction.maxSimRerank(allCand, qv, dv, k = 3)
      .collect().toSet
    assert(rer == full)
    assert(full.size == 15) // 5 queries x top-3
  }

  test("poolSum: exact quantized sums on a hand bag; width mismatch is loud") {
    import spark.implicits._
    val vecs = Seq((1L, 0L, Seq(0.5f, -0.25f)), (1L, 1L, Seq(1.0f, 0.125f)))
      .toDF("doc_id", "token_idx", "embedding").repartition(2)
    val got = LateInteraction.poolSum(vecs, "doc_id", dims = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    assert(got.toSeq == Seq((1L, 2L, Seq(1500000L, -125000L))))
    val bad = Seq((2L, 0L, Seq(0.5f))).toDF("doc_id", "token_idx", "embedding")
      .repartition(2)
    intercept[Exception] {
      LateInteraction.poolSum(bad, "doc_id", dims = 2).collect()
    }
    // null ELEMENTS raise too — size() counts them and sum() would skip
    // them, silently shorting the pooled component
    val withNull = Seq((3L, 0L, Seq[java.lang.Float](0.5f, null)))
      .toDF("doc_id", "token_idx", "embedding").repartition(2)
    intercept[Exception] {
      LateInteraction.poolSum(withNull, "doc_id", dims = 2).collect()
    }
  }

  test("poolSum native aggregate == the explode twin bit-for-bit on gate " +
      "token bags, and its plan carries NO posexplode below the " +
      "aggregate (one buffer per (id, task) through the shuffle — the " +
      "SCALE.md-named exchange upgrade)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val bags = emb.select((col("vec_id") % 100).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
      .repartition(7) // odd partitioning: parity must hold regardless
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
        .toSet
    val native = LateInteraction.poolSum(bags, "doc_id", dims = 64)
    assert(norm(native) ==
      norm(LateInteraction.poolSumExplode(bags, "doc_id", dims = 64)))
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"poolSum plan must not explode token rows:\n$plan")
    assert(plan.contains("pool_sum"),
      s"poolSum plan must run the native aggregate:\n$plan")
    // partial + final: the map side folds BEFORE the exchange
    assert(plan.contains("partial_pool_sum") ||
      plan.contains("partial pool_sum") ||
      "ObjectHashAggregate.*pool_sum".r.findFirstIn(plan).isDefined,
      s"pool_sum must partial-aggregate map-side:\n$plan")
  }

  test("pool_sum is SQL-registered with the same semantics") {
    import spark.implicits._
    // getOrCreate may reuse a session built without spark.sql.extensions —
    // install the descriptor explicitly (the GraftExtensionsSpec pattern)
    val (ident, _, builder) = graft.GraftExtensions.poolSumDescriptor
    org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(
      spark, ident.funcName, builder)
    val vecs = Seq((1L, Seq(0.5f, -0.25f)), (1L, Seq(1.0f, 0.125f)))
      .toDF("doc_id", "embedding")
    vecs.createOrReplaceTempView("pool_sum_in")
    val got = spark.sql(
      """SELECT doc_id, p.n_tokens, p.pool FROM (
        |  SELECT doc_id, pool_sum(embedding, 2) AS p
        |  FROM pool_sum_in GROUP BY doc_id)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
    assert(got.toSeq == Seq((1L, 2L, Seq(1500000L, -125000L))))
  }

  test("funnel coarse stage is length-normalized: a short perfect doc " +
      "beats a long mediocre one into the shortlist") {
    import spark.implicits._
    val x = Seq(1f, 0f)
    val near = Seq(0.95f, 0.3122499f) // ~unit, cos~0.95 vs x
    // doc 1: ONE token, perfectly aligned. doc 2: ten mediocre tokens —
    // its SUM-pooled dot is ~9.5e11 vs doc 1's 1e12... times n: under
    // raw sum-dot doc2 wins 9.5x; under mean normalization doc 1 wins.
    val dv = (Seq((1L, 0L, x)) ++
      (0 until 10).map(i => (2L, i.toLong, near)))
      .toDF("doc_id", "token_idx", "embedding").repartition(2)
    val qv = Seq((7L, 0L, x)).toDF("query_id", "token_idx", "embedding")
      .repartition(2)
    val got = LateInteraction.maxSimFunnel(qv, dv, k = 1, dims = 2,
      shortlist = 1).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L),
      "sum-pooled length bias leaked into the shortlist")
  }

  test("pooled-corpus persistence: round-trip parity through savePooled/" +
      "loadPooled; width and schema drift reject loudly") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val dv = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
    val qv = emb.filter(col("vec_id") < 6)
      .select((col("vec_id") % 3).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val pooled = LateInteraction.poolSum(dv, "doc_id", dims = 64)
    val root = java.nio.file.Files.createTempDirectory("pooled_rt").toString
    TrainedState.savePooled(pooled, s"$root/ok", dims = 64)
    assert(TrainedState.loadPooledParams(spark, s"$root/ok") == 64)
    val viaDisk = LateInteraction.maxSimFunnelWith(qv, dv,
      TrainedState.loadPooled(spark, s"$root/ok"), k = 3, dims = 64,
      shortlist = 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val direct = LateInteraction.maxSimFunnel(qv, dv, k = 3, dims = 64,
      shortlist = 10).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaDisk == direct)

    // WIDTH DRIFT rejects at WRITE: rows pooled at 64 dims saved under a
    // recorded dims=32 would serve silently-null coarse dots — the save
    // itself must fail
    val we = intercept[Exception] {
      TrainedState.savePooled(pooled, s"$root/drift", dims = 32)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(we).exists(c => c.getMessage != null &&
      c.getMessage.contains("savePooled")), s"wrong error: $we")

    // SCHEMA DRIFT rejects at LOAD: a mis-pointed path fails at the
    // driver, not mid-job
    emb.limit(1).write.parquet(s"$root/notpooled")
    val le = intercept[IllegalArgumentException] {
      TrainedState.loadPooled(spark, s"$root/notpooled")
    }
    assert(le.getMessage.contains("not a pooled-corpus artifact"))
  }

  test("funnel coarse key raises LOUDLY past the 2^53 exactness bound " +
      "instead of silently losing integer exactness") {
    import spark.implicits._
    val x = Seq(1f, 0f)
    val qv = Seq((1L, 0L, x)).toDF("query_id", "token_idx", "embedding")
    val dv = Seq((10L, 0L, x)).toDF("doc_id", "token_idx", "embedding")
    // a pre-pooled corpus row whose component magnitude pushes
    // dims*max|q|*max|c| past 2^53: q_pool = [1e6, 0], dims = 2, so any
    // |c| > 2^53/(2e6) ≈ 4.5e9 trips the bound — 2^52 does comfortably
    val huge = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(10L, 1L, Array(1L << 52, 0L))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, n_tokens BIGINT, pool ARRAY<BIGINT>"))
    val e = intercept[Exception] {
      LateInteraction.maxSimFunnelWith(qv, dv, huge, k = 1, dims = 2,
        shortlist = 1).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("exceeds 2^53")),
      s"expected the 2^53 bound error, got: $e")
    // and a same-shape pooled corpus INSIDE the bound flows through
    val ok = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(10L, 1L, Array(1000000L, 0L))),
      org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, n_tokens BIGINT, pool ARRAY<BIGINT>"))
    val got = LateInteraction.maxSimFunnelWith(qv, dv, ok, k = 1, dims = 2,
      shortlist = 1).collect()
    assert(got.length == 1 && got.head.getLong(2) == 10L)
  }

  test("maxSimFunnel with a full-width shortlist equals maxSimTopK") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val qv = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") % 5).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val dv = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
    val full = LateInteraction.maxSimTopK(qv, dv, k = 3).collect().toSet
    val funnel = LateInteraction.maxSimFunnel(qv, dv, k = 3, dims = 64,
      shortlist = 50).collect().toSet
    assert(funnel == full)
  }

  test("maxSimFunnelAnn at saturating nprobe/shortlist == maxSimTopK " +
      "(ANN coarse membership saturates; MaxSim rescoring makes the " +
      "coarse order irrelevant)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    // query ids offset +1000: the no-collision contract
    val qv = emb.filter(col("vec_id") < 10)
      .select((lit(1000L) + col("vec_id") % 5).as("query_id"),
        col("vec_id").as("token_idx"), col("embedding"))
    val dv = emb.select((col("vec_id") % 50).as("doc_id"),
      col("vec_id").as("token_idx"), col("embedding"))
    val means = LateInteraction.meanVectors(
      LateInteraction.poolSum(dv, "doc_id", dims = 64))
    val cents = means.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val index = Similarity.ivfAssign(means, cents)
    val full = LateInteraction.maxSimTopK(qv, dv, k = 3).collect().toSet
    val ann = LateInteraction.maxSimFunnelAnn(qv, dv, index, cents,
      k = 3, dims = 64, shortlist = 50, nprobe = 5).collect().toSet
    assert(ann == full)
  }

  test("meanVectors: exact mean of the quantized pool as floats; " +
      "cosine of a doc's mean against an identical bag's mean is 1") {
    import spark.implicits._
    val vecs = Seq((1L, 0L, Seq(0.5f, -0.25f)), (1L, 1L, Seq(1.0f, 0.125f)))
      .toDF("doc_id", "token_idx", "embedding")
    val got = LateInteraction.meanVectors(
        LateInteraction.poolSum(vecs, "doc_id", dims = 2))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList))
    // pools (1500000, -125000) over 2 tokens -> means (0.75, -0.0625)
    assert(got.toSeq == Seq((1L, List(0.75f, -0.0625f))))
  }

  test("maxSimRerank scores only shortlisted docs") {
    import spark.implicits._
    val x = Seq(1f, 0f); val y = Seq(0f, 1f)
    val qv = Seq((1L, 0L, x)).toDF("query_id", "token_idx", "embedding")
      .repartition(2)
    val dv = Seq((10L, 0L, x), (20L, 0L, y))
      .toDF("doc_id", "token_idx", "embedding").repartition(2)
    val cand = Seq((1L, 20L)).toDF("query_id", "doc_id").repartition(2)
    val got = LateInteraction.maxSimRerank(cand, qv, dv, k = 5).collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(20L)) // doc 10 never scored
  }
}
