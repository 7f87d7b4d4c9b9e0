package graft.similarity

import org.apache.spark.sql.functions._
import graft.{GraftExtensions, SparkTestBase}
import graft.text.TextOps

class SimilaritySpec extends SparkTestBase {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank " +
    "while a cold wind blows through the tall green trees of the old forest"

  private def docs = Seq(
    (0L, base),
    (1L, base.replace("cold", "warm")), // near-dup of 0
    (2L, base),                          // exact dup of 0
    (3L, "completely different text about spark catalyst optimizer rules and " +
      "physical plan selection for distributed joins over partitioned parquet data"),
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("minhashPairs finds planted near/exact dups and skips unrelated") {
    val pairs = Similarity.minhashPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 2L)), s"exact dup missed: $pairs")
    assert(keys.contains((0L, 1L)) || keys.contains((1L, 2L)),
      s"near dup missed: $pairs")
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
    val exact = pairs.find(p => (p._1, p._2) == (0L, 2L)).get
    assert(exact._3 == 1.0)
  }

  test("simhashPairs: exact dup at hamming 0; unrelated text not paired") {
    val pairs = Similarity.simhashPairs(docs, "doc_id", "text", maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSeq
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0L),
      s"exact dup not at hamming 0: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false positive: $pairs")
  }

  test("simhash multi-probe finds a hamming-3 pair whose differing bits " +
      "all sit in the top-16 block (single-probe provably misses it)") {
    // bits 63, 55, 50 — all inside block 0 (the old single-probe bucket)
    val sigs = Seq(
      (1L, 0L),
      (2L, (1L << 63) | (1L << 55) | (1L << 50)),
      // control pair in a shared bucket everywhere (hamming 1, bit 0)
      (10L, 0x0123456789abcdefL),
      (11L, 0x0123456789abcdeeL)).toDF("id", "simhash")
    val single = Similarity.simhashPairsFromSigs(sigs, maxHamming = 3,
        numProbes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!single.contains((1L, 2L)),
      "single-probe unexpectedly found the top-block pair — test premise broken")
    assert(single.contains((10L, 11L)), s"control pair missed: $single")
    val multi = Similarity.simhashPairsFromSigs(sigs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2)
        .longValue)).toSet
    assert(multi.contains((1L, 2L, 3L)), s"multi-probe missed: $multi")
    assert(multi.contains((10L, 11L, 1L)), s"control pair missed: $multi")
  }

  test("simhash 4-probe pigeonhole guarantee: every <=3-bit perturbation " +
      "is found wherever the bits land; pairs dedup across blocks") {
    val base = 0x5a5a5a5a5a5a5a5aL
    // 3 flipped bits straddling every block combination, incl. all-in-one
    val flips = Seq(
      Seq(63, 40, 5), Seq(63, 62, 61), Seq(47, 46, 45), Seq(31, 30, 29),
      Seq(15, 1, 0), Seq(60, 44, 28), Seq(50, 20, 10), Seq(12, 8, 3))
    val rows = (1L, base) +: flips.zipWithIndex.map { case (bs, i) =>
      ((i + 2).toLong, bs.foldLeft(base)((a, b) => a ^ (1L << b)))
    }
    val got = Similarity.simhashPairsFromSigs(rows.toDF("id", "simhash"),
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    flips.indices.foreach { i =>
      assert(got.contains((1L, (i + 2).toLong)),
        s"perturbation ${flips(i)} missed: $got")
    }
    // dropDuplicates: a pair colliding in several block tables appears once
    assert(got.distinct == got, s"duplicate pairs emitted: $got")
  }

  test("simhash of identical token streams is identical") {
    val sigs = docs.select(col("doc_id"),
      TextOps.simhash64(TextOps.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(2L))
    assert(sigs(0L) != sigs(3L))
  }

  test("bruteTopK ranks the exact duplicate vector first") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.001f, 0.0f, 0.0f), 0), // near-identical to 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteTopK(vecs.filter(col("vec_id") === 0), vecs, 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(top.head == (1, 1L), s"expected vec 1 first: $top")
  }

  test("lshTopK returns a subset of brute results with identical scores") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val brute = Similarity.bruteTopK(emb.filter(col("vec_id") < 3), emb, 50)
      .select("query_id", "neighbor_id", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb.filter(col("vec_id") < 3), emb, 64, 8, 3)
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      // every LSH hit must score identically to the exact computation when
      // the pair appears in the brute table
      brute.get(key).foreach(b => assert(math.abs(b - r.getDouble(3)) < 1e-12))
    }
  }

  test("rolling_hash matches the reference recurrence") {
    import graft.functions.RollingHash
    val got = Seq(("ab", 1)).toDF("s", "x")
      .select(RollingHash.rolling_hash(col("s"))).head.getLong(0)
    val want = (('a'.toLong * 31) + 'b'.toLong) % 1000000007L
    assert(got == want)
    // and via SQL registration
    org.apache.spark.sql.graftshim.ColumnBridge.registerFunction(
      spark, "rolling_hash", exprs => graft.functions.RollingHash(exprs.head))
    assert(spark.sql("SELECT rolling_hash('ab')").head.getLong(0) == want)
  }

  test("native DotProduct kernel is bit-identical to the declarative fold") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings").limit(200)
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib") - 150) // a few thousand pairs
    val diff = pairs.select(
      Similarity.cosine(col("ea"), col("eb")).as("native"),
      Similarity.cosineFold(col("ea"), col("eb")).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() == 0)
  }

  test("ANN recall@3 vs brute force is measured and bounded") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val brute = topSet(Similarity.bruteTopK(queries, emb, 3))
    val ivf = topSet(Similarity.ivfTopK(queries, emb, 3,
      centroidStride = 50, nprobe = 4))
    val lsh = topSet(Similarity.lshTopK(queries, emb, 64, 6, 3, numTables = 16))
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = brute.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
      }
      hits.sum / hits.size
    }
    val rIvf = recall(ivf)
    val rLsh = recall(lsh)
    info(f"recall@3: ivf(nprobe=4)=$rIvf%.2f lsh(6 planes x16 tables)=$rLsh%.2f")
    // generous floors — these are sanity bounds, not tuning targets
    assert(rIvf > 0.3, s"IVF recall collapsed: $rIvf")
    assert(rLsh > 0.3, s"LSH recall collapsed: $rLsh")
  }

  test("PQ topK: exact re-scores, bounded recall vs brute force") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(queries, emb, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bruteSets = brute.keys.groupBy(_._1)
      .map { case (q, ks) => q -> ks.map(_._2).toSet }
    val pq = ProductQuantizer.topK(queries, emb, dim = 64, numSub = 8, k = 3,
      stride = 20, rerank = 8)
      .collect()
    assert(pq.nonEmpty)
    // every PQ hit that brute also ranked must carry the identical exact score
    pq.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2)))
        .foreach(b => assert(math.abs(b - r.getDouble(3)) < 1e-12))
    }
    val hits = bruteSets.map { case (q, truth) =>
      pq.filter(_.getLong(0) == q).map(_.getLong(2)).count(truth.contains).toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    info(f"PQ recall@3 (8 subs, stride-20 books, rerank=8): $recall%.2f")
    assert(recall > 0.3, s"PQ recall collapsed: $recall")
  }

  test("PQ with k-means-trained codebooks keeps recall") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val brute = topSet(Similarity.bruteTopK(queries, emb, 3))
    val books = ProductQuantizer.codebooksKMeans(emb, dim = 64, numSub = 8,
      k = 16, iters = 2)
    val pq = topSet(ProductQuantizer.topKWith(queries, emb, dim = 64,
      numSub = 8, k = 3, books, rerank = 8))
    val hits = brute.map { case (q, truth) =>
      pq.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
    }
    val recall = hits.sum / hits.size
    info(f"PQ recall@3 with trained books (k=16, 2 iters): $recall%.2f")
    assert(recall > 0.3, s"trained-book PQ recall collapsed: $recall")
  }

  test("native HyperplaneBuckets kernel is bit-identical to the declarative fold") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings").limit(300)
    val diff = emb.select(
      Similarity.hyperplaneBuckets(col("embedding"), 64, 8, 8).as("native"),
      Similarity.hyperplaneBucketsFold(col("embedding"), 64, 8, 8).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() == 0)
    // degenerate inputs follow the fold's algebra: short arrays and null
    // elements zero the bits; LONGER arrays contribute extra terms with
    // the plane-seed parity (xxhash64 skips the padded-null index)
    val weird = Seq[(Long, Array[java.lang.Float])](
      (0L, Array[java.lang.Float](1.0f, 2.0f)),       // shorter than dim
      (1L, Array[java.lang.Float](1.0f, null, 3.0f)), // null element
      (2L, Array[java.lang.Float](1.0f, -2.0f, 3.0f, -4.0f, 5.0f)) // longer
    ).toDF("id", "embedding")
    val rows = weird.select(
      Similarity.hyperplaneBuckets(col("embedding"), 3, 4, 2).as("native"),
      Similarity.hyperplaneBucketsFold(col("embedding"), 3, 4, 2).as("fold"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"degenerate mismatch: $r")
    }
  }

  test("native SimHash64 is bit-identical to the declarative fold") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(200)
    val diff = docs.select(
      TextOps.simhash64(TextOps.tokens(col("text"))).as("native"),
      TextOps.simhash64Fold(TextOps.tokens(col("text"))).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() == 0)
  }

  test("native SimHash64 matches the fold on arrays containing null tokens") {
    // fold: xxhash64 skips null children and votes with the seed (42);
    // the native kernel must do the same, not NPE
    val df = Seq(Tuple1(Seq("a", null, "b"))).toDF("toks").repartition(2)
    val row = df.select(
      TextOps.simhash64(col("toks")).as("native"),
      TextOps.simhash64Fold(col("toks")).as("fold")).head()
    assert(row.getLong(0) == row.getLong(1))
  }

  test("native NgramHash is bit-identical to the declarative fold on real docs") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(200)
    for (n <- Seq(1, 3, 8)) {
      val diff = docs.select(
        TextOps.ngramHashes(TextOps.tokens(col("text")), n).as("native"),
        TextOps.ngramHashesFold(TextOps.tokens(col("text")), n).as("fold"))
        .filter(not(col("native") === col("fold")))
      assert(diff.count() == 0, s"ngram mismatch at n=$n")
    }
  }

  test("native NgramHash edge cases: short arrays, null tokens") {
    val df = Seq(
      Tuple1(Seq[String]()),            // empty
      Tuple1(Seq("a", "b")),            // shorter than n → empty output
      Tuple1(Seq("a", null, "b", "c"))  // null hashes as the seed, like fold
    ).toDF("toks").repartition(2)
    val rows = df.select(
      TextOps.ngramHashes(col("toks"), 3).as("native"),
      TextOps.ngramHashesFold(col("toks"), 3).as("fold")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
    assert(rows(0).getSeq[Long](0).isEmpty || rows.exists(_.getSeq[Long](0).isEmpty))
  }

  test("native MinHashSig is bit-identical to the declarative fold " +
      "(incl. empty input => MaxValue slots)") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(200)
    val grams = docs.select(
      TextOps.ngramHashes(TextOps.tokens(col("text")), 3).as("g"))
    val diff = grams.select(
      Similarity.minhashSignature(col("g"), 32).as("native"),
      Similarity.minhashSignatureFold(col("g"), 32).as("fold"))
      .filter(not(col("native") === col("fold")))
    assert(diff.count() == 0)
    val empty = Seq(Tuple1(Seq[Long]())).toDF("g").repartition(2)
      .select(Similarity.minhashSignature(col("g"), 4).as("native"),
        Similarity.minhashSignatureFold(col("g"), 4).as("fold")).head()
    assert(empty.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(empty.getSeq[Long](0) == empty.getSeq[Long](1))
  }

  test("native MinHashSig matches the fold on arrays containing NULL gram ids") {
    // fold: xxhash64(i, NULL) skips the null child, so the slot candidate
    // is hashInt(i, 42) itself — the native kernel must do the same, not
    // hash a phantom gram id 0
    val df = Seq(Tuple1(Seq[java.lang.Long](1L, null, 2L)))
      .toDF("g").repartition(2)
    val row = df.select(
      Similarity.minhashSignature(col("g"), 8).as("native"),
      Similarity.minhashSignatureFold(col("g"), 8).as("fold")).head()
    assert(row.getSeq[Long](0) == row.getSeq[Long](1))
  }

  test("NgramHash/MinHashSig reject wrong element types at analysis") {
    val longs = Seq(Tuple1(Seq(1L, 2L))).toDF("v")
    val e1 = intercept[Exception] {
      longs.select(TextOps.ngramHashes(col("v"), 2)).collect()
    }
    assert(e1.getMessage.contains("ARRAY<STRING>") ||
      e1.getMessage.toLowerCase.contains("data type mismatch"))
    val strs = Seq(Tuple1(Seq("a", "b"))).toDF("v")
    val e2 = intercept[Exception] {
      strs.select(Similarity.minhashSignature(col("v"), 2)).collect()
    }
    assert(e2.getMessage.contains("ARRAY<BIGINT>") ||
      e2.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("minhash_sig and ngram_hashes are callable from SQL via GraftExtensions") {
    val fr = spark.sessionState.functionRegistry
    Seq(GraftExtensions.ngramHashesDescriptor, GraftExtensions.minhashSigDescriptor)
      .foreach { case (id, info, builder) =>
        if (!fr.functionExists(id)) fr.registerFunction(id, info, builder)
      }
    graft.Tables.load(spark, sfDir, "documents").limit(5)
      .createOrReplaceTempView("ngram_sql_docs")
    val rows = spark.sql(
      """SELECT minhash_sig(ngram_hashes(
        |  regexp_extract_all(lower(text), '[a-z0-9]+', 0), 3), 8) AS sig
        |FROM ngram_sql_docs""".stripMargin).collect()
    assert(rows.nonEmpty && rows.forall(_.getSeq[Long](0).length == 8))
  }

  test("minhashPairs rejects band counts that don't divide the signature") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Similarity.minhashPairs(df, "doc_id", "text",
        numHashes = 32, numBands = 64)
    }
  }

  test("DotProduct rejects ARRAY<DOUBLE> at analysis instead of reading garbage") {
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("v")
    val e = intercept[Exception] {
      df.select(graft.functions.DotProduct.dot_product(col("v"), col("v")))
        .collect()
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("KMeans.fit keeps k centroids even when a cluster wins zero vectors") {
    import spark.implicits._
    // 2 distinct vectors among 3+ rows: one duplicate seed centroid loses
    // every assignment (cosine ties break to the lower centroid_id)
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val centroids = KMeans.fit(corpus, k = 3, iters = 2)
    assert(centroids.count() == 3)
    assert(centroids.filter(col("centroid").isNull).count() == 0)
  }

  test("maxBucketSize caps adversarial identical-text pileups") {
    val many = (0L until 30L).map(i => (i, base)).toDF("doc_id", "text")
    val uncapped = Similarity.minhashPairs(many, "doc_id", "text",
      minJaccard = 0.9)
    assert(uncapped.count() == 30L * 29 / 2) // full quadratic pair set
    val capped = Similarity.minhashPairs(many, "doc_id", "text",
      minJaccard = 0.9, maxBucketSize = 5)
    assert(capped.count() == 0) // mega-bucket dropped; exact dedup's job
  }
}
