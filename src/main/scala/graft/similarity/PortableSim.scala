package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** PORTABLE (md5-seeded) twins of the xxhash64-seeded candidate
  * generators in [[Similarity]]: MinHash+LSH, SimHash multi-probe, and
  * hyperplane LSH, with every hash derived from md5 hex slices — the one
  * hash both Spark and ANSI-SQL engines (DuckDB, Trino, …) compute
  * identically. The production operators keep xxhash64 (one codegen'd
  * 64-bit mix per gram vs an md5 per gram here); these twins exist so
  * the FULL pipeline output — signatures, band buckets, candidate pairs,
  * verified scores — can be replayed bit-for-bit by an independent SQL
  * engine, upgrading the planted-duplicate recall contracts
  * ([[graft.queries.Round7Queries]]) to whole-output oracles. Same route
  * [[graft.text.Fingerprint]] proved for winnowing (40-bit md5 gram
  * hashes).
  *
  * Scale shape is IDENTICAL to the production operators: banded bucket
  * joins on constant-width keys, map-side signature computation, pair
  * dedup before the exact verify — only the seed hash differs. Integer
  * surfaces everywhere (hex-slice hashes ≤ 60 bits, bucket keys as
  * strings/longs); the only floats are the exact verify scores, computed
  * with the repo's sequential-left-fold contract.
  */
object PortableSim {

  /** `width`-hex-digit slice of an md5 hex string, as an unsigned long
    * (≤ 15 digits = 60 bits — safely inside BIGINT). SQL mirror:
    * `CAST(('0x' || substring(md5(x), off, width)) AS BIGINT)`. */
  private def md5Slice(s: Column, off: Int, width: Int): Column = {
    require(width >= 1 && width <= 15, s"md5Slice width=$width not in [1,15]")
    conv(substring(md5(s.cast("binary")), off, width), 16, 10).cast("long")
  }

  /** Distinct token 3-gram STRINGS (space-joined) per row — the portable
    * gram universe (the production path hashes grams to 64-bit ids
    * without ever building the string; here the string IS the unit both
    * engines md5). Emits (idCol, gram); rows with < n tokens vanish. */
  private def gramRows(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= n)
    // explode gram START POSITIONS, not a transformed gram array: a gram
    // array built by transform() re-evaluates the captured token column
    // per element after projection collapse (the HOF-body trap,
    // TextOps.shingles scaladoc) — position explode keeps the token
    // array a per-row attribute
    toks.select(col(idCol),
        col("_t"), explode(sequence(lit(1), size(col("_t")) - (n - 1))).as("_i"))
      .select(col(idCol),
        concat_ws(" ", slice(col("_t"), col("_i"), lit(n))).as("gram"))
      .distinct()
  }

  /** MinHash+LSH near-dup candidate pairs, md5-seeded: 8 hash slots (the
    * 8 4-byte slices of md5(gram) and md5('x'+gram)), 4 bands × 2 rows.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard the EXACT
    * set Jaccard over 60-bit md5 gram ids (equals string-gram Jaccard up
    * to 2^-60 collisions — the d_ngram_jaccard argument).
    *
    * Pipeline shape == [[Similarity.minhashPairs]]: map-side signatures
    * (here one explode + one groupBy(id) min-agg instead of the fused
    * kernel — both a single shuffle on the doc id), band-bucket
    * equi-join, pair dedup before the verify. */
  def minhashPairsMd5(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    val g = gramRows(df, idCol, textCol, shingleN)
      .withColumn("_m1", md5(col("gram").cast("binary")))
      .withColumn("_m2", md5(concat(lit("x"), col("gram")).cast("binary")))
    val hashCols: Seq[Column] =
      Seq(col(idCol).as("id"),
        conv(substring(col("_m1"), 1, 15), 16, 10).cast("long").as("gid")) ++
        (0 until 8).map { i =>
          val src = if (i < 4) col("_m1") else col("_m2")
          conv(substring(src, (i % 4) * 8 + 1, 8), 16, 10).cast("long").as(s"h$i")
        }
    val hashed = g.select(hashCols: _*)
    val sigs = hashed.groupBy(col("id"))
      .agg(collect_set(col("gid")).as("gs"),
        (0 until 8).map(i => min(col(s"h$i")).as(s"s$i")): _*)
    // 4 bands × 2 rows/band; bucket key = the slot values themselves
    // (production hashes the concat — bucketing is invariant to that)
    val banded = sigs.select(col("id"), col("gs"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("bucket"))
      }: _*)).as("_b"))
      .select(col("id"), col("gs"), col("_b.band").as("band"),
        col("_b.bucket").as("bucket"))
      // feeds both self-join sides; persist() (NOT eager localCheckpoint)
      // so construction schedules no job and lineage survives — the
      // simhashPairsFromSigs lesson. Registered so loop-shaped callers
      // can StagedCache.release() the entry post-materialization.
      .persist()
    graft.similarity.StagedCache.register(banded)
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"),
      col("gs").as("gs_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"),
      col("gs").as("gs_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("gs_a"), col("gs_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.jaccard(col("gs_a"), col("gs_b")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 32-bit md5 SimHash signatures: per token occurrence (multiset, like
    * the production fold) hash = first 8 hex digits of md5(token); bit b
    * of the signature is set iff Σ_tokens (±1 by hash bit b) > 0.
    * Docs with zero tokens get signature 0 (the empty-fold identity).
    * Returns (id, simhash). */
  def simhashSigsMd5(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5Slice(col("tok"), 1, 8))
    val bitCols = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"c$b")
    }
    val sig = tok.groupBy(col("id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("id"),
        (0 until 32).map(b =>
          when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    df.select(col(idCol).as("id")).distinct()
      .join(sig, Seq("id"), "left")
      .select(col("id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs over [[simhashSigsMd5]] signatures via
    * 2-probe block LSH (the two 16-bit halves — pigeonhole-exact at
    * hamming ≤ 1, same OR-construction as the production 4×16 probe).
    * Returns (id_a, id_b, hamming ≤ maxHamming). */
  def simhashPairsMd5(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int): DataFrame = {
    val sigs = simhashSigsMd5(df, idCol, textCol)
    val banded = sigs.select(col("id"), col("simhash"),
      explode(array(
        struct(lit(0).as("t"),
          shiftright(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)).as("bucket")),
        struct(lit(1).as("t"),
          col("simhash").bitwiseAND(lit(0xFFFFL)).as("bucket")))).as("p"))
      .select(col("id"), col("simhash"), col("p.t").as("t"),
        col("p.bucket").as("bucket"))
      .persist() // both self-join sides read it; lazy — no job at construction
    graft.similarity.StagedCache.register(banded)
    val l = banded.select(col("t"), col("bucket"), col("id").as("id_a"),
      col("simhash").as("sim_a"))
    val r = banded.select(col("t"), col("bucket"), col("id").as("id_b"),
      col("simhash").as("sim_b"))
    l.join(r, Seq("t", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The ±1 sign of plane (t, p) component j: parity of the first 4
    * md5 hex digits of "{t*1000+p}_{j}" — computed DRIVER-SIDE (the
    * sign matrix is a plan constant; SignedProjectExpr's
    * reference-object precedent) and embedded as literal arrays, so the
    * per-row work is only the fold multiply. A column-expression md5
    * per (row, t, p, j) computed the identical values 2M times per 2k
    * vectors — measured 3.3s of pure rehashing at bench scale. The SQL
    * twin still derives the same signs from md5 independently. */
  private[similarity] def planeSign(t: Int, p: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${t * 1000 + p}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.take(4), 16) % 2 == 1) 1.0 else -1.0
  }

  /** md5-seeded ±1 hyperplane bucket ids, `numTables` tables ×
    * `numPlanes` planes: sign of plane (t,p) component j is the parity
    * of a 16-bit md5 slice of "{t*1000+p}_{j}"; bucket(t) = t·2^32 |
    * Σ_p [dot(v, plane_tp) > 0] << p. The dot is the repo's sequential
    * left fold in double (SQL mirror: Round13Queries.dotSql over a
    * `list(± ORDER BY j)` plane), so bucket bits replay exactly. */
  def hyperplaneBucketsMd5(emb: Column, dim: Int, numPlanes: Int,
                           numTables: Int): Column =
    array((0 until numTables).map { t =>
      val bits = (0 until numPlanes).map { p =>
        val plane = typedLit((0 until dim).map(j => planeSign(t, p, j)))
        val dot = aggregate(
          zip_with(emb, plane, (x, s) => x.cast("double") * s),
          lit(0.0), (acc, v) => acc + v)
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _) + lit(t.toLong * 4294967296L)
    }: _*)

  /** Hyperplane-LSH approximate top-k, md5-seeded — the portable twin of
    * [[Similarity.lshTopK]] (same OR-construction candidate union, same
    * exact cosine re-score and (cos desc, id) ranking). */
  def lshTopKMd5(queries: DataFrame, corpus: DataFrame, dim: Int,
                 numPlanes: Int, k: Int, numTables: Int = 2): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      explode(hyperplaneBucketsMd5(col("embedding"), dim, numPlanes,
        numTables)).as("bucket"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(hyperplaneBucketsMd5(col("embedding"), dim, numPlanes,
        numTables)).as("bucket")))
    val candidates = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_emb", "neighbor_id", "c_emb")
      .dropDuplicates(Seq("query_id", "neighbor_id"))
    val scored = candidates
      .withColumn("cos_sim", Similarity.cosineGuarded(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }
}
