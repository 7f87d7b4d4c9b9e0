package graft.queries

import graft.SparkTestBase

/** Laws over the round-14 gate queries at sf0.001 — the invariants that
  * hold by construction regardless of corpus content. */
class Round14Spec extends SparkTestBase {

  test("d_ppl_buckets: per-lang thirds partition the language, ordered") {
    val rows = Round14Queries.queries("d_ppl_buckets")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val langTotal = graft.Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)))
      assert(bs.map(_._3).sum === langTotal(lang))
      // near-equal thirds: sizes differ by at most 1
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1)
      // rank-ordered buckets: bucket b's worst score >= bucket b+1's best
      // (equality allowed — avg ties may straddle a boundary)
      val byB = bs.sortBy(_._2).toSeq
      byB.sliding(2).foreach {
        case Seq(hi, lo) => assert(hi._4 >= lo._5)
        case _ =>
      }
    }
  }

  test("d_dsir_select: selected docs dominate the unselected on sum") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val target = docs.filter(col("lang") === "en" && col("source") === "src0")
    val all = graft.text.Dsir.score(docs, "doc_id", "text",
        graft.text.Dsir.model(docs, target, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sel = Round14Queries.queries("d_dsir_select")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(sel.size === math.min(50, all.size))
    val worstSel = sel.map(all).min
    val bestOut = (all.keySet -- sel).map(all).max
    assert(worstSel >= bestOut)
  }

  test("d_mix_epochs: allocations respect budget shares and the cap") {
    val rows = Round14Queries.queries("d_mix_epochs")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, toks, share, want, alloc, ep) =>
      assert(share >= 0 && share <= 1000000L)
      assert(alloc <= want && alloc <= toks * 2)
      assert(ep <= 2000L) // capX100 = 200 → at most 2.000 epochs
    }
    // single-round contract: total allocation never exceeds the budget
    assert(rows.map(_._4).sum <= 50000L)
  }

  test("d_bpe_fertility: token totals conserve against the tokenize " +
      "histogram; merges only ever lower fertility") {
    import org.apache.spark.sql.functions._
    import graft.text.BpeTrain
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val rows = Round14Queries.queries("d_bpe_fertility")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // conservation: Σ_lang n_tokens == the corpus token histogram total
    val histTotal = BpeTrain.tokenize(docs, "text",
        BpeTrain.merges(docs, "text", Round12Queries.BpeK))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum === histTotal)
    // fewer merges = fertility ceiling: each further merge can only
    // shrink a word's symbol count (k must be >= 1 by contract)
    val k1 = BpeTrain.fertility(docs, "lang", "text",
        BpeTrain.merges(docs, "text", 1))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    rows.foreach { case (lang, nw, nt, fert) =>
      assert(nw > 0 && nt >= nw)
      assert(fert <= k1(lang), s"$lang: fertility rose under merges")
    }
  }

  test("d_chunk_cdc: chunks partition every doc's token stream") {
    import org.apache.spark.sql.functions._
    val got = Round14Queries.queries("d_chunk_cdc")(spark, sfDir)
      .groupBy("doc_id")
      .agg(sum("n_toks").as("toks"), count(lit(1)).as("n_chunks"))
    val expect = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast("long")
          .as("toks"))
    val joined = got.join(expect, Seq("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(joined.nonEmpty)
    joined.foreach { case (chunked, nChunks, total) =>
      assert(chunked === total)
      assert(nChunks >= 1L)
    }
  }

  test("d_chunk_delta: an edited doc reuses all but its leading chunks") {
    val rows = Round14Queries.queries("d_chunk_delta")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, v1, v2, reused) =>
      assert(reused <= math.min(v1, v2), s"doc $id over-reused")
      // the resync guarantee: at most the chunks touching the edit
      // point differ (the prepended token lives in the first chunk;
      // one boundary near it may move)
      assert(reused >= v1 - 2, s"doc $id resync failed: $reused/$v1")
    }
  }

  test("d_decontaminate_bloom: eval slice self-flags; flags have hits") {
    val rows = Round14Queries.queries("d_decontaminate_bloom")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length ===
      graft.Tables.load(spark, sfDir, "documents").count())
    rows.foreach { case (id, n, c) =>
      assert(c === (n > 0))
      if (id >= 5 && id < 10) assert(c) // eval docs overlap themselves
    }
  }
}
