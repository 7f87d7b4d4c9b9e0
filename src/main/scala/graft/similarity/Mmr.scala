package graft.similarity

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance (MMR) diversified top-k — the serving-side
  * result diversification step of a retrieval pipeline (pick k results
  * that are relevant to the query but not near-duplicates of each other;
  * Carbonell & Goldstein 1998).
  *
  * Greedy MMR is inherently sequential PER QUERY (selection i depends on
  * the i−1 already selected), so the distributed shape is: candidates
  * arrive already bounded per query (an ANN top-N — [[Quantize.topKQuant]]
  * / [[Similarity.ivfTopKWith]]), shuffle once on query_id, and run the
  * O(k·N) greedy loop per group with all N candidates in hand. This is a
  * legitimate `groupByKey`+`flatMapGroups` use (per-group iterative logic
  * over a BOUNDED group — same contract as the typed cogroup operator):
  * no SQL form expresses the data-dependent recursion without k self
  * joins, and the group is small by construction. A `maxCandidates` guard
  * keeps a mis-wired unbounded candidate feed from buffering a huge group:
  * overflow keeps the top-maxCandidates by (rel, id) — deterministic, and
  * loud in the contract rather than OOM.
  *
  * Scoring is INTEGER end to end (rel and pairwise sims are int8-code
  * dots — [[Quantize.dotCodes]]; λ is the rational lambdaNum/lambdaDen):
  * `score = lambdaNum·rel − (lambdaDen−lambdaNum)·max_{j∈selected} sim_ij`
  * with the empty-set max-sim term 0 (first pick is pure relevance) and
  * ties broken by neighbor_id — so the greedy trajectory is bit-exactly
  * reproducible in any engine (the `e_mmr_diversify` oracle unrolls it in
  * DuckDB, the same technique as the PageRank oracle).
  */
object Mmr {

  /** Diversify `cands` — columns (query_id: long, neighbor_id: long,
    * rel: long, codes: array<long>) — to k selections per query.
    * Output: (query_id, sel_rank, neighbor_id, mmr_score). */
  def diversify(cands: DataFrame, k: Int, lambdaNum: Int = 7,
                lambdaDen: Int = 10, maxCandidates: Int = 1024): DataFrame = {
    require(k > 0, s"k=$k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda $lambdaNum/$lambdaDen must be a rational in [0, 1]")
    // int8-code dots are ≤ 127²·dim ≈ 2^24 for dim ≤ 4096; a small λ
    // denominator keeps λnum·rel − penalty·sim far from Long overflow
    // even for caller-supplied rel columns up to ~2^40
    require(lambdaDen <= (1 << 20),
      s"lambdaDen=$lambdaDen too large (overflow headroom)")
    require(maxCandidates >= k, s"maxCandidates=$maxCandidates < k=$k")
    val spark = cands.sparkSession
    import spark.implicits._
    val penalty = (lambdaDen - lambdaNum).toLong

    cands
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("rel").cast("long"), col("codes"))
      .as[(Long, Long, Long, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Long, Array[Long])]) =>
        // deterministic candidate order (and overflow truncation order):
        // highest relevance first, id tie-break
        val cs = it.toArray.sortBy(c => (-c._3, c._2)).take(maxCandidates)
        val n = cs.length
        val take = math.min(k, n)
        val isChosen = new Array[Boolean](n)
        // maxSim(i) = max over selected j of idot(codes_i, codes_j),
        // updated incrementally after each selection: O(k·N) dots total
        val maxSim = Array.fill(n)(Long.MinValue)
        val out = Vector.newBuilder[(Long, Int, Long, Long)]
        var s = 0
        while (s < take) {
          var best = -1; var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!isChosen(i)) {
              val sim = if (s == 0) 0L else maxSim(i)
              val score = lambdaNum * cs(i)._3 - penalty * sim
              // candidate order is id-ascending within equal rel, but
              // equal SCORES can span rels — tie-break on id explicitly
              if (best < 0 || score > bestScore ||
                  (score == bestScore && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          isChosen(best) = true
          out += ((qid, s + 1, cs(best)._2, bestScore))
          var j = 0
          while (j < n) {
            if (!isChosen(j)) {
              val sim = idot(cs(j)._4, cs(best)._4)
              if (sim > maxSim(j)) maxSim(j) = sim
            }
            j += 1
          }
          s += 1
        }
        out.result()
      }
      .toDF("query_id", "sel_rank", "neighbor_id", "mmr_score")
  }

  private def idot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
