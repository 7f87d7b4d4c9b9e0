package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT (supervised fine-tuning) conversation preparation: turn
  * segmentation, loss-mask flattening, and context-window truncation.
  *
  * Chat corpora train with the loss restricted to assistant turns: the
  * rendered training sequence interleaves role markers and turn text,
  * and the data pipeline must emit, alongside the string, the exact
  * character spans the loss applies to. Getting those offsets right is
  * pure integer algebra over turn lengths — which is why the whole
  * surface here is window-function arithmetic (codegen'd, no UDFs) and
  * why it oracles exactly against SQL.
  *
  * The reference engine has no chat surface (it is a meter-data
  * engine); these operators extend the training-data pipeline the same
  * way the dedup/ANN families do. The sandbox corpus has no real chat
  * logs, so [[toTurns]] doubles as the deterministic synthetic
  * deriver: fixed-size token windows with alternating user/assistant
  * roles. In production the turn rows come from the chat parser; every
  * operator downstream of [[toTurns]] consumes only the turn-row shape
  * `(id, turn_idx, role, txt)` and is the real thing.
  *
  * Scale: turn derivation is map-only (explode of a per-doc range —
  * no shuffle). Flatten/mask/truncate each shuffle ONCE on the doc id
  * (window partition or groupBy); all arithmetic is whole-stage
  * codegen. At 100 TB nothing here exceeds per-doc state: the widest
  * aggregation materializes one document's rendered sequence, never a
  * partition's.
  */
object SftOps {

  private def marker(role: Column): Column =
    concat(lit("<|"), role, lit("|>"))

  /** Deterministic turn segmentation: token windows of `turnTokens`,
    * roles alternating user/assistant from user. Output one row per
    * turn: `(idCol, turn_idx, role, txt, n_tok)`. Map-only (the
    * explode is per-doc; no shuffle).
    */
  def toTurns(docs: DataFrame, idCol: String, textCol: String,
              turnTokens: Int): DataFrame = {
    require(turnTokens >= 1,
      s"turnTokens must be >= 1 (got $turnTokens)")
    val tok = TextOps.tokens(col(textCol))
    val nTurns = ceil(size(tok) / lit(turnTokens.toDouble)).cast("long")
    docs
      .select(col(idCol), tok.as("_tok"), nTurns.as("_n"))
      // token-less docs have no turns; also keeps the explode bound
      // non-negative (Spark sequence(0, -1) counts DOWN)
      .filter(col("_n") > 0)
      .select(col(idCol),
        explode(sequence(lit(0L), col("_n") - 1)).as("turn_idx"),
        col("_tok"))
      .select(col(idCol), col("turn_idx"),
        when(col("turn_idx") % 2 === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        array_join(slice(col("_tok"),
          (col("turn_idx") * turnTokens + 1).cast("int"),
          lit(turnTokens)), " ").as("txt"))
      .withColumn("n_tok", when(length(col("txt")) === 0, lit(0L))
        .otherwise(size(split(col("txt"), " ")).cast("long")))
  }

  /** Render each conversation to one training sequence and emit the
    * assistant-turn loss-mask spans.
    *
    * Returns one row per ASSISTANT turn:
    * `(idCol, turn_idx, s, e, masked_text, seq_len)` where `[s, e)` are
    * 0-based character offsets into the rendered sequence
    * `<|user|>t0<|assistant|>t1…`, `masked_text` is `substring(seq, s,
    * e - s)` extracted from the ACTUAL rendered string (so a span bug
    * and a render bug cannot cancel — the extraction crosses them), and
    * `seq_len` is the full sequence length.
    *
    * ONE shuffle on the doc id: the span cumsum and the per-doc render
    * are both window expressions over the same partitioning — the
    * cumsum on the ordered prefix frame, the render as a whole-
    * partition `collect_list(struct(turn_idx, piece))` (order is
    * nondeterministic, so `sort_array` restores turn order before the
    * join-to-string). No groupBy, no self-join: Catalyst plans a
    * single exchange with two Window operators on top (pinned by
    * PlanShapeSpec).
    */
  def flattenWithMask(turns: DataFrame, idCol: String): DataFrame = {
    val piece = concat(marker(col("role")), col("txt"))
    val wCum = Window.partitionBy(col(idCol)).orderBy(col("turn_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(idCol))
    turns
      .withColumn("_piece_len",
        (length(marker(col("role"))) + length(col("txt"))).cast("long"))
      .withColumn("_bef",
        coalesce(sum(col("_piece_len")).over(wCum), lit(0L)))
      .withColumn("_seq", array_join(transform(
        sort_array(collect_list(struct(col("turn_idx"), piece.as("p")))
          .over(wAll)), x => x("p")), ""))
      .filter(col("role") === "assistant")
      .withColumn("s", col("_bef") + length(marker(col("role"))))
      .withColumn("e", col("s") + length(col("txt")))
      .select(col(idCol), col("turn_idx"), col("s"), col("e"),
        expr("substring(_seq, cast(s as int) + 1, cast(e - s as int))")
          .as("masked_text"),
        length(col("_seq")).cast("long").as("seq_len"))
  }

  /** Context-window truncation that preserves whole turns from the
    * TAIL (the end of a conversation is what conditions the next
    * assistant reply; heads are droppable). A turn is kept iff the
    * token total of it plus everything after it fits `maxTokens` —
    * i.e. the longest whole-turn suffix within budget.
    *
    * Returns the kept turn rows with the original schema plus
    * `tail_sum` (the suffix token total through this turn). One
    * shuffle (window on the doc id).
    */
  def truncateTail(turns: DataFrame, idCol: String,
                   maxTokens: Long): DataFrame =
    withTailSum(turns, idCol).filter(kept(maxTokens))

  /** The ONE definition of the truncation rule, shared by the
    * executable truncation and its audit receipt — so the two can
    * never silently drift apart. */
  private def withTailSum(turns: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns.withColumn("tail_sum", sum(col("n_tok")).over(w))
  }

  private def kept(maxTokens: Long): Column =
    col("tail_sum") <= maxTokens

  /** Preference-pair construction (DPO/RLHF data prep): each document
    * splits into (prompt = first `promptTokens` tokens, completion =
    * the rest); the CHOSEN completion is the doc's own, the REJECTED
    * one is the completion of the next-lower-quality doc in the same
    * stratum — the standard mismatched-continuation hard-negative
    * construction (cf. [[graft.similarity.Similarity.hardNegatives]]),
    * built deterministically from the integer quality order. Pairs
    * whose quality gap is below `marginE6` are dropped: a pair with no
    * margin teaches the reward model nothing.
    *
    * Quality is `TextOps.qualityScore · 1e6` (the d_budget_select
    * integer convention); order within a stratum is (quality desc, id)
    * so the pairing is total and engine-exact. Docs with no completion
    * (≤ promptTokens tokens) don't participate on either side.
    *
    * One shuffle (the stratum window). Output: `(chosen_id,
    * rejected_id, prompt, chosen_text, rejected_text, q_chosen_e6,
    * q_rejected_e6, gap_e6)`.
    */
  def preferencePairs(docs: DataFrame, idCol: String, textCol: String,
                      stratumCol: String, promptTokens: Int,
                      marginE6: Long): DataFrame = {
    require(promptTokens >= 1,
      s"promptTokens must be >= 1 (got $promptTokens)")
    require(marginE6 >= 0, s"marginE6 must be >= 0 (got $marginE6)")
    val qE6 = round(TextOps.qualityScore(col(textCol)) * 1e6).cast("long")
    val toks = TextOps.tokens(col(textCol))
    val base = docs
      .select(col(idCol), col(stratumCol).as("_st"), toks.as("_tok"),
        qE6.as("q_chosen_e6"))
      .filter(size(col("_tok")) > promptTokens)
    val w = Window.partitionBy(col("_st"))
      .orderBy(col("q_chosen_e6").desc, col(idCol))
    def completion(c: Column): Column =
      array_join(slice(c, lit(promptTokens + 1),
        greatest(size(c) - promptTokens, lit(0))), " ")
    base
      .withColumn("_r_id", lead(col(idCol), 1).over(w))
      .withColumn("_r_q", lead(col("q_chosen_e6"), 1).over(w))
      .withColumn("_r_tok", lead(col("_tok"), 1).over(w))
      .filter(col("_r_id").isNotNull &&
        col("q_chosen_e6") - col("_r_q") >= marginE6)
      .select(col(idCol).as("chosen_id"), col("_r_id").as("rejected_id"),
        array_join(slice(col("_tok"), 1, promptTokens), " ").as("prompt"),
        completion(col("_tok")).as("chosen_text"),
        completion(col("_r_tok")).as("rejected_text"),
        col("q_chosen_e6"), col("_r_q").as("q_rejected_e6"),
        (col("q_chosen_e6") - col("_r_q")).as("gap_e6"))
  }

  /** Per-conversation truncation receipt over [[truncateTail]]:
    * `(idCol, n_turns, n_kept, kept_tokens, head_kept_idx)` — the
    * audit row a token-budget planner consumes. Aggregates the turn
    * rows once (same single shuffle as the window).
    */
  def truncateReceipt(turns: DataFrame, idCol: String,
                      maxTokens: Long): DataFrame = {
    val in = kept(maxTokens)
    withTailSum(turns, idCol)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_turns"),
        count(when(in, 1)).as("n_kept"),
        coalesce(sum(when(in, col("n_tok"))), lit(0L)).as("kept_tokens"),
        min(when(in, col("turn_idx"))).as("head_kept_idx"))
  }
}
