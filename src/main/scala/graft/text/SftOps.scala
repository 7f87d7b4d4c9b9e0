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
                   maxTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    turns
      .withColumn("tail_sum", sum(col("n_tok")).over(w))
      .filter(col("tail_sum") <= maxTokens)
  }

  /** Per-conversation truncation receipt over [[truncateTail]]:
    * `(idCol, n_turns, n_kept, kept_tokens, head_kept_idx)` — the
    * audit row a token-budget planner consumes. Aggregates the turn
    * rows once (same single shuffle as the window).
    */
  def truncateReceipt(turns: DataFrame, idCol: String,
                      maxTokens: Long): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("turn_idx").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = col("tail_sum") <= maxTokens
    turns
      .withColumn("tail_sum", sum(col("n_tok")).over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_turns"),
        count(when(kept, 1)).as("n_kept"),
        coalesce(sum(when(kept, col("n_tok"))), lit(0L)).as("kept_tokens"),
        min(when(kept, col("turn_idx"))).as("head_kept_idx"))
  }
}
