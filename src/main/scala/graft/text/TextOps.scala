package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, shingling, quality scoring, language ID, SimHash. All pure
  * `functions._` compositions (higher-order array functions) — codegen'd,
  * no UDFs, so every operator scales as a map-only pass over the corpus.
  */
object TextOps {

  /** Lowercased word tokens. RE2/Java-portable character class so DuckDB
    * oracles can mirror the definition exactly. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Whitespace token count (runs of non-whitespace). */
  def tokenCountWs(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword count: letter runs split from digit singles and
    * punctuation singles — a cheap stand-in for a GPT-style pre-tokenizer
    * with a portable regex. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles from a token array (space-joined).
    *
    * Built from zip_with over shifted slices, NOT element_at inside a
    * transform lambda: HOF inputs are evaluated once per ROW, while a
    * lambda body re-evaluates its embedded subtrees once per ELEMENT — with
    * `toks` being a regexp tokenization (as every caller passes), the
    * element_at form re-ran the regex O(n × shingles) times per row (~30×
    * slower end-to-end on real documents). Here `toks` is referenced n+1
    * times per row, each a per-row evaluation. */
  def shingles(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1) // number of shingles when non-negative
    val base = slice(toks, lit(1), greatest(m, lit(0)))
    val joined = (1 until n).foldLeft(base) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), greatest(m, lit(0))),
        (x, y) => concat(x, lit(" "), y))
    }
    when(size(toks) < n, array().cast("array<string>")).otherwise(joined)
  }

  /** 64-bit n-gram ids without materializing gram strings: xxhash64 each
    * token once, then fold n shifted hash slices through xxhash64(acc, h).
    * Equality of ids ≡ equality of grams up to 64-bit collisions (~2⁻⁶⁴
    * per pair) — the trade every production substring-dedup makes; pure
    * integer math on the map side and 8-byte shuffle keys instead of gram
    * strings. Delegates to the native codegen'd kernel
    * ([[graft.functions.NgramHash]]); [[ngramHashesFold]] is the
    * declarative reference semantics (bit-identical, asserted in
    * SimilaritySpec). */
  def ngramHashes(toks: Column, n: Int): Column =
    graft.functions.NgramHash.ngram_hashes(toks, n)

  /** Declarative fold form of [[ngramHashes]] — the portable definition of
    * record (zip_with ladder over shifted slices, same shape as
    * [[shingles]]; xxhash64(acc, h) is a proper mix AND overflow-free
    * under ANSI mode — a raw `*prime + h` polynomial throws
    * ARITHMETIC_OVERFLOW there). */
  private[graft] def ngramHashesFold(toks: Column, n: Int): Column = {
    val th = transform(toks, t => xxhash64(t))
    val m = greatest(size(toks) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(th, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), m), (x, y) => xxhash64(x, y))
    }
  }

  /** The four quality-heuristic component ratios (alpha, punct, stopword
    * hit rate, capped length term) — THE single definition shared by
    * [[qualityScore]] and [[QualityClassifier.features]], with
    * [[graft.queries.QueryShared.qualityComponentsSql]] as its one SQL
    * mirror: the cross-engine-exactness contracts of the classifier and
    * budget-select oracles ride on these expressions staying in lockstep,
    * so they live in exactly one place per engine. */
  def qualityComponents(text: Column): Seq[Column] = {
    val nChars = length(text).cast("double")
    val nAlpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val nPunct = length(regexp_replace(text, "[^.,!?;:]", "")).cast("double")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stop = array(Stopwords.map(lit): _*)
    val nStop = size(array_intersect(toks, stop)).cast("double")
    Seq(
      when(nChars > 0, nAlpha / nChars).otherwise(0.0),
      when(nChars > 0, nPunct / nChars).otherwise(0.0),
      when(nTok > 0, nStop / lit(Stopwords.size.toDouble)).otherwise(0.0),
      least(nTok / 64.0, lit(1.0)))
  }

  /** Quality score in [0,1] from length/punctuation/stopword ratios — the
    * standard cheap heuristics, all per-row arithmetic (deterministic across
    * engines; oracle-friendly). */
  def qualityScore(text: Column): Column = {
    val Seq(alphaRatio, punctRatio, stopHit, lengthTerm) =
      qualityComponents(text)
    round(
      lit(0.4) * alphaRatio + lit(0.2) * (lit(1.0) - punctRatio) +
        lit(0.2) * stopHit + lit(0.2) * lengthTerm, 6)
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Tiny and deterministic — the point is the *shape* (argmax of
    * per-language evidence, map-only), not lexicon quality. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "die", "ist", "mit"),
    "es" -> Seq("el", "los", "que", "es", "con"),
    "fr" -> Seq("le", "les", "et", "est", "avec"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Language ID: count marker-word hits per language over the token array,
    * take the argmax (ties → first language in LangMarkers order), default
    * "und" when nothing matches. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    // greatest-by-score with deterministic tie order: fold over languages
    val scored: Seq[(String, Column)] = LangMarkers.map { case (lang, words) =>
      lang -> size(array_intersect(toks,
        array(words.map(lit): _*)))
    }
    val best = scored.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    best._1
  }

  /** 64-bit SimHash over token xxhash64 hashes. Delegates to the native
    * codegen'd expression ([[graft.functions.SimHash64]]); [[simhash64Fold]]
    * is the declarative reference semantics (bit-identical — asserted in
    * SimilaritySpec). */
  def simhash64(toks: Column): Column =
    graft.functions.SimHash64.simhash64(toks)

  /** Declarative fold form: per-bit votes accumulated with
    * aggregate/zip_with, then recombined — O(tokens × 64) lambda evals,
    * kept as the portable definition of record. */
  private[graft] def simhash64Fold(toks: Column): Column = {
    // functions.shiftright/shiftleft only take Int amounts; the SQL
    // expressions accept column amounts — reach them via call_function.
    def shr(c: Column, i: Column) = call_function("shiftright", c, i)
    def shl(c: Column, i: Column) = call_function("shiftleft", c, i)
    val hashes = transform(toks, t => xxhash64(t))
    val zeros = transform(sequence(lit(0), lit(63)), _ => lit(0L))
    val votes = aggregate(hashes, zeros,
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(shr(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, shl(lit(1L), i)).otherwise(0L)),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** PII scrub: redact email-shaped and long-digit-run (phone/ID) spans.
    * Regexes restricted to the RE2∩Java subset so SQL oracles mirror them. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[0-9][0-9 ().-]{7,}[0-9]", "<PHONE>")

  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))),
    size(regexp_extract_all(text, lit("[0-9][0-9 ().-]{7,}[0-9]"), lit(0))))

  /** Canonical text normalization for dedup keys: lowercase, collapse
    * whitespace runs to single spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))
}
