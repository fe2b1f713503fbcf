package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column expressions.
  *
  * All of these are composed from built-in (codegen'd) functions — no Scala
  * UDFs in the hot path, so they stay inside WholeStageCodegen and scale to
  * 100 TB without serialization overhead.
  *
  * Tokenizer: the operator shape of the reference's IK-analyzer UDTF
  * (ref: realtime-dws/.../function/KwSplit.java:17-25, util/IKUtil.java:18-34)
  * — string in, token rows out via explode. The reference dedupes tokens
  * (IKUtil uses a Set); `tokenizeDistinct` mirrors that.
  */
object Text {

  /** Lowercase word tokens; empty strings filtered out. */
  def tokenize(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Token set (order-preserving distinct), matching IKUtil's Set semantics. */
  def tokenizeDistinct(c: Column): Column = array_distinct(tokenize(c))

  /** Han codepoint range (CJK Unified Ideographs, U+4E00–U+9FFF) as a regex
    * char class — written with literal chars so the identical pattern runs in
    * both Java regex (Spark) and RE2 (DuckDB oracle).
    */
  private val HanRange = "一-鿿"
  private val HanClass = s"[$HanRange]"

  /** Script-aware tokenizer — the CJK-capable tier of the reference's IK
    * Chinese analyzer (ref: realtime-dws/.../function/KwSplit.java:17-25,
    * realtime-common/.../util/IKUtil.java:18-34). The gmall keyword stream
    * is Chinese text; a latin-only split deletes it entirely, so:
    *   - latin/digit runs tokenize as before (lowercased words),
    *   - cyrillic runs tokenize as whole words (space-delimited script,
    *     same treatment as latin — without this every doc the `ru` langId
    *     tier admits would tokenize to NOTHING), and
    *   - han spans emit overlapping codepoint bigrams (the IK-smart-style
    *     unit for unsegmented Chinese; a 1-char span emits itself),
    * in one pass: extract `han+|latin+|cyr+` spans, then expand each span.
    * The outer HOF lambdas bind the already-extracted span attribute
    * (never the document), so nothing is re-derived per element — one
    * narrow codegen'd extract plus an interpreted expansion over short
    * spans. Only lowercase `а-яё` appears in the span class: the input is
    * lowercased first (both engines case-fold cyrillic).
    */
  def tokenizeCjk(c: Column): Column = {
    // ONE native codepoint walk (plans/TokenizeCjk.scala, r12): the
    // composed regexp_extract_all + interpreted span-expansion lambdas
    // below ([[tokenizeCjkSpec]]) ran per-element interpreted — the
    // hot-path shape the native-walk fusions measure at 3–50×.
    // Token-identity is pinned in OperatorsSpec on every script tier.
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.plans.TokenizeCjk(ColumnBridge.expression(c)))
  }

  /** The composed-builtin EXECUTABLE SPEC of [[tokenizeCjk]] — kept
    * (not on any query path) so the parity test pins the native walk
    * against the exact span/expansion semantics documented above.
    * U+0130 (İ) is pre-mapped to 'i': it is Unicode's ONE unconditional
    * 1:N lowercase (İ → i + combining U+0307 under Java's full
    * mapping), while the native walk's per-codepoint fold and DuckDB's
    * utf8proc lower() are both 1:1 — without the translate, the spec
    * alone would split "İstanbul" into ["i","stanbul"] where walk and
    * oracle agree on ["istanbul"].
    */
  private[graft] def tokenizeCjkSpec(c: Column): Column = {
    val spans = regexp_extract_all(lower(translate(c, "İ", "i")),
      lit(s"$HanClass+|[a-z0-9]+|[а-яё]+"), lit(0))
    flatten(transform(spans, sp =>
      when(sp.rlike(s"^$HanClass"),
        when(length(sp) === 1, array(sp))
          .otherwise(transform(sequence(lit(1), length(sp) - 1),
            i => sp.substr(i, lit(2)))))
        .otherwise(array(sp))))
  }

  /** Whitespace token count — cheap path for quota/length accounting. */
  def wsTokenCount(c: Column): Column = size(split(trim(c), "\\s+"))

  /** BPE-ish subword count: word-piece regex (letter runs, digit runs,
    * punctuation singletons) as a proxy for tokenizer cost at scale.
    * RE2-compatible pattern so the DuckDB oracle can mirror it.
    */
  def bpeishTokenCount(c: Column): Column = size(bpeishTokens(c))

  /** The BPE-ish token ARRAY behind [[bpeishTokenCount]] — the pack
    * materializer slices it, so count and content can never disagree.
    */
  def bpeishTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Canonical normalization for fingerprinting: lowercase, strip
    * non-alphanumerics to single spaces, trim.
    */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Deterministic document fingerprint = md5 of normalized text.
    * (md5 is available in both Spark and DuckDB → oracle-checkable;
    * at 100 TB this is one codegen'd pass, no shuffle.)
    */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Character-shingle array of size k over an ALREADY-MATERIALIZED
    * normalized-text column (see wordShingles for why the input must be an
    * attribute, not an inline expression: interpreted HOF lambdas would
    * re-normalize per shingle index).
    */
  def charShingles(norm: Column, k: Int): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(length(norm) - k, lit(0))),
        i => substring(norm, lit(1) + i, lit(k))))

  /** Word n-gram shingles (space-joined) over an ALREADY-MATERIALIZED token
    * array column. Taking the raw text here would inline `tokenize` into
    * the per-element lambda: higher-order functions run interpreted with no
    * common-subexpression reuse, so each shingle index would re-tokenize
    * the whole document — measured 10x slower. Callers materialize tokens
    * in a prior stage (attribute reference), then shingle.
    */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  private[graft] val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
      "for", "on", "with", "as", "at", "by", "be", "this", "that")

  /** Fraction of tokens that are English stopwords — the classic cheap
    * quality / language signal.
    */
  def stopwordRatio(c: Column): Column = {
    val toks = tokenize(c)
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast("double")
        / size(toks).cast("double"))
  }

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0)).otherwise(
      (length(c) - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", "")))
        .cast("double") / length(c).cast("double"))

  /** Cyrillic codepoint class (а–я U+0430–044F, А–Я U+0410–042F, plus ё/Ё
    * which live outside the contiguous range) — literal chars so the
    * identical pattern runs in Java regex (Spark) and RE2 (DuckDB).
    */
  private val CyrRange = "а-яА-ЯёЁ"

  /** N-gram-heuristic language ID, script tiers first: zh when ≥30% of
    * characters are han codepoints, ru when ≥30% are cyrillic (same
    * integer math so both engines agree exactly), en if any English
    * stopword appears, digits-only → "num", else "other". Deterministic
    * and SQL-expressible so the DuckDB oracle can replicate it
    * bit-for-bit.
    */
  def langId(c: Column): Column = {
    val toks = tokenize(c)
    val hanChars = length(regexp_replace(c, s"[^$HanRange]", ""))
    val cyrChars = length(regexp_replace(c, s"[^$CyrRange]", ""))
    when(length(c) > 0 && hanChars * 10 >= length(c) * 3, lit("zh"))
      .when(length(c) > 0 && cyrChars * 10 >= length(c) * 3, lit("ru"))
      .when(size(filter(toks, t => t.isin(stopwords.map(lit): _*))) > 0, lit("en"))
      .when(c.rlike("^[0-9\\s\\p{Punct}]*$"), lit("num"))
      .otherwise(lit("other"))
  }
}
