package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, shingling
  * and document fingerprinting.
  *
  * Everything here is a pure Column expression built from
  * `org.apache.spark.sql.functions` higher-order array functions — no
  * UDFs, so the whole pipeline stays inside whole-stage codegen and is
  * embarrassingly parallel per-row (no shuffle) at any scale.
  *
  * The reference has no text functions at all (SURVEY.md §2.8: eland's
  * scalar surface is arithmetic-only, eland/arithmetics.py) — this
  * module is the parity-plus/north-star extension.
  */
object TextAnalysis {

  /** Evaluate `c` exactly once per row and hand the result to `f` as
    * a LAMBDA-BOUND variable — the hard staging barrier projection
    * aliases do not give: the optimizer (CollapseProject, predicate
    * pushdown) freely substitutes alias references with their defining
    * expression, and any substitution landing inside a higher-order-
    * function lambda re-evaluates it once per ELEMENT (the arr1 rule's
    * failure mode — a tokenizer inlined into a shingle lambda runs
    * once per position; measured 100x slowdowns). A lambda variable
    * cannot be substituted into: references inside `f` stay O(1)
    * reads of the already-evaluated value no matter what the
    * optimizer rewrites around it. Spelled as a 1-element
    * transform + element_at, both codegen-fallback but evaluated once.
    */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), v => f(v)), 1)

  /** num/den as a double, 0.0 on an empty denominator — the shared
    * fraction convention of the Gopher signal families ([[graft.
    * operators.Repetition]] / [[graft.operators.QualityRules]]): a
    * single division of exactly-counted integers, so engines agree
    * bit for bit.
    */
  def safeRatio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))
      .otherwise(lit(0.0))

  /** `re`-split units of `text`, trimmed, empties dropped — the shared
    * line/paragraph splitter of the Gopher families (CRLF-safe with
    * `\r?\n`-style patterns).
    */
  def trimmedNonEmptyUnits(text: Column, re: String): Column =
    filter(transform(split(text, re), u => trim(u)), u => u =!= "")

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Driver-side twin of [[tokens]] (same lowercase, same split, same
    * empty-drop) — the [[EnglishMinimalStem.stemString]] discipline:
    * anything that analyzes query/like text driver-side MUST route
    * through this so document-side and driver-side tokenization cannot
    * drift independently.
    */
  def tokensOf(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").toSeq.filter(_.nonEmpty)

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: splits on non-alphanumerics and
    * letter/digit boundaries — a cheap stand-in for a real tokenizer's
    * token count at corpus-costing time.
    *
    * Spelled as "count the maximal letter-runs and digit-runs"
    * (`\p{L}+|\p{N}+` matches), which is the same piece count as the
    * historical lookbehind-split form ([[subwordCountEstimateSplit]],
    * differential-tested) — but the run-counting regex has no
    * lookarounds, so it is RE2-expressible and the DuckDB oracle can
    * replay it verbatim (`regexp_extract_all` in both engines).
    */
  def subwordCountEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\p{L}+|\\p{N}+"), lit(0))).cast("long")

  /** Historical lookbehind-split spelling of [[subwordCountEstimate]],
    * kept as the differential-test reference (Java-regex-only; splits
    * on non-alphanumeric runs and letter↔digit boundaries).
    */
  private[graft] def subwordCountEstimateSplit(text: Column): Column =
    size(filter(
      split(lower(text),
        "[^\\p{L}\\p{N}]+|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => length(t) > 0)).cast("long")

  /** Marker stopwords per language for the stopword-profile heuristic
    * language identifier. Deliberately tiny and deterministic.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "que", "es"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "it" -> Seq("il", "di", "che", "la", "per", "non"))

  private def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Heuristic language ID: argmax of marker-stopword hit counts with
    * deterministic first-wins tie-breaking in `langMarkers` order;
    * "und" (undetermined) when no marker hits at all.
    *
    * PERFORMANCE: this convenience form re-embeds the tokenizer
    * expression at every marker-count reference, and interpreted HOF
    * subtrees are not CSE'd (the arr1/minhash staging rule) — a
    * pipeline touching many rows should materialize `tokens(text)` in
    * its own projection and call [[languageIdFromTokens]].
    */
  def languageId(text: Column): Column = languageIdFromTokens(tokens(text))

  /** [[languageId]] over an already-materialized token array: each
    * marker probe is then a cheap scan of the staged array instead of
    * a fresh tokenize (g20 measured ~9 redundant tokenizer passes per
    * row through the convenience form).
    */
  def languageIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.map { case (l, ws) => l -> markerHits(toks, ws) }
    val best = scores.map(_._2).reduce(greatest(_, _))
    scores.reverse.foldLeft(lit("und")) { case (els, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /** Quality-score feature bundle as one struct column: character
    * count, token count, mean token length, stopword ratio (English
    * markers), non-alphanumeric ratio.
    *
    * Same staging note as [[languageId]]: prefer
    * [[qualityFeaturesFromTokens]] with a materialized token column in
    * hot pipelines.
    */
  def qualityFeatures(text: Column): Column =
    qualityFeaturesFromTokens(text, tokens(text))

  /** [[qualityFeatures]] over an already-materialized token array. */
  def qualityFeaturesFromTokens(text: Column, toks: Column): Column = {
    val n = size(toks)
    val charLen = length(text).cast("double")
    val meanTokLen = when(n > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / n).otherwise(lit(0.0))
    val stopRatio = when(n > 0,
      markerHits(toks, langMarkers.head._2).cast("double") / n)
      .otherwise(lit(0.0))
    val nonAlnum = when(charLen > 0,
      (charLen - length(regexp_replace(text, "[\\p{L}\\p{N} ]", ""))
        .cast("double")) / charLen).otherwise(lit(0.0))
    struct(
      charLen.cast("long").as("n_chars"),
      n.cast("long").as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      stopRatio.as("stopword_ratio"),
      nonAlnum.as("non_alnum_ratio"))
  }

  /** PII patterns — deliberately RE2-expressible (no lookarounds), so
    * the DuckDB oracle replays redaction verbatim. Lowercase-corpus
    * forms; widen with (?i) for mixed-case inputs.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"

  /** Count of matches of `re` in `text` — per-row expression, no
    * shuffle (audit metric for redaction sweeps).
    */
  /** HTML → text stripping, the first pass any web-crawl curation
    * runs: script/style blocks vanish wholesale (their CONTENT is
    * code, not text), remaining tags become spaces, the six
    * entities that dominate real HTML unescape (&amp;nbsp; &amp;lt;
    * &amp;gt; &amp;quot; &amp;#39; then &amp;amp; LAST, so
    * double-escaped text like "&amp;amp;lt;" correctly stops at
    * "&amp;lt;"), and whitespace runs collapse. Pure
    * regexp/replace column ops with RE2-SAFE patterns (inline (?is)
    * flags and lazy quantifiers only, no backreferences or
    * lookarounds) — replayable by any engine.
    */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** Unicode normalization (UAX #15) — see
    * [[graft.plans.UnicodeNormalize]]: codegen wrapper over the JDK
    * normalizer with an isNormalized fast path. Exact dedup over
    * mixed-normalization crawls needs this FIRST (precomposed vs
    * combining-mark spellings of the same page hash differently).
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    graft.plans.UnicodeNormalize(text, form)

  /** Accent folding: NFD-decompose, then strip every combining mark
    * (`\p{M}`) — the diacritic normalization multilingual dedup and
    * search pipelines run before matching ("café" ≡ "cafe" ≡
    * "cafe" + U+0301). Precomposed and decomposed spellings fold to
    * the same bytes by construction. For Latin-script text this
    * agrees with DuckDB's `strip_accents` (verified both input
    * forms), which is what the oracle replays;
    * [[normalizeUnicode]]'s isNormalized fast path keeps ASCII
    * corpora at scan cost — already-NFD text is returned untouched
    * and the regex is the only pass.
    */
  def stripAccents(text: Column): Column =
    regexp_replace(normalizeUnicode(text, "NFD"), "\\p{M}", "")

  /** RFC 3986 §6.2 syntax-based URL normalization, the CCNet/WET
    * dedup-key recipe: lowercase scheme and host, drop the fragment,
    * drop the scheme's default port (:80 http, :443 https), empty
    * path → "/", plus the curation-common extras — strip a leading
    * "www." (on by default) and optionally the whole query string.
    * Path/query case is PRESERVED (case-significant per the RFC). A
    * string with no scheme is returned trimmed but otherwise
    * untouched (not a URL — don't invent one). Pure regexp/concat
    * column ops (RE2-safe patterns), replayable by any engine with
    * regexp_extract/regexp_replace.
    */
  def normalizeUrl(u: Column, stripWww: Boolean = true,
                   stripQuery: Boolean = false): Column = {
    val t = trim(u)
    val noFrag = regexp_replace(t, "#.*$", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    // case normalization applies to scheme and HOST only (RFC 3986
    // §6.2.2.1): userinfo is case-significant and passes through
    val authRaw =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1)
    val userinfo = regexp_extract(authRaw, "^([^@]*@)", 1)
    val hostRaw = lower(regexp_replace(authRaw, "^[^@]*@", ""))
    val host0 =
      if (stripWww) regexp_replace(hostRaw, "^www\\.", "") else hostRaw
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val pathq0 = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*(.*)$", 1)
    val pathq1 =
      if (stripQuery) regexp_replace(pathq0, "\\?.*$", "") else pathq0
    val pathq = when(pathq1 === "", lit("/")).otherwise(pathq1)
    when(scheme === "", t)
      .otherwise(concat(scheme, lit("://"), userinfo, host, pathq))
  }

  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact emails then phone numbers. Chained regexp_replace —
    * codegen'd, applied in a fixed order so the oracle's chained
    * form is byte-identical.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** IPv4 candidates (octet range not validated — candidate
    * redaction, the conservative sweep) and 16-digit card candidates
    * in the common 4×4 groupings with optional single separators.
    * RE2-safe (\\b is an RE2 ASCII word boundary).
    */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val CardRe = "\\b[0-9]{4}([ -]?[0-9]{4}){3}\\b"

  /** Luhn checksum over a digit string (ISO/IEC 7812 — the public
    * card-number check digit): every second digit from the RIGHT
    * doubles (9-wrapped), the total must divide by 10. Pure
    * integer HOF arithmetic — DuckDB replays it with list indexing
    * over `range` — so card-candidate redaction can be VALIDITY-GATED
    * instead of nuking every 16-digit number (order ids, timestamps).
    */
  def luhnValid(digits: Column): Column = bindOnce(digits) { m =>
    val ds = transform(array_remove(split(m, ""), ""), c => c.cast("int"))
    val n = size(ds)
    val total = aggregate(
      zip_with(ds, sequence(lit(1), n), (d, j) =>
        when(pmod(n - j, lit(2)) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
      lit(0), (a, x) => a + x)
    pmod(total, lit(10)) === 0
  }

  /** [[redactPii]] plus IPv4 candidates → `<IP>` and LUHN-VALID card
    * candidates → `<CC>`: card matches extract first
    * (regexp_extract_all), each distinct match validates via
    * [[luhnValid]] on its separator-stripped digits, and only the
    * validated matches fold through literal `replace` — an invalid
    * 16-digit number (a fixture id, a timestamp) survives untouched.
    * Every step is engine-replayable (list_filter + list_reduce +
    * replace on the DuckDB side).
    */
  def redactPiiExtended(text: Column): Column = {
    val ip = regexp_replace(redactPii(text), Ipv4Re, "<IP>")
    bindOnce(ip) { t =>
      aggregate(
        filter(array_distinct(
            regexp_extract_all(t, lit(CardRe), lit(0))),
          m => luhnValid(regexp_replace(m, "[ -]", ""))),
        t, (acc, m) => replace(acc, m, lit("<CC>")))
    }
  }

  /** Word n-gram shingles ("w1 w2 w3"); empty array when too short.
    *
    * NOTE the transform lambda references the token array per shingle
    * position, and interpreted HOF subtrees are not CSE'd — so this
    * convenience form re-runs the tokenizer O(positions) times per
    * row. In anything hot, stage `tokens(text)` in its own projection
    * and use [[shinglesFromTokens]] (the arr1 rule).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[shingles]] over an already-materialized token array column —
    * the staged spelling for hot pipelines: the lambda's repeated
    * references hit a cheap attribute, not a recomputed regex split.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Rolling polynomial document fingerprint over tokens, mod 1e9+7.
    * Order-sensitive (unlike a bag-of-words hash), so re-ordered
    * documents fingerprint differently.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      pmod(acc * 31 + pmod(xxhash64(t), lit(1000000007L)), lit(1000000007L)))

  /** Engine-portable variant of [[fingerprint]]: the per-token hash is
    * the first 8 hex chars of md5 (a 32-bit value every engine can
    * reproduce) instead of xxhash64, folded through the same
    * order-sensitive polynomial mod 1e9+7. Cross-engine replayable —
    * DuckDB recomputes it exactly with
    * `list_reduce(list_prepend(0, list_transform(toks, t ->
    * ('0x'||substr(md5(t),1,8))::BIGINT)), (a,b) -> (a*31+b) %
    * 1000000007)` — so content-addressed dedup/versioning decisions
    * made on the fingerprint can be audited outside Spark. Slower than
    * [[fingerprint]] (md5 vs xxhash64): use this one at system
    * boundaries, the xxhash64 form in interior passes.
    */
  def fingerprintPortable(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      pmod(acc * 31 + conv(substring(md5(t), 1, 8), 16, 10).cast("long"),
        lit(1000000007L)))

  /** 64-bit SimHash over tokens: per bit, the sign of the sum of ±1
    * contributions from each token hash. Pure per-row expression, no
    * shuffle. The 64 bit positions are unrolled at plan-build time
    * (Scala Ints) so all shifts are literal and codegen-friendly;
    * token hashes are computed once into an array first.
    */
  /** Native single-pass codegen form (plans.TokenSimHash) —
    * bit-identical to the HOF sketch below, which is retained as the
    * differential-test reference.
    */
  def simhash64(text: Column): Column = graft.plans.TokenSimHash(text)

  def simhash64Hof(text: Column): Column = {
    // one expression tree: token hashes materialize once into an array;
    // per token the 64 ±1 contributions come from cheap mask ANDs
    // (64 separate top-level aggregates would re-hash every token per
    // bit and blow up codegen)
    val masks = lit((0 until 64).map(i => 1L << i).toArray)
    val hs = transform(tokens(text), t => xxhash64(t))
    val counts = aggregate(
      hs,
      transform(sequence(lit(0), lit(63)), _ => lit(0)),
      (acc, h) => zip_with(acc,
        transform(masks, m => when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** Engine-portable 60-bit SimHash: the per-token hash is the first
    * 15 md5 hex chars (60 bits — comfortably inside signed-BIGINT
    * range in every engine), folded through the same sign-of-sums
    * sketch as [[simhash64Hof]]. Cross-engine replayable — DuckDB
    * recomputes it with `('0x'||substr(md5(t),1,15))::BIGINT` per
    * token and a per-bit ±1 sum — which turns the SimHash family from
    * rows-only to fully oracle-checked. Like [[fingerprintPortable]]:
    * use at system boundaries; the native codegen [[simhash64]] is
    * the interior fast path.
    */
  def simhashPortable(text: Column): Column = {
    val masks = lit((0 until 60).map(i => 1L << i).toArray)
    val hs = transform(tokens(text), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val counts = aggregate(
      hs,
      transform(sequence(lit(0), lit(59)), _ => lit(0)),
      (acc, h) => zip_with(acc,
        transform(masks, m => when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (a, b) => a + b))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** Hamming distance between two simhash64 values. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")
}
