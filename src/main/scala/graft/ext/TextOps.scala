package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table (north-star extensions, SURVEY.md §2.4): token
  * counting, quality scoring, language-ID, fingerprinting, shingling.
  *
  * Everything is expression-based (no UDFs) — whole-stage codegen end to
  * end, linear scans with at most one shuffle per aggregate, so each
  * operator scales to arbitrarily many documents.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokens). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count approximation: whitespace tokens plus an extra
    * unit per 6 characters of word length beyond the first 6 — a
    * deterministic, regex-free stand-in for a real tokenizer's
    * length-scaling behavior.
    */
  def approxSubwordCount(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, w) => acc + lit(1L) + floor(length(w) / lit(6)).cast("long"))

  /** Word n-gram shingles (n ≥ 1) as an array of strings, empty when the
    * document has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** [[shingles]] over a token-array Column. Column expressions are
    * TREES, not bindings — passing `tokens(text)` here plants the split
    * under every one of the ~2n `element_at` references, so the split
    * re-evaluates that many times per row. Call sites that EXPLODE the
    * gram list should project the token array into a named column first
    * (a projection boundary; `CollapseProject` refuses to inline a
    * non-cheap alias referenced more than once, so the binding sticks) —
    * measured 5.3 s → 0.9 s on q105's corpus gram scan at sf0.1.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingle set (the MinHash/Jaccard input) — single-pass
    * [[graft.functions.ShingleSetExpr]]; semantically
    * `array_distinct(shingles(text, n))`.
    */
  def shingleSet(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ShingleSetExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: language-ID at scale is a per-row scalar
    * scan; the lists are the model.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "de", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  private def stopwordHits(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    words.map(w => size(filter(toks, t => t === w)).cast("long"))
      .reduce(_ + _)
  }

  /** Language-ID: argmax of stopword hits with deterministic tie-break
    * (first language in list order wins; `und` when nothing matches).
    */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val (firstLang, firstScore) = scores.head
    scores.tail
      .foldLeft(when(firstScore > 0 && firstScore === best, lit(firstLang))) {
        case (acc, (lang, s)) => acc.when(s > 0 && s === best, lit(lang))
      }
      .otherwise(lit("und"))
  }

  /** Heuristic quality score in [0,1]:
    * 0.4·min(tokens/50,1) + 0.3·(distinct/total tokens) +
    * 0.3·min(avgWordLen/8,1). Pure per-row scalar double math —
    * order-stable and oracle-reproducible.
    */
  def qualityScore(text: Column): Column = {
    val total = tokenCount(text).cast("double")
    val distinctToks = size(array_distinct(tokens(text))).cast("double")
    val avgLen = (length(text).cast("double") - (total - 1)) / total
    lit(0.4) * least(total / 50.0, lit(1.0)) +
      lit(0.3) * (distinctToks / total) +
      lit(0.3) * least(avgLen / 8.0, lit(1.0))
  }

  /** [[qualityScore]] in exact integer parts-per-million. The double
    * version's components are simple rationals (distinct/total etc.) that
    * frequently land on exact round() boundaries, where Spark's
    * BigDecimal HALF_UP and other engines' double rounding disagree by
    * 1e-4 — observed in cross-engine verification. Integer floor-division
    * is bit-exact everywhere: 400000·min(total,50)/50 +
    * 300000·distinct/total + min(300000, 300000·avgLenNum/(8·total)).
    */
  def qualityScorePpm(text: Column): Column = {
    val total = tokenCount(text)
    val distinctToks = size(array_distinct(tokens(text))).cast("long")
    val avgLenNum = length(text).cast("long") - (total - 1)
    val p1 = lit(8000L) * least(total, lit(50L))
    val p2 = floor(lit(300000L) * distinctToks / total).cast("long")
    val p3 = least(lit(300000L),
      floor(lit(300000L) * avgLenNum / (lit(8L) * total)).cast("long"))
    p1 + p2 + p3
  }

  /** Punctuation set folded to spaces by [[normalize]]. */
  val punctuation = ".,!?;:()[]{}\"'-"

  /** Text normalization for dedup/pretraining: lowercase, punctuation →
    * space, whitespace collapse, trim. Built from `translate` plus ONE
    * trivial regex (`" +"`) so Java (Spark) and RE2 (DuckDB et al.) agree
    * character-for-character — POSIX classes and unicode properties are
    * exactly where regex dialects diverge. Non-ASCII letters (CJK,
    * accents) pass through untouched.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      translate(lower(text), punctuation, " " * punctuation.length),
      " +", " "))

  /** Email pattern shared with the SQL oracle (plain classes only — same
    * semantics under Java regex and RE2).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-like run: 9–15 actual digits (optional leading +) with at most
    * 3 separator chars (space/()-) between consecutive digits. The digit
    * COUNT bound — not a raw character count — keeps ISO dates
    * (`2024-01-01`, 8 digits) and small thousand-separated numbers
    * (`1 000 000`, 7 digits) unredacted. Deliberate over-match, documented:
    * any bare ≥9-digit run (account-number-ish ids, `1 000 000 000`) still
    * redacts — for a pretraining scrub, erring toward redaction on long
    * digit runs is the safer default.
    */
  val phoneRe = "\\+?[0-9](?:[()\\- ]{0,3}[0-9]){8,14}"

  /** PII scrubbing: emails → `<EMAIL>` first (removing their digits), then
    * phone-like runs → `<PHONE>`. Linear per-row scan, no shuffle.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")

  /** 128-bit content fingerprint (exact-dup key). */
  def fingerprint(text: Column): Column = Hashing.fingerprint(text)

  /** Winnowing-style rolling fingerprint: minimum 32-bit hash over the
    * document's 3-gram shingles — robust to local edits, cheap to band.
    */
  def rollingFingerprint(text: Column, n: Int = 3, seed: Int = 0): Column =
    array_min(transform(shingleSet(text, n), s => Hashing.md5Hash32(seed, s)))

  /** Gopher-style repetition signals, integer-exact (ppm / centichars so
    * every engine agrees bit-for-bit). Per document:
    *  - `n_tokens` — whitespace token count;
    *  - `dup_word_ppm` — fraction of tokens that are repeats of an
    *    earlier token, ppm (Gopher's duplicate-word-fraction rule);
    *  - `dup_bigram_ppm` — same over positional word bigrams (repeated
    *    phrases score high even when individual words differ);
    *  - `mean_word_len_c` — mean word length in centichars (Gopher drops
    *    docs with extreme mean word length).
    * Pure per-row scalar scan: no shuffle, linear at any corpus size.
    * Expression-tree caveat (see [[shinglesFromTokens]]): the bigram
    * columns embed the token split several times per reference; callers
    * scanning a large corpus for ONLY the bigram signals should bind
    * `tokens(text)` behind a projection first — the flat word-level
    * columns (what the curation funnel consumes) evaluate the split a
    * constant number of times and need no such care.
    */
  def repetitionStats(text: Column): (Column, Column, Column, Column) = {
    val toks = tokens(text)
    val total = size(toks).cast("long")
    val uniq = size(array_distinct(toks)).cast("long")
    val bi = shingles(text, 2)
    val nBi = size(bi).cast("long")
    val uniqBi = size(array_distinct(bi)).cast("long")
    val dupWordPpm = floor((total - uniq) * 1000000L / total).cast("long")
    val dupBigramPpm = when(nBi > 0, floor((nBi - uniqBi) * 1000000L / nBi))
      .otherwise(0L).cast("long")
    val meanLenC = floor((length(text).cast("long") - (total - 1)) * 100L / total)
      .cast("long")
    (total, dupWordPpm, dupBigramPpm, meanLenC)
  }

  /** Blocklist screening — the word-list heuristic gate (NSFW/toxicity
    * lists) every pipeline runs BEFORE any model-based classifier:
    * occurrence count of blocklisted tokens and their ppm share of the
    * doc's tokens (integer-exact, so the oracle matches bit for bit).
    * ONE pass over the token array — the membership test is an inlined
    * IN-set per element, not a filter per word like the (5-word)
    * stopword tables use — no shuffle, linear at any corpus size. Real
    * deployments load the list from config; it broadcasts by inlining
    * into the plan, so hundreds of words cost literal-array space, not a
    * join.
    */
  def blocklistStats(text: Column, words: Seq[String]): (Column, Column) = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isInCollection(words))).cast("long")
    val total = size(toks).cast("long")
    val ppm = when(total > 0, floor(hits * 1000000L / total)).otherwise(0L).cast("long")
    (hits, ppm)
  }

  /** [[blocklistStats]] as a single gate predicate: true iff the
    * blocked-token share is at or under `maxPpm` (default 0 = any hit
    * rejects). Stateless scalar expression — batch and streaming apply
    * it identically, which is what makes batch/stream verdict parity
    * provable (`CorpusCurationSpec`).
    */
  def blocklistOk(text: Column, words: Seq[String], maxPpm: Long = 0L): Column =
    blocklistStats(text, words)._2 <= maxPpm

  /** The q86 quality funnel collapsed to ONE codegen predicate over the
    * text alone: minimum length, token-count range, Gopher duplicate-word
    * cap, and mean-word-length band (centichars). q86 reads the fixture's
    * stored `n_chars` for its first stage; here `length(text)` stands in
    * so the predicate works on any text column — including a stream with
    * no precomputed stats. Thresholds default to q86's constants.
    * Stateless, no shuffle — safe in batch filters and streaming ingest
    * alike.
    */
  def qualityFunnelOk(
      text: Column,
      minChars: Long = 200L,
      minTokens: Long = 30L,
      maxTokens: Long = 2000L,
      maxDupWordPpm: Long = 300000L,
      minMeanWordLenC: Long = 300L,
      maxMeanWordLenC: Long = 1000L): Column = {
    val (nTok, dupW, _, mwl) = repetitionStats(text)
    length(text).cast("long") >= minChars &&
      nTok.between(minTokens, maxTokens) &&
      dupW < maxDupWordPpm &&
      mwl.between(minMeanWordLenC, maxMeanWordLenC)
  }

  /** URL pattern shared with the SQL oracles — plain character classes
    * only, so Java regex and RE2 agree.
    */
  val urlRe = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"

  /** All URLs in a document (regexp_extract_all — codegen'd, per-row). */
  def urls(text: Column): Column = regexp_extract_all(text, lit(urlRe), lit(0))

  /** Registrable domain of a URL string: the host with at most its last
    * two labels kept (`a.b.c.example.com` → `example.com`).
    */
  def urlDomain(url: Column): Column = {
    val host = regexp_extract(url, "https?://([A-Za-z0-9.-]+)", 1)
    val parts = split(host, "\\.")
    when(size(parts) <= 2, host)
      .otherwise(concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
  }

  /** Integer percentile rank (ppm) of a score within its key group —
    * the per-language/-source score CALIBRATION step that makes one
    * quality threshold meaningful across strata (a raw cutoff tuned on
    * English silently guts low-resource languages; a percentile cutoff
    * keeps each stratum's top X%). `pct_ppm = (rank-1)·10⁶ div (n-1)`
    * with RANK (ties share), so equal scores calibrate equally and the
    * result is integer-exact; single-member groups get 0. NULL scores
    * sort FIRST explicitly (Spark's asc default, pinned so the oracle's
    * NULLS LAST default can't diverge).
    *
    * Scale shape: `ops.Stats.pctRankPpmByKey` — the keyed
    * histogram-rank engine (`Stats.cumHistByKey`): one hash aggregate
    * to (key, value) cells, the distributed per-key prefix sum, and an
    * equi-join back. A dominant stratum (en ≈ half the web) costs a
    * hash-aggregate spread over its distinct scores — the
    * `Window.partitionBy(key).orderBy(score)` formulation this
    * replaced routed that stratum's whole slice through one reducer.
    * RANK ties (a (key, value) cell shares one rank) and NULLS FIRST
    * fall out of the cell decomposition by construction.
    */
  def percentileRankPpm(
      df: DataFrame,
      keyCol: Column,
      scoreCol: Column
  ): DataFrame =
    graft.ops.Stats.pctRankPpmByKey(df, keyCol, scoreCol)

  /** Phrase occurrence stats — exact ADJACENT-token phrase matching,
    * the positional-index query of a search engine (q77's index and
    * q78's boolean search are term-level; this is the "quoted query").
    * Returns `(n_hits, first_pos)`: occurrence count (overlapping
    * occurrences each count — 'b b b' contains 'b b' twice) and the
    * 0-based token position of the first, NULL when absent. Pure
    * array-lambda scan per row — no self-join of positional postings,
    * no shuffle; at index scale the same predicate applies AFTER an
    * inverted-index candidate fetch on the phrase's rarest term.
    */
  def phraseStats(text: Column, phrase: Seq[String]): (Column, Column) = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val m = phrase.length
    // BIND the token array once per row (the chunkTokens idiom): a
    // lambda body referencing the outer tokens(text) expression
    // re-evaluates the split PER CANDIDATE POSITION under interpreted
    // HOF evaluation — O(positions × chars) per row, which wedged the
    // hostile-fixture 10 MB document for >180 s.
    // descending-sequence guard: Spark's sequence(1, n) auto-reverses
    // for n < 1, which would fabricate bogus start positions for docs
    // shorter than the phrase
    val starts = flatten(transform(array(tokens(text)), tk =>
      when(size_(tk) >= m,
        filter(sequence(lit(1), size_(tk) - (m - 1)), i =>
          phrase.zipWithIndex
            .map { case (w, j) => element_at(tk, i + j) === lit(w) }
            .reduce(_ && _)))
        .otherwise(array().cast("array<int>"))))
    // try_element_at: ANSI mode makes element_at THROW on the empty
    // no-hit array instead of returning NULL
    (size_(starts).cast("long"),
      (try_element_at(starts, lit(1)) - 1).cast("long"))
  }

  /** Canonical URL form for URL-level dedup — the normalization every
    * web-crawl pipeline runs before treating URLs as document keys:
    * drop the fragment, lowercase the scheme+authority (path case is
    * preserved — it is significant on real servers), strip default
    * ports (`:80` http / `:443` https), remove tracking parameters
    * (`utm_*`, `fbclid`, `gclid`), collapse the dangling `?`/`&`
    * separators the removal leaves behind, and drop one trailing
    * slash. Pure regexp_replace/regexp_extract chain — codegen end to
    * end, no UDF, no shuffle — written lookbehind/backtracking-free so
    * Java regex here and RE2 in the DuckDB oracle accept the same
    * language (the only replacement backreference, `$1`, is spelled
    * `\1` on the DuckDB side).
    */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    val authLower = lower(auth)
    val authNoPort = regexp_replace(
      regexp_replace(authLower, "^(http://[^/:]*):80$", "$1"),
      "^(https://[^/:]*):443$", "$1")
    val rest = noFrag.substr(length(auth) + 1, length(noFrag))
    val joined = concat(authNoPort, rest)
    // anchored on the [?&] separator (kept via $1) so 'xutm_source=5'
    // or a path segment containing 'fbclid=' never matches — only a
    // real parameter position does. The trailing '&' is deliberately
    // NOT consumed: consuming it would swallow the anchor of a
    // CONSECUTIVE tracking param in the same global pass ('?utm_a=1&
    // utm_b=2' would keep utm_b); instead the leftover separators are
    // collapsed below.
    val noTrack = regexp_replace(joined,
      "([?&])(?:utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "$1")
    val oneAmp = regexp_replace(noTrack, "&&+", "&")
    val fixedSep = regexp_replace(oneAmp, "\\?&", "?")
    val noDangle = regexp_replace(fixedSep, "[?&]+$", "")
    regexp_replace(noDangle, "/$", "")
  }

  /** HTML/XML-ish markup removal for web-corpus text: tags → space, the
    * five predefined character entities unescaped, whitespace collapsed.
    * Tag pattern is `<[^>]*>` (plain classes — Java regex and RE2 agree);
    * entities are fixed-string replaces with `&amp;` LAST so an escaped
    * escape (`&amp;lt;`) unescapes exactly one level, like every real
    * entity decoder. Per-row scalar scan, no shuffle.
    */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val unescaped = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(unescaped, " +", " "))
  }

  /** Lexical-diversity signals per document — type/token ratio and hapax
    * (once-only token) fraction, the classic gibberish/boilerplate
    * detectors. Integer-exact (ppm): one explode + one (id, token)
    * shuffle, linear in corpus size.
    */
  def lexicalDiversity(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .groupBy("id", "token")
      .agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        count_if(col("c") === 1).as("n_hapax"))
      .select(col("id"), col("n_tokens"), col("n_distinct"), col("n_hapax"),
        floor(col("n_distinct") * 1000000L / col("n_tokens")).cast("long").as("ttr_ppm"),
        floor(col("n_hapax") * 1000000L / col("n_tokens")).cast("long").as("hapax_ppm"))

  /** Source/domain reputation gate — filter by the AGGREGATE quality of a
    * document's origin, not the document alone (RefinedWeb/C4-style URL
    * and domain filtering generalized to any source key): a mediocre page
    * from a consistently high-quality domain survives, a decent-looking
    * page from a spam farm does not. Emits a verdict row per document
    * (`kept` flag rather than a filter) so rejects can be audited or
    * routed, matching `jobs.CorpusCuration`'s flag-column style.
    *
    * `src_quality_ppm` is the source's mean [[qualityScorePpm]] as exact
    * integer floor division (`sum DIV count`) — engine-reproducible.
    * Null sources group and join null-safely (their own reputation
    * bucket, not silently dropped).
    *
    * Scale shape: one map-combined aggregate to |sources| rows, broadcast
    * back over the corpus — no corpus-sized shuffle at all.
    */
  def sourceReputation(
      docs: DataFrame,
      minMeanPpm: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      sourceCol: String = "source"
  ): DataFrame = {
    val q = docs.select(col(idCol), col(sourceCol),
      qualityScorePpm(col(textCol)).as("quality_ppm"))
    val rep = q.groupBy(col(sourceCol).as("__src"))
      .agg(expr("sum(quality_ppm) DIV count(1)").as("src_quality_ppm"))
    q.join(broadcast(rep), col(sourceCol) <=> col("__src"))
      .select(col(idCol), col(sourceCol), col("quality_ppm"),
        col("src_quality_ppm"),
        (col("src_quality_ppm") >= minMeanPpm).as("kept"))
  }

  /** Sentence segmentation: split after `.`/`!`/`?` followed by
    * whitespace. RE2-safe formulation — mark each terminator+whitespace
    * boundary with a sentinel (`\u001F`, the ASCII unit separator) via a
    * capture-group replace, then split on the sentinel. No lookbehind, so
    * the rule set is expressible verbatim in RE2 engines (DuckDB
    * `regexp_replace(..., 'g')` + `string_split`); a spec pins equality
    * with the previous `(?<=[.!?])\s+` lookbehind split on the fixture
    * corpus. Empty segments from trailing punctuation are dropped.
    * Per-row scalar op. Input containing a literal `\u001F` (a control
    * char no real text carries) would gain extra split points.
    */
  def sentences(text: Column): Column =
    filter(split(regexp_replace(text, "([.!?])\\s+", "$1\u001F"), "\u001F"),
      s => length(trim(s)) > 0)

  /** Per-document sentence statistics: count and mean sentence length in
    * centitokens (integer-exact).
    */
  def sentenceStats(text: Column): (Column, Column) = {
    val sents = sentences(text)
    val n = size(sents).cast("long")
    val totalToks = tokenCount(text)
    val meanLenC = when(n > 0, floor(totalToks * 100L / n)).otherwise(0L).cast("long")
    (n, meanLenC)
  }

  /** Corpus-self bigram language-model score per document: the mean
    * negative log conditional probability −ln p(w2|w1) of the document's
    * positional bigrams, with probabilities estimated from the corpus
    * itself (the q89 bigram table). Low = predictable/templated text,
    * high = rare transitions — the cheap perplexity-style quality signal
    * (fluent-vs-gibberish) that needs no external model. Output
    * `lm_score_unats` is integer micro-nats (floor), order-independent.
    *
    * Scale shape: one positional explode + lead window for bigrams (the
    * codegen-friendly formulation, see q89), one (w1,w2) aggregate for
    * the model, a broadcast join of the model onto the bigram stream
    * (bigram vocab ≪ corpus), and one per-doc aggregate. Docs with no
    * bigrams (< 2 tokens) are absent from the output.
    */
  def bigramLmScore(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val bigrams = docs
      .select(col(idCol).as("id"), posexplode(tokens(col(textCol))).as(Seq("pos", "w1")))
      .withColumn("w2", lead(col("w1"), 1).over(wDoc))
      .filter(col("w2").isNotNull)
    val model = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .withColumn("n_head", sum(col("n")).over(Window.partitionBy(col("w1"))))
      // -ln p(w2|w1) in micro-nats, floored to an exact integer per bigram
      .withColumn("unats",
        floor(-log(col("n").cast("double") / col("n_head")) * 1000000d).cast("long"))
      .select(col("w1"), col("w2"), col("unats"))
    bigrams.join(broadcast(model), Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("unats")) / count(lit(1))).cast("long").as("lm_score_unats"))
  }

  /** Collocation mining: the corpus's strongest two-word associations by
    * Dice coefficient — the phrase-discovery primitive (tokenizer vocab
    * candidates, multi-word-expression lists, boilerplate phrase
    * detection). All integer ppm arithmetic: with `n_xy` the bigram
    * count, `n_x•` the left marginal (bigrams starting with x) and
    * `n_•y` the right marginal,
    * `dice_ppm = (2·n_xy·10⁶) div (n_x• + n_•y)` plus both conditional
    * directions (`cond_ppm = P(y|x)`, `rcond_ppm = P(x|y)` in ppm) —
    * deliberately NO log-PMI: transcendental scores round differently
    * across engines at floor boundaries ([[bigramLmScore]]'s documented
    * trade), while Dice ranks the same collocations and is exact. All
    * divisions are integral `DIV` on positive counts, identical to
    * floor division in any engine; products stay within BIGINT until
    * corpora reach ~10¹² occurrences of one bigram.
    *
    * Scale shape: one 2-shingle projection + explode (no per-doc
    * window), ONE (w1,w2) aggregate that collapses the token stream to
    * the bigram vocabulary map-side, marginals re-aggregated FROM the
    * counts table (never a second corpus pass — the table is
    * lazy-checkpointed for its three consumers), two vocab-sized joins
    * (AQE broadcasts the marginals when they fit), and a top-N
    * TakeOrderedAndProject, never a global sort. Ties rank on the
    * total order (dice, n, w1, w2), so the cut is deterministic.
    */
  def collocations(
      docs: DataFrame,
      textCol: String = "text",
      minCount: Long = 5L,
      topN: Int = 100
  ): DataFrame = {
    val counts = docs
      .select(tokens(col(textCol)).as("__toks"))
      .select(explode(shinglesFromTokens(col("__toks"), 2)).as("bg"))
      .select(substring_index(col("bg"), " ", 1).as("w1"),
        substring_index(col("bg"), " ", -1).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val left = counts.groupBy("w1").agg(sum(col("n")).as("__nl"))
    val right = counts.groupBy("w2").agg(sum(col("n")).as("__nr"))
    counts.filter(col("n") >= minCount)
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .withColumn("dice_ppm", expr("(n * 2000000) DIV (__nl + __nr)"))
      .withColumn("cond_ppm", expr("(n * 1000000) DIV __nl"))
      .withColumn("rcond_ppm", expr("(n * 1000000) DIV __nr"))
      .orderBy(col("dice_ppm").desc, col("n").desc, col("w1"), col("w2"))
      .limit(topN)
      .select("w1", "w2", "n", "dice_ppm", "cond_ppm", "rcond_ppm")
  }

  /** DSIR-style importance weights (Xie et al., 2023, "Data Selection
    * for Language Models via Importance Resampling" — hashed-ngram
    * likelihood ratios, re-expressed with integer-exact statistics): how
    * much more TARGET-like than corpus-like each document's bigram
    * transitions are. Both models are the q89 conditional-ppm table
    * (`floor(n·10⁶ / head_count)`) — deliberately NO transcendental
    * log-likelihoods: cross-engine `ln` rounds differently at floor
    * boundaries (why [[bigramLmScore]] is spec-only), while these
    * weights are exact integers any engine reproduces.
    *
    * Per document: the mean over its positional bigrams of
    * `target_ppm − corpus_ppm`; a bigram absent from the target model
    * contributes `−corpus_ppm` (unseen-in-target ⇒ un-target-like). The
    * mean maps linearly to `weight_milli = clamp(1000 + mean/scaleDiv,
    * minMilli, maxMilli)` for the resample copy generator.
    *
    * Negative-division portability: SQL `DIV` truncates toward zero but
    * e.g. DuckDB's `//` floors, so every division here offset-shifts to
    * a non-negative numerator first (ppm diffs are ≥ −10⁶ by
    * construction); `scaleDiv` must divide 10⁶ for the shift to cancel.
    *
    * Scale shape: the bigram stream per side is a per-row 2-shingle
    * projection + ONE explode — NOT q89's posexplode+lead formulation,
    * whose per-doc window pays a doc_id shuffle on the full token
    * stream per pass (twice here: model build + scoring). On the 1M-doc
    * local probe the two shapes measure at parity (~17–19k docs/s: that
    * ADVERSARIAL uniform-random corpus makes |model| ≈ |stream| ≈ 54M
    * near-unique bigrams, so string-keyed model shuffles dominate
    * either way — real Zipf text compresses the model by orders of
    * magnitude); the shingle shape is kept for the structural cluster
    * win of two fewer corpus-stream shuffles. Each model is one
    * (bigram) aggregate, lazily checkpointed because TWO consumers
    * derive from it — the ppm join and the head-count re-aggregate
    * (computed FROM the counts table, never a second pass over the raw
    * stream); heads attach with a plain equi-join on w1 (≈ |vocab| rows
    * — AQE broadcasts when it fits). The corpus stream then equi-joins
    * its own model on the bigram key and BROADCASTS the target model (a
    * target sample is small by construction); one per-doc aggregate.
    * All linear; the corpus is scanned twice (model pass + scoring
    * pass) by the same two-pass necessity as
    * [[graft.ext.Sampling.temperatureResample]].
    */
  def importanceWeights(
      docs: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      scaleDiv: Long = 100L,
      minMilli: Long = 200L,
      maxMilli: Long = 5000L
  ): DataFrame = {
    require(1000000L % scaleDiv == 0, s"scaleDiv must divide 1e6: $scaleDiv")
    // bigram = 2-shingle string "w1 w2"; the token array is a NAMED
    // column (posGramTable's binding boundary)
    def bigrams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
        .select(col("id"), explode(shinglesFromTokens(col("__toks"), 2)).as("bg"))
        .select(col("id"), substring_index(col("bg"), " ", 1).as("w1"), col("bg"))
    def model(bi: DataFrame, ppmName: String): DataFrame = {
      val counts = bi.groupBy(col("w1"), col("bg")).agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val heads = counts.groupBy(col("w1")).agg(sum(col("n")).as("n_head"))
      counts.join(heads, Seq("w1"))
        .withColumn(ppmName, floor(col("n") * 1000000L / col("n_head")).cast("long"))
        .select(col("bg"), col(ppmName))
    }
    val corpusBi = bigrams(docs)
    val corpusModel = model(corpusBi.select(col("w1"), col("bg")), "ppm_c")
    val targetModel = model(bigrams(target).select(col("w1"), col("bg")), "ppm_t")
    corpusBi
      .join(corpusModel, Seq("bg"))
      .join(broadcast(targetModel), Seq("bg"), "left")
      .withColumn("__diff", coalesce(col("ppm_t"), lit(0L)) - col("ppm_c"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__n"), sum(col("__diff")).as("__sum"))
      .withColumn("__mean", expr("(__sum + 1000000 * __n) DIV __n - 1000000"))
      .withColumn("weight_milli",
        least(lit(maxMilli), greatest(lit(minMilli),
          lit(1000L) + (expr(s"(__mean + 1000000) DIV $scaleDiv")
            - lit(1000000L / scaleDiv)))))
      .select(col("id").as(idCol), col("weight_milli"))
  }

  /** CCNet-style perplexity bucketing on top of [[bigramLmScore]]: split
    * the corpus into `nBuckets` quantile bands of the LM score (CCNet
    * keeps the "head"/"middle" of the perplexity distribution and drops
    * the tail). Scale-correct formulation: ONE aggregate computes
    * approximate score quantile cutoffs (see [[bucketsByScore]] for the
    * approximation contract), which are collected (nBuckets−1 scalars)
    * and inlined into a per-row bucket assignment — no global-sort
    * `ntile` single-partition window. Output: bigramLmScore columns +
    * `bucket` (1 = most predictable … nBuckets = rarest). Ties at a
    * cutoff fall into the lower bucket, so bucket populations can be
    * uneven when scores repeat — deterministic for a fixed partition
    * layout.
    */
  def lmScoreBuckets(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", nBuckets: Int = 3): DataFrame =
    // two passes over the score pipeline by construction (cutoffs, then
    // assignment) — pre-compute bigramLmScore onto a persisted frame and
    // call [[bucketsByScore]] directly when the upstream is expensive
    bucketsByScore(bigramLmScore(docs, idCol, textCol), "lm_score_unats", nBuckets)

  /** Quantile-band assignment for any numeric score column (the reusable
    * half of [[lmScoreBuckets]]). Cutoffs come from `percentile_approx`
    * (accuracy 10000): APPROXIMATE by design — sketch merges depend on
    * partition layout, so documents sitting exactly at a cutoff can
    * change band across different partitionings (CCNet's thresholds are
    * approximate for the same reason). Deterministic for a fixed layout.
    * For strictly layout-independent cutoffs swap in the exact
    * `percentile` aggregate — viable when the score column's distinct
    * cardinality is bounded, as integer µ-nat scores are.
    */
  def bucketsByScore(scored: DataFrame, scoreCol: String,
                     nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = Option(scored.agg(
      percentile_approx(col(scoreCol), typedlit(qs), lit(10000)).as("cuts"))
      .head().getSeq[Any](0))
      .getOrElse(Seq.empty) // empty/all-null input: everything lands in band 1
    val bucket = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(col(scoreCol) > lit(c), 1).otherwise(0)
    }
    scored.withColumn("bucket", bucket.cast("long"))
  }

  /** Context-window chunking: split the document into token windows of
    * `size` tokens, consecutive windows sharing `overlap` tokens — the
    * standard prep for fixed-context training and retrieval indexing.
    * Pure per-row generator arithmetic (stride = size − overlap, window i
    * covers tokens [i·stride, i·stride + size)): no UDF, no shuffle; pair
    * with `posexplode` for one row per chunk. The final window is the
    * only one allowed to be short; a document shorter than `size` yields
    * exactly one chunk. Empty text yields an empty array.
    */
  def chunkTokens(text: Column, size: Int, overlap: Int = 0): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    // BIND the token array once per row via a single-element transform:
    // a lambda body referencing the outer `tokens(text)` expression
    // re-evaluates the split PER WINDOW (higher-order functions run
    // interpreted), which is O(windows × chars) — a 10 MB document
    // wedged a whole executor task for minutes under the hostile-fixture
    // gate. With `tk` as the lambda variable the split runs once and
    // each window only pays its own slice+join.
    def chunksOf(tk: Column): Column = {
      val n = size_(tk)
      // number of windows: 1 + ceil(max(n - size, 0) / stride)
      val extra = greatest(n - lit(size), lit(0))
      val nWin = lit(1) + floor((extra + lit(stride - 1)) / lit(stride)).cast("int")
      transform(sequence(lit(0), nWin - 1),
        i => concat_ws(" ", slice(tk, i * lit(stride) + lit(1), lit(size))))
    }
    when(length(text) === 0, array().cast("array<string>"))
      .otherwise(flatten(transform(array(tokens(text)), tk => chunksOf(tk))))
  }

  // `size` the sql function, shadow-safe alias (chunkTokens takes a
  // `size` parameter)
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Corpus-level token statistics (one shuffle). */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))

  /** TF-IDF per (doc, token): tf × ln(N / df), df = docs containing the
    * token. Two shuffles (doc-term counts; document frequencies joined
    * back — df table is tiny after aggregation and broadcast-joins).
    * N is computed from the corpus, not passed in.
    */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // one tokenize pass (lazy checkpoint — both legs and n read it),
    // then df straight off the per-doc DISTINCT tokens: one row per
    // (doc, token) feeds the count either way (id is unique), but the
    // tf-derived formulation re-computed the whole tf subtree (pruning
    // defeats ReuseExchange) and shuffled the exploded corpus twice —
    // the df leg now aggregates map-side to TOKEN grain (the bm25
    // shape, measured in the r20 q131 plan).
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .localCheckpoint(false)
    val terms = toks.select(col("id"), explode(col("toks")).as("token"))
    val tf = terms.groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = toks
      .select(explode(array_distinct(col("toks"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.count()
    tf.join(broadcast(dfreq), "token")
      .withColumn("tf_idf", col("tf") * log(lit(n.toDouble) / col("df")))
      .select(col("id"), col("token"), col("tf"), col("df"), col("tf_idf"))
  }

  /** Inverted index: one row per token with its document frequency and
    * the sorted posting list — the retrieval structure BM25/boolean
    * search consume. One explode + one shuffle on token; posting lists
    * are per-token (bounded by df), so the only scale hazard is
    * stop-word-grade tokens — cap or drop them upstream at 100 TB
    * (`maxDf`).
    */
  def invertedIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", maxDf: Long = Long.MaxValue): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sort_array(collect_list(col("id"))).as("postings"))
      .filter(col("df") <= maxDf)

  /** Boolean AND search over the corpus: documents containing EVERY query
    * term. Distinct-token explode + broadcast of the (tiny) term set +
    * per-doc match count — the corpus never self-joins.
    */
  def searchAll(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term " +
      "(an empty conjunction would vacuously match every document)")
    docs.select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .filter(col("token").isInCollection(terms))
      .groupBy("id")
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === terms.length)
      .select(col("id"))
  }

  /** Okapi BM25 per (doc, token) — TF-IDF's production successor for
    * retrieval-quality scoring and data curation:
    * `idf(df) × tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the standard
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`. Same two-shuffle shape as
    * [[tfIdf]]: doc-term counts, broadcast df table, plus one scalar
    * aggregate for avg document length. Float transcendental (`ln`) —
    * same cross-engine-agreement footing as tfIdf's, proven by its
    * oracle at three SFs.
    */
  def bm25(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    // lazy-checkpoint the tokenized frame: the corpus-stats action below
    // materializes it once, and the tf explode reuses the blocks — without
    // the cut the corpus is tokenized twice (once per consumer)
    val withDl = base.select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      .localCheckpoint(false)
    val stats = withDl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .head()
    val nDocs = stats.getLong(0)
    // empty corpus: sum(dl) aggregates to NULL and there is no average
    // to take — any finite placeholder works because the tf frame below
    // is empty too, so the output is the empty (schema-stable) result
    val avgdl =
      if (nDocs == 0L || stats.isNullAt(1)) 1.0
      else stats.getLong(1).toDouble / nDocs
    val tf = withDl.select(col("id"), col("dl"), explode(col("toks")).as("token"))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
    // df straight off the per-doc DISTINCT tokens instead of
    // `tf.groupBy("token")`: one row per (doc, token) feeds the count
    // either way (id is unique), but the tf-derived formulation
    // re-computed the whole tf subtree — the df branch loses its count
    // column to pruning, so ReuseExchange cannot dedup the two
    // (id, dl, token) exchanges and the exploded corpus was SHUFFLED
    // TWICE (r20 q131 plan, Exchanges (5)/(11)). Here the df leg
    // aggregates map-side to TOKEN grain (vocab-bounded per task) off
    // the already-checkpointed tokenized blocks — the second wide
    // exchange is gone and nothing cell-grain is ever materialized.
    val dfreq = withDl
      .select(explode(array_distinct(col("toks"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "token")
      .withColumn("idf",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("bm25",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl)))
      .select(col("id"), col("token"), col("tf"), col("df"), col("bm25"))
  }

  /** BM25 top-k retrieval: score every document against each bag-of-
    * words query as Σ over matched terms of the per-(doc, term) [[bm25]]
    * weight, return the `k` best per query. Per-term weights are rounded
    * to 6 places, scaled to INTEGER MICROS, then summed as BIGINT —
    * integer addition is associative, so the score (and therefore the
    * ranking) is independent of partitioning and merge order, unlike a
    * raw double sum whose low bits depend on reduction order. (The
    * second round() only snaps the ×10⁶ product back to its integer —
    * the value is already within 1e-4 of it, so no half-boundary
    * semantics are in play.)
    *
    * Scale shape: the query term set is tiny and broadcast; the join
    * prunes the posting table to matched terms BEFORE the shuffle, so
    * the groupBy aggregates |postings of query terms| rows, not the
    * corpus; the final top-k is a per-query window over candidates that
    * matched ≥ 1 term. The [[bm25]] stats pass is shared, linear, and
    * its `df` table broadcast — the classic disjunctive (OR) retrieval
    * dataflow over an inverted index.
    */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "qid",
      qtermCol: String = "term",
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val scores = bm25(docs, idCol, textCol, k1, b)
    val q = broadcast(
      queries.select(col(qidCol).as("qid"), col(qtermCol).as("token")).distinct())
    val agg = scores.join(q, "token")
      .groupBy("qid", "id")
      .agg(sum(round(round(col("bm25"), 6) * 1000000).cast("long"))
          .as("score_micro"),
        count(lit(1)).as("n_matched"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micro").desc, col("id"))
    agg.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("id"), col("score_micro"),
        col("n_matched"), col("rnk"))
  }

  /** Distinctive tokens per key — the top-`topK` tokens by RATE LIFT,
    * `rate_key(tok) − rate_corpus(tok)` in exact integer ppm: "what
    * words characterize this source" (the c-TF-IDF idea with the
    * log-IDF swapped for a rate difference, which needs no floating
    * logarithm and still zeroes out corpus-uniform stopwords — a token
    * everywhere at the same rate lifts nowhere). Rank ties break on
    * the token ascending.
    *
    * Scale shape: ONE aggregate over the exploded tokens to (key, tok)
    * cells (checkpointed for its consumers); per-key totals, corpus
    * counts and the grand total all DERIVE from the cells; the one-row
    * grand total broadcasts onto the vocab-bounded cell table for the
    * rank window.
    */
  def distinctiveTokens(
      docs: DataFrame,
      keyCol: Column,
      textCol: Column,
      topK: Int
  ): DataFrame = {
    require(topK > 0, "topK must be positive")
    val cells = docs.filter(textCol.isNotNull && keyCol.isNotNull)
      .select(keyCol.as("key"), explode(tokens(textCol)).as("tok"))
      .groupBy("key", "tok").agg(count(lit(1)).as("__n"))
      .localCheckpoint(false)
    val keyTot = cells.groupBy("key").agg(sum(col("__n")).as("__st"))
    val corpCnt = cells.groupBy("tok").agg(sum(col("__n")).as("__cn"))
    val corpTot = corpCnt.agg(sum(col("__cn")).as("__ct"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("lift_ppm").desc, col("tok"))
    cells
      .join(keyTot, Seq("key"))
      .join(corpCnt, Seq("tok"))
      .crossJoin(broadcast(corpTot))
      .withColumn("lift_ppm", expr(
        "(__n * 1000000) DIV __st - (__cn * 1000000) DIV __ct"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("key"), col("tok"), col("lift_ppm"), col("rk"))
  }

  /** Source novelty — per key (source), how much of its n-gram
    * inventory appears NOWHERE else: distinct shingles, shingles
    * unique to the key, and the unique share in ppm. The corpus-
    * diversity dual of [[tvDrift]] (drift asks "is the mix different",
    * novelty asks "does this source contribute anything of its own") —
    * a near-zero unique share marks a mirror/scrape of the rest of
    * the corpus.
    *
    * Scale shape: per-doc shingle sets explode to DISTINCT (key,
    * shingle) pairs (one aggregate), the shingle-spread count is one
    * more shingle-keyed aggregate, and the join back runs on the same
    * shingle key — three shuffles, all on aggregated pair tables,
    * never all-pairs.
    */
  def sourceNovelty(
      docs: DataFrame,
      keyCol: Column,
      textCol: Column,
      shingleN: Int
  ): DataFrame = {
    val pairs = docs.filter(textCol.isNotNull && keyCol.isNotNull)
      .select(keyCol.as("key"), explode(shingleSet(textCol, shingleN)).as("sh"))
      .distinct()
    val spread = pairs.groupBy("sh").agg(count(lit(1)).as("__nk"))
    pairs.join(spread, Seq("sh"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("__nk") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("unique_ppm", expr("(n_unique * 1000000) DIV n_distinct"))
  }

  /** Total-variation drift of each key's (source's) token distribution
    * from the whole-corpus distribution — `tv_ppm = Σ_b |p_key(b) −
    * p_corpus(b)| div 2` over a top-`vocabSize` COARSENED vocabulary
    * (boundary ties lexicographic, like [[oovStats]]; every other
    * token collapses into one `__other` bucket). TV is the
    * distribution-drift number with an operational reading — the
    * fraction of one distribution that must move to become the other —
    * and unlike KL it is finite on disjoint support and EXACT in
    * integer ppm (no logs). The coarsening is what bounds the grid:
    * drift is measured over V+1 buckets by construction, so the
    * comparison stays cheap at ANY corpus vocabulary size.
    *
    * Scale shape: token aggregates as in [[oovStats]]; the score grid
    * is keys × (V+1) built from two vocabulary-bounded broadcasts (the
    * per-bucket corpus counts and the one-row total) — never
    * row-bounded.
    */
  def tvDrift(
      docs: DataFrame,
      keyCol: Column,
      textCol: Column,
      vocabSize: Int
  ): DataFrame = {
    val toks = docs.filter(textCol.isNotNull && keyCol.isNotNull)
      .select(keyCol.as("key"), explode(tokens(textCol)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    val bucketed = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("key"),
        when(col("__in").isNotNull, col("tok")).otherwise(lit("__other")).as("b"))
    // ONE aggregate over the token table; the corpus distribution and
    // both totals DERIVE from it (sums of per-source cells), so the
    // exploded tokens are scanned twice total (vocab build + cells),
    // never three times — and the checkpoint stops the three
    // downstream consumers from re-deriving the cell table
    val srcCnt = bucketed.groupBy("key", "b").agg(count(lit(1)).as("sn"))
      .localCheckpoint(false)
    val srcTot = srcCnt.groupBy("key").agg(sum(col("sn")).as("st"))
    val corpCnt = srcCnt.groupBy("b").agg(sum(col("sn")).as("cn"))
    val corpTot = corpCnt.agg(sum(col("cn")).as("ct"))
    srcTot
      .crossJoin(broadcast(corpCnt))          // keys × (V+1) grid
      .join(srcCnt, Seq("key", "b"), "left")
      .crossJoin(broadcast(corpTot))          // one-row total
      .withColumn("__ad", abs(expr("(coalesce(sn, 0) * 1000000) DIV st")
        - expr("(cn * 1000000) DIV ct")))
      .groupBy("key")
      .agg(max(col("st")).as("n_tokens"), sum(col("__ad")).as("__sad"))
      .withColumn("tv_ppm", expr("__sad DIV 2"))
      .drop("__sad")
  }

  /** Syllable-proxy readability stats — vowel-GROUP counting (each
    * maximal `[aeiouy]+` run ≈ one syllable, the standard regex-only
    * heuristic), plus a Flesch reading-ease variant with the document
    * treated as ONE sentence (the fixture corpus has no sentence
    * punctuation; the words-per-sentence term then degenerates to the
    * word count, which the formula keeps — documented, not hidden):
    * `ease_milli = 206835 − 1015·n_words − (84600·n_groups) div n_words`
    * — Flesch's 206.835/1.015/84.6 coefficients in milli units, all
    * integer arithmetic.
    *
    * The group count is computed portably as
    * `len(replace(groups → "#")) − len(replace(groups → ""))` — two
    * global regexp_replace passes whose length difference is exactly
    * the number of runs, avoiding any engine-specific match-count
    * function. Pure per-row projection: zero shuffle.
    */
  def syllableStats(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val lowered = lower(textCol)
    val nGroups = (length(regexp_replace(lowered, "[aeiouy]+", "#")) -
      length(regexp_replace(lowered, "[aeiouy]+", ""))).cast("long")
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"), size(tokens(textCol)).cast("long").as("n_words"),
        nGroups.as("n_groups"))
      .filter(col("n_words") > 0)
      .withColumn("syll_per_word_ppm",
        expr("(n_groups * 1000000) DIV n_words"))
      .withColumn("ease_milli",
        expr("206835 - 1015 * n_words - (84600 * n_groups) DIV n_words"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's own
    * top-`vocabSize` token vocabulary (ties at the frequency boundary
    * break to the lexicographically smaller token, so the vocabulary is
    * deterministic) — the tokenizer-coverage diagnostic: a corpus slice
    * with a high OOV rate against the training vocabulary is exactly
    * the slice a fixed tokenizer will shred into bytes. Counts are by
    * occurrence (multiplicity), `oov_ppm = n_oov·10⁶ div n_tokens`.
    *
    * Scale shape: the vocabulary build is one token-keyed aggregate
    * (map-side partials are vocabulary-bounded per task — Heaps' law)
    * topped by Spark's partial top-N (`TakeOrderedAndProject`, no
    * global sort); the probe side BROADCASTS the ≤`vocabSize` vocab
    * onto the exploded tokens and re-aggregates per document (doc keys
    * are partition-local after explode, so the partial agg collapses
    * each doc before the shuffle). The corpus is scanned twice —
    * deliberately: re-reading beats materializing an exploded
    * token table at 100 TB.
    */
  def oovStats(
      docs: DataFrame,
      idCol: Column,
      textCol: Column,
      vocabSize: Int
  ): DataFrame = {
    val toks = docs.filter(textCol.isNotNull)
      .select(idCol.as("id"), explode(tokens(textCol)).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000) DIV n_tokens"))
  }

  /** Encoding/mojibake audit — the transport-damage quality gate the
    * content heuristics ([[qualityScore]], [[repetitionStats]]) can't
    * see: per document, counts of the three classic corruption
    * signatures in web-crawl text:
    *  - `n_replacement` — U+FFFD REPLACEMENT CHARACTER, a decoder
    *    already gave up on those bytes;
    *  - `n_control` — C0 control characters other than tab/LF/CR
    *    (terminal escapes, NULs from binary bleed-through);
    *  - `n_mojibake` — occurrences of `Ã` (U+00C3), the leader of
    *    every UTF-8-two-byte-sequence-read-as-Latin-1 artifact
    *    (`Ã©` = é, `Ã¯` = ï, …) and vanishingly rare in honest text.
    * `verdict` is `clean` iff all three are zero — route suspects to
    * re-decode/quarantine, not to the training mix.
    *
    * All counts via the portable two-replace length trick
    * ([[syllableStats]]) / a global `regexp_replace` — per-row map-side
    * arithmetic, no shuffle, NULL text excluded.
    */
  def encodingAudit(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    def occurrences(of: Column): Column =
      (length(textCol) - length(replace(textCol, of, lit("")))).cast("long")
    docs.filter(textCol.isNotNull)
      .select(idCol.as("id"),
        occurrences(lit("\ufffd")).as("n_replacement"),
        (length(textCol) -
          length(regexp_replace(textCol,
            "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""))).cast("long")
          .as("n_control"),
        occurrences(lit("\u00c3")).as("n_mojibake"))
      .withColumn("verdict",
        when(col("n_replacement") === 0 && col("n_control") === 0 &&
          col("n_mojibake") === 0, lit("clean")).otherwise(lit("suspect")))
  }

  /** Language-ID with a CONFIDENCE margin — [[langId]]'s argmax plus
    * how decisive it was: `h1`/`h2` are the best and second-best
    * stopword hit counts and `margin_ppm = (h1−h2)·10⁶ DIV (h1+h2)`
    * (1 = unanimous, 0 = dead heat, NULL = no evidence at all). The
    * margin is the threshold a curation pipeline actually gates on:
    * "en at margin ≥ 0.5" drops the mixed-language docs that a bare
    * argmax waves through. Same tiny stopword lists as [[langId]], so
    * the two can never disagree on the winner; per-row scalar work
    * only.
    */
  def langConfidence(
      docs: DataFrame,
      idCol: Column,
      textCol: Column
  ): DataFrame = {
    val hits = stopwords.map { case (lang, words) =>
      lang -> stopwordHits(textCol, words)
    }
    val sorted = sort_array(array(hits.map(_._2): _*), asc = false)
    docs.select(idCol.as("id"), langId(textCol).as("lang"),
        element_at(sorted, 1).as("h1"), element_at(sorted, 2).as("h2"))
      .withColumn("margin_ppm",
        when(col("h1") > 0,
          expr("((h1 - h2) * 1000000) DIV (h1 + h2)")))
  }

  /** Per-source leave-one-out ablation report — "what does each source
    * actually contribute to the corpus": document and token mass,
    * token share, the source's mean quality, the corpus mean WITHOUT
    * the source, and the source's lift (corpus mean minus the
    * without-mean; positive = removing the source would LOWER the
    * corpus). Because the metrics are additive, every leave-one-out
    * mean is just `(total − source) / (n_total − n_source)` — the full
    * ablation costs ONE corpus scan plus a one-row totals broadcast,
    * not |sources| re-aggregations. Means are integer ppm floor
    * divisions ([[qualityScorePpm]] units), so no cross-engine double
    * boundary exists. A single-source corpus reports NULL
    * without-mean/lift (there is no corpus without it).
    */
  def sourceAblation(
      docs: DataFrame,
      sourceCol: Column,
      textCol: Column
  ): DataFrame = {
    val per = docs
      .select(sourceCol.as("source"),
        qualityScorePpm(textCol).as("q"), tokenCount(textCol).as("tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        sum(col("q")).as("__sum_q"))
    val tot = per.agg(sum(col("n_docs")).as("__t_docs"),
      sum(col("n_tokens")).as("__t_tokens"), sum(col("__sum_q")).as("__t_q"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(n_tokens * 1000000) DIV __t_tokens").as("tok_share_ppm"),
        expr("__sum_q DIV n_docs").as("mean_q_ppm"),
        when(col("__t_docs") > col("n_docs"),
          expr("(__t_q - __sum_q) DIV (__t_docs - n_docs)")).as("mean_wo_ppm"),
        when(col("__t_docs") > col("n_docs"),
          expr("__t_q DIV __t_docs - (__t_q - __sum_q) DIV (__t_docs - n_docs)"))
          .as("lift_ppm"))
  }

  /** RAKE keyphrase extraction (Rose, Engel, Cramer & Cowley 2010):
    * candidate phrases are maximal stopword-free token runs; each
    * word's score is its co-occurrence degree over its frequency
    * (`deg(w) = Σ |phrase|` over occurrences, favoring words that live
    * in LONG phrases), and a phrase scores the sum of its members'
    * scores — the classic unsupervised keyphrase ranker. All integer
    * milli arithmetic (one floor per word score); identical phrase
    * texts collapse with an occurrence count; top-k by
    * (score desc, phrase) is fully deterministic.
    *
    * The stopword boundary list defaults to the union of the
    * [[stopwords]] language lists (tiny by design — the same
    * oracle-shared tables langId uses).
    *
    * Scale shape: one posexplode (linear), a per-doc running-count
    * window for phrase ids (bounded by document length), then three
    * hash aggregates — (doc, phrase), word, phrase-text — all keyed,
    * nothing pairwise; the top-k is a single bounded sort.
    */
  def rakeKeyphrases(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      topK: Int = 50,
      stopwordList: Seq[String] = stopwords.flatMap(_._2).distinct
  ): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val toks = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(filter(tokens(col(textCol)), t => length(t) > 0))
          .as(Seq("pos", "w")))
      .withColumn("__stop", col("w").isInCollection(stopwordList))
    val wSeg = Window.partitionBy("id").orderBy("pos")
    val seg = toks
      .withColumn("pid",
        sum(when(col("__stop"), 1L).otherwise(0L)).over(wSeg))
      .filter(!col("__stop"))
      .localCheckpoint(false)
    val wLen = Window.partitionBy("id", "pid")
    val withLen = seg.withColumn("plen", count(lit(1)).over(wLen))
    val wordScores = withLen.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("wscore_milli", expr("(deg * 1000) DIV freq"))
    val phrases = withLen
      .join(wordScores.select(col("w"), col("wscore_milli")), Seq("w"))
      .groupBy("id", "pid")
      .agg(concat_ws(" ", expr(
          "transform(array_sort(collect_list(named_struct" +
            "('pos', pos, 'w', w))), x -> x.w)")).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("wscore_milli")).as("score_milli"))
    phrases.groupBy("phrase")
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occurrences"),
        max(col("score_milli")).as("score_milli"))
      .orderBy(col("score_milli").desc, col("phrase"))
      .limit(topK)
  }
}
