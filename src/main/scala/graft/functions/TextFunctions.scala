package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, quality scoring, language ID,
  * fingerprinting. All pure `org.apache.spark.sql.functions`
  * compositions — codegen'd, no UDFs, so they stay inside
  * whole-stage codegen over a 100 TB `documents` scan.
  */
object TextFunctions {

  /** Whitespace tokens (empty input -> empty array, not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  /** BPE-ish subword-boundary tokens: runs of letters, runs of digits,
    * or single non-alphanumeric symbols — the regex analogue of a
    * byte-pair pre-tokenizer's initial split. */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeishTokenCount(text: Column): Column =
    size(bpeishTokens(text)).cast("bigint")

  /** Contiguous word n-gram shingles over the whitespace tokens. */
  /** HOF word-shingle twin — ORACLE/REFERENCE ONLY on hot paths: the
    * interpreted `transform` lambda re-evaluates the token split per
    * `element_at` (O(tokens²) regex work per document). Corpus-scale
    * operators route through the byte-identical compiled kernel,
    * [[graft.plans.WordShinglesExpr]]. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
  }

  /** Punctuation density: punct chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\-]", "")))
        .cast("double") / length(text).cast("double"))

  /** Language stopword tables (tiny public top-frequency lists). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "dans", "est", "pour"),
    "es" -> Seq("el", "los", "las", "y", "en", "que", "un", "una", "es", "por"))

  /** Fixed language order for [[graft.plans.StopwordHitsExpr]]'s
    * hit-count array (and the tie order of [[languageId]]). */
  val stopwordLangs: Seq[String] = Seq("en", "de", "fr", "es")

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast("bigint")

  /** Stopword ratio against one language's list (quality signal). */
  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(hitCount(t, stopwords(lang)).cast("double") /
        size(t).cast("double"))
  }

  /** N-gram/stopword-heuristic language ID: argmax of per-language
    * stopword hit counts over {en,de,fr,es}; no hits at all -> "und"
    * (undetermined). Deterministic tie order: en > de > fr > es.
    *
    * SCOPE: a deterministic, oracle-checkable GATE FIXTURE for the
    * language-ID column boundary — 4 languages, 10 stopwords each, no
    * script/encoding handling. A production pipeline swaps in a real
    * classifier (fastText/CLD3-class) behind the SAME per-row column
    * contract; everything downstream (filters, mixture sampling,
    * per-language stats) is classifier-agnostic. */
  def languageId(text: Column): Column = {
    val t = tokens(text)
    val s = Seq("en", "de", "fr", "es").map(l => l -> hitCount(t, stopwords(l))).toMap
    when(greatest(s("en"), s("de"), s("fr"), s("es")) === 0, lit("und"))
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es"), lit("en"))
      .when(s("de") >= s("fr") && s("de") >= s("es"), lit("de"))
      .when(s("fr") >= s("es"), lit("fr"))
      .otherwise(lit("es"))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs and
    * (language-appropriate) stopword presence, penalizes punctuation
    * walls. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(text, stopwordRatio(text))

  private def qualityScoreFrom(text: Column, stop: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lit(0.5) * lenScore + lit(0.5) * least(stop * 5.0, lit(1.0))
        - punctRatio(text)))
  }

  // ---- Native-kernel variants of the stopword family -----------------
  // Same semantics as the HOF forms above (TextHygieneSpec asserts
  // equality); ONE compiled tokenization pass instead of 4 interpreted
  // per-element lambdas — the shape to use on the 100 TB text path.
  // (SparkSession-taking overloads: native expressions register
  // through the Spark 4 call_function bridge.)

  import org.apache.spark.sql.SparkSession

  /** Per-language stopword hit counts, `array<bigint>` in
    * [[stopwordLangs]] order — one kernel call per row. */
  def stopwordHits(spark: SparkSession, text: Column): Column =
    graft.plans.StopwordHitsExpr.stopwordHits(spark, text)

  def stopwordRatio(spark: SparkSession, text: Column, lang: String): Column = {
    val idx = stopwordLangs.indexOf(lang) + 1
    require(idx > 0, s"unknown stopword language: $lang")
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(element_at(stopwordHits(spark, text), idx).cast("double") /
        n.cast("double"))
  }

  def qualityScore(spark: SparkSession, text: Column): Column =
    qualityScoreFrom(text, stopwordRatio(spark, text, "en"))

  /** [[languageId]] over the native hit-count kernel: argmax with the
    * same deterministic en > de > fr > es tie order. */
  def languageId(spark: SparkSession, text: Column): Column = {
    val h = stopwordHits(spark, text)
    val Seq(en, de, fr, es) =
      (1 to 4).map(i => element_at(h, i)): @unchecked
    when(greatest(en, de, fr, es) === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Document fingerprint: hash of the NFC-normalized, whitespace-
    * collapsed, case-folded text — the exact-dedup key. NFC folds
    * canonical-equivalent encodings ("é" precomposed vs e+combining
    * acute) to one byte form BEFORE hashing: web corpora mix them, and
    * without the fold every downstream exact-dedup store and group
    * silently treats the same text as different documents (the
    * [[graft.plans.NormalizeTextExpr]] rationale). The fold is the
    * zero-copy codegen kernel — one `isNormalized` scan per row on
    * already-normalized (e.g. ASCII) corpora. `nfc = false` opts out
    * for pre-normalized pipelines that want the fingerprint free of
    * the session-bound kernel. */
  def fingerprint(text: Column): Column = fingerprint(text, nfc = true)

  def fingerprint(text: Column, nfc: Boolean): Column = {
    val base =
      if (!nfc) text
      else {
        val s = SparkSession.getActiveSession
          .orElse(SparkSession.getDefaultSession)
          .getOrElse(throw new IllegalStateException(
            "fingerprint(nfc = true) needs a SparkSession to bind the " +
              "normalize_text kernel; pass nfc = false to skip the fold"))
        graft.plans.NormalizeTextExpr.normalizeText(s, text)
      }
    md5(regexp_replace(lower(trim(base)), "\\s+", " "))
  }

  /** VOCABULARY INDUCTION: global token frequencies, top `k` by
    * (count DESC, token ASC) — the deterministic tie order makes the
    * vocab reproducible across engines and runs. Scale shape: one
    * explode + one partial-aggregated count shuffle, then a bounded
    * global top-k (the vocab, not the corpus, crosses the wire).
    * Returns (token, cnt, rank), rank 1-based. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      // window over the k surviving rows only — bounded, single chunk
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token")))
          .cast("bigint"))
  }

  /** OUT-OF-VOCABULARY rate per document against the corpus-derived
    * top-`vocabSize` vocabulary — a perplexity stand-in that stays
    * INTEGER-EXACT (token counts and a floor-divided basis-point rate;
    * nothing floating-point to drift between engines). High OOV = the
    * doc's tokens don't look like the corpus = quality-gate signal.
    * Scale shape: the vocab is bounded (top-k), so membership is a
    * BROADCAST anti-join against the exploded token stream — one
    * fact-grain shuffle for the per-doc count, nothing else. */
  def oovStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val vocab = vocabulary(df, textCol, vocabSize).select("token")
    val oov = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_oov"))
    df.select(col(idCol), tokenCount(col(textCol)).as("n_toks"))
      .join(oov, Seq(idCol), "left")
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("oov_bp",
        when(col("n_toks") > 0, expr("n_oov * 10000 div n_toks"))
          .otherwise(lit(0L)))
  }

  /** APPLY an induced vocabulary: tokens -> integer id sequences, the
    * tokenize->encode step of a training feed (induction =
    * [[vocabulary]]; downstream packing = [[graft.ops.Packing]]). Ids
    * are the vocab ranks (1-based); OOV tokens encode as `oovId`
    * (default 0, the reserved UNK slot). Emits the id sequence plus
    * token/OOV counts per document.
    *
    * Scale shape: the vocab is top-k bounded so it BROADCASTS into the
    * token-grain join; re-assembly is one shuffle on (doc, pos) rows
    * — a corpus-token-sized exchange, the unavoidable cost of exact
    * order-preserving encode (the text itself does not move, only
    * (doc_id, pos, id) triples). */
  def encodeTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocab: org.apache.spark.sql.DataFrame,
      oovId: Long = 0L): org.apache.spark.sql.DataFrame = {
    // ranks are 1-based, so any positive oovId collides with a real
    // vocab id — the encoding AND n_oov would silently corrupt
    require(oovId <= 0L,
      s"oovId must be non-positive (vocab ranks are 1-based), got $oovId")
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
    val enc = toks
      .join(broadcast(vocab.select(col("token"), col("rank"))),
        Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("rank"), lit(oovId)).as("id"))
    val perDoc = enc.groupBy(idCol)
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("id")))),
          s => s.getField("id")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("id") === oovId, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"))
  }

  /** PII patterns, written in the Java/RE2-COMMON regex subset
    * (character classes, bounded repeats — no lookarounds, no \b) so
    * the DuckDB gate applies the byte-identical pattern. Conservative
    * by design: redaction patterns should over-match slightly (a false
    * `<IP>` costs nothing; a missed email is a leak). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val phonePattern = "\\+[0-9][0-9 ]{6,}[0-9]"

  /** Redact emails, IPv4 addresses, and international-format phone
    * numbers with typed placeholders — the standard scrub before
    * training-corpus release. Order matters and is fixed: emails
    * first (their local parts contain digits a later pass must not
    * shred), then IPs, then phones (`+`-anchored, so placeholder text
    * never re-matches). Pure codegen'd regexp_replace chain — one pass
    * each over the 100 TB text column, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")

  /** C4-style LINE hygiene with corpus-level line dedup (Raffel et al.
    * 2020 §2.2 — C4 keeps lines that look like sentences and removes
    * any three-sentence span seen before; this is the line-granular
    * variant): split each doc on newlines, keep lines with at least
    * `minWords` words and none of the `banned` phrases, then keep only
    * each distinct line's FIRST occurrence corpus-wide (ordered by
    * (doc, position) — boilerplate like cookie banners survives once,
    * in the earliest doc, instead of in millions), and reassemble docs
    * in original line order.
    *
    * Scale shape: one explode, one window over the LINE-VALUE
    * partition (the dedup shuffle — same key a groupBy would use), one
    * doc-grain reassembly aggregate. No driver-side state; skew risk
    * is the empty-ish hot line values, which the word-count filter
    * removes before the shuffle. Returns (id, n_lines, clean_text)
    * for every input doc (docs with no surviving lines keep a row:
    * n_lines = 0, clean_text = ''). */
  def lineCleanDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minWords: Int = 2,
      banned: Seq[String] = Seq("lorem ipsum")): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(size(tokens(col("line"))) >= minWords &&
        !banned.map(b => col("line").contains(b)).reduce(_ || _))
    val firstSeen = lines
      .withColumn("rn", row_number().over(
        Window.partitionBy("line").orderBy(col(idCol), col("pos"))))
      .filter(col("rn") === 1)
    val reassembled = firstSeen.groupBy(idCol)
      .agg(count(lit(1)).as("n_lines"),
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("clean_text"))
    df.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .withColumn("n_lines", coalesce(col("n_lines"), lit(0L)))
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * "Scaling Language Models", table A1): duplicate-token fraction and
    * most-frequent-n-gram fraction, the standard web-corpus quality
    * gates. Everything is emitted as exact integers (counts) and the
    * pass/fail gate uses integer cross-multiplication, so the output is
    * bit-identical across engines — no float ratios to drift.
    *
    * Thresholds (fail when exceeded): duplicate-token fraction > 0.3,
    * top 2-gram fraction > 0.2, top 3-gram fraction > 0.18; empty docs
    * fail. Shape: a ZERO-SHUFFLE map — every signal here is a pure
    * function of one document, so the top-n-gram numerators come from
    * the native per-row kernel ([[graft.plans.TopGramCountExpr]])
    * instead of the relational explode → (doc, gram) shuffle → max →
    * join-back detour, which moved the whole gram stream through two
    * exchanges per n for a row-local answer. Gram DENOMINATORS are
    * arithmetic: `max(0, n_toks - (n-1))`, exactly `size(wordShingles)`
    * without materializing the arrays.
    */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    df.select(col(idCol),
        tokens(col(textCol)).as("toks"),
        graft.plans.TopGramCountExpr.topGramCount(spark, col(textCol), 2)
          .as("top_2gram_cnt"),
        graft.plans.TopGramCountExpr.topGramCount(spark, col(textCol), 3)
          .as("top_3gram_cnt"))
      .select(col(idCol),
        size(col("toks")).cast("bigint").as("n_toks"),
        size(array_distinct(col("toks"))).cast("bigint").as("n_distinct_toks"),
        greatest(size(col("toks")) - 1, lit(0)).cast("bigint").as("n_2grams"),
        greatest(size(col("toks")) - 2, lit(0)).cast("bigint").as("n_3grams"),
        col("top_2gram_cnt"), col("top_3gram_cnt"))
      // integer cross-multiplication: frac <= t  <=>  cnt * scale <= n * (t*scale)
      .withColumn("repetition_ok",
        (col("n_toks") > 0 &&
          (col("n_toks") - col("n_distinct_toks")) * 10 <= col("n_toks") * 3 &&
          col("top_2gram_cnt") * 5 <= col("n_2grams") &&
          col("top_3gram_cnt") * 50 <= col("n_3grams") * 9).cast("bigint"))
  }

  /** TF-IDF TOP TERMS per document — keyword extraction / topic
    * signal for corpus curation dashboards. IDF uses the INTEGER-
    * SCALED rank-preserving form `idf_x1000 = (N * 1000) div df`
    * (floor division) instead of `ln(N/df)`: `ln` is a libm call whose
    * last-ulp behavior differs between engines, which would make the
    * ranking non-portable at rounding boundaries; `N/df` is order-
    * isomorphic to `ln(N/df)` (ln is monotone), so the top-k set is
    * identical and every emitted number stays an exact integer.
    *
    * Scale shape: one explode + (doc, token) partial-aggregated count
    * (the TF shuffle), a token-grain re-agg for document frequency,
    * then a token-keyed join back. The DF side is vocabulary-sized —
    * zipf-skewed but BOUNDED, and hot tokens (stopwords) carry high df
    * = near-zero idf, so production runs drop `df > N/2` tokens before
    * the join (the `maxDfHalf` knob) — that also desks the join skew.
    * Final per-doc top-k is a window over doc partitions at (doc,
    * token) grain — already shrunk to distinct tokens per doc. */
  def tfIdfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, dropMajorityTokens: Boolean = false):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq0 = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dfreq = if (dropMajorityTokens) dfreq0.filter(col("df") * 2 <= n)
                else dfreq0
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("token"))
    tf.join(dfreq, Seq("token"))
      .withColumn("idf_x1000", expr(s"(${n}L * 1000) div df"))
      .withColumn("score", col("tf") * col("idf_x1000"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"),
        col("idf_x1000"), col("score"))
  }

  /** Gopher quality RULES (Rae et al. 2021 Appendix A1.1) — the named
    * document-level filter battery, in integer-exact arithmetic so
    * every measurement and flag is bit-portable (fixed-point x100
    * mean word length, basis-point ratios via integral division):
    *
    *   - `n_words` in [minWords, maxWords] (paper: 50..100k)
    *   - mean word length in [3, 10] characters
    *   - >= 80% of words carry at least one alphabetic character
    *   - symbol-to-word ratio (`#` and `...` occurrences) <= 10%
    *   - >= 2 distinct English stopwords present
    *
    * Emits the measurements plus per-rule flags and the conjunction
    * `gopher_pass` — measurements stay in the output so threshold
    * drift is auditable, the production practice for filter sets.
    * Per-row kernels only (tokens + bounded array folds), ZERO
    * shuffles over the corpus scan. The A1 repetition rules
    * (dup-fraction family) live in [[repetitionStats]]. */
  def gopherQualityStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minWords: Int = 50, maxWords: Int = 100000):
      org.apache.spark.sql.DataFrame = {
    val t = tokens(col(textCol))
    df.select(col(idCol),
        size(t).cast("bigint").as("n_words"),
        coalesce(aggregate(t, lit(0L),
          (a, w) => a + length(w).cast("bigint")), lit(0L))
          .as("sum_word_chars"),
        size(filter(t, w => w.rlike("[A-Za-z]"))).cast("bigint")
          .as("alpha_words"),
        (size(split(col(textCol), "#", -1)) - 1 +
          size(split(col(textCol), "\\.\\.\\.", -1)) - 1).cast("bigint")
          .as("n_symbols"),
        size(filter(array(stopwords("en").map(lit(_)): _*),
          w => array_contains(t, w))).cast("bigint").as("stop_kinds"))
      .withColumn("mean_len_x100",
        when(col("n_words") > 0, expr("(sum_word_chars * 100) div n_words")))
      .withColumn("alpha_bp",
        when(col("n_words") > 0, expr("(alpha_words * 10000) div n_words")))
      .withColumn("symbol_bp",
        when(col("n_words") > 0, expr("(n_symbols * 10000) div n_words")))
      // every flag coalesces: a NULL text row (null measurements)
      // must FAIL the rules as 0, not disappear as NULL — a caller
      // filtering on gopher_pass === 0 or summing flags would
      // otherwise silently miss those rows entirely
      .withColumn("f_words",
        coalesce(col("n_words").between(minWords, maxWords), lit(false))
          .cast("bigint"))
      .withColumn("f_meanlen",
        coalesce(col("mean_len_x100").between(300, 1000), lit(false))
          .cast("bigint"))
      .withColumn("f_alpha",
        coalesce(col("alpha_bp") >= 8000, lit(false)).cast("bigint"))
      .withColumn("f_symbol",
        coalesce(col("symbol_bp") <= 1000, lit(false)).cast("bigint"))
      .withColumn("f_stop",
        coalesce(col("stop_kinds") >= 2, lit(false)).cast("bigint"))
      .withColumn("gopher_pass",
        (col("f_words") === 1 && col("f_meanlen") === 1 &&
          col("f_alpha") === 1 && col("f_symbol") === 1 &&
          col("f_stop") === 1).cast("bigint"))
  }

  /** Corpus bigram-LM familiarity scoring — the n-gram-LM
    * perplexity-filter shape (CCNet / Wenzek et al. 2020 score
    * documents with a KenLM 5-gram; the reference has no LM ops, this
    * is pipeline-extension surface) in EXACT integer arithmetic so the
    * score is bit-identical on any engine: per corpus bigram (w1 w2),
    * p(w2|w1) = c(w1 w2) / c(w1 ·), kept as the parts-per-million
    * floor `(c * 1000000) div cp` (integral division — no float, no
    * log, no ulp drift). A document's `score_sum` adds that ppm over
    * its bigram OCCURRENCES; `fam_ppm = score_sum div n_bigrams` is
    * the mean — low values = documents full of corpus-rare
    * transitions (gibberish, OCR noise, wrong-language), the rows a
    * perplexity filter drops.
    *
    * Scale shape: tokenize+shingle is one codegen'd pass; bigram and
    * prefix counts are map-side-combined aggregates at distinct-
    * bigram / distinct-prefix grain; the scoring join runs at (doc,
    * distinct-bigram) grain — never at raw occurrence grain — and the
    * ppm fits any corpus with < 2^43 occurrences of one prefix (the
    * `c * 1000000` headroom under ANSI int64). Self-inclusion: the
    * corpus that trains the counts includes the scored doc (the
    * standard in-domain-LM setup; train on a reference slice by
    * passing it as `lmCorpus`). */
  /** TRAINED linear text classifier — the engine's stand-in for the
    * fastText-style quality/domain filters production pretraining
    * pipelines run (CCNet's "wiki-like vs random" gate; the reference
    * has no trained classifier — this is part of the LLM-pipeline
    * extension suite). Rocchio-style frequency contrast: a token's
    * weight is its positive-class frequency minus its negative-class
    * frequency, both as integer parts-per-million of the class's TOTAL
    * token mass (`cnt * 1000000 div mass` — integral division, no
    * float, no log, no ulp drift; monotone-aligned with the NB
    * log-odds wherever one class dominates a token). The model keeps
    * only the `vocabSize` most frequent tokens (count DESC, token ASC
    * ties), so it is BOUNDED BY CONSTRUCTION — at 100 TB the
    * web-scale tail of typos/urls never inflates it past broadcast
    * range, the same capping every production fastText deploy does.
    *
    * Returns (token, pc, nc, weight): per-token positive/negative
    * occurrence counts and the contrast weight in ppm.
    *
    * Scale shape: one tokenize pass, one map-side-combined count at
    * distinct-token grain, a broadcast of the 1-row class masses, and
    * a top-V rank over the distinct-token table. */
  def contrastModelTrain(labeled: org.apache.spark.sql.DataFrame,
      textCol: String, labelCol: String,
      vocabSize: Int = 200000): org.apache.spark.sql.DataFrame = {
    val tok = labeled.select(col(labelCol).cast("int").as("__pos"),
      explode(tokens(col(textCol))).as("token"))
    val cnt = tok.groupBy("token").agg(
      sum(col("__pos").cast("bigint")).as("pc"),
      sum(lit(1L) - col("__pos")).as("nc"))
    // class masses over ALL tokens (not just the kept vocab): the ppm
    // denominators must not move when vocabSize changes, or two models
    // trained at different caps score the shared head differently
    val mass = cnt.agg(
      greatest(sum("pc"), lit(1L)).as("__pm"),
      greatest(sum("nc"), lit(1L)).as("__nm"))
    // top-V via orderBy+limit = TakeOrderedAndProject (per-partition
    // top-V, then merge) — never the single-task global-window sort a
    // row_number rank would plan over a web-scale distinct-token table
    val ranked = cnt
      .orderBy((col("pc") + col("nc")).desc, col("token"))
      .limit(vocabSize)
    ranked.crossJoin(broadcast(mass))
      .select(col("token"), col("pc"), col("nc"),
        (expr("pc * 1000000 div __pm") -
          expr("nc * 1000000 div __nm")).as("weight"))
  }

  /** Score documents against a [[contrastModelTrain]] model: per doc,
    * `score = Σ count(token) · weight(token)` over model tokens
    * (unseen tokens contribute 0), `pred = 1` iff score > 0 — the
    * classify-then-filter gate. Output (id, n_tokens, score, pred);
    * `n_tokens` counts ALL tokens, giving the caller a length-
    * normalized margin if wanted (integer-exact as-is).
    *
    * Scale shape: one tokenize pass to (doc, distinct-token) grain,
    * then a BROADCAST join against the capped model — no corpus
    * shuffle beyond the per-doc aggregate. */
  def contrastClassifierScore(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      model: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val occ = df.select(col(idCol),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("k"))
    val perDoc = occ.join(broadcast(model.select("token", "weight")),
        Seq("token"), "left")
      .groupBy(idCol).agg(sum("k").as("n_tokens"),
        sum(col("k") * coalesce(col("weight"), lit(0L))).as("score"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0L)).as("score"),
        (coalesce(col("score"), lit(0L)) > 0).cast("int").as("pred"))
  }

  def bigramLmScores(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      lmCorpus: Option[org.apache.spark.sql.DataFrame] = None):
      org.apache.spark.sql.DataFrame = {
    // native shingle kernel, not the HOF twin: the interpreted lambda
    // re-splits the text per element_at — O(tokens^2) per doc (see
    // Dsir.grams); output byte-identical by the kernel's parity
    // contract
    def bigrams(frame: org.apache.spark.sql.DataFrame) =
      graft.plans.WordShinglesExpr.wordShingles(frame.sparkSession,
        col(textCol), 2, distinct = false)
    val bg = df.select(col(idCol), explode(bigrams(df)).as("bg"))
    val lmBg = lmCorpus match {
      case Some(c) => c.select(explode(bigrams(c)).as("bg"))
      case None => bg.select("bg")
    }
    val occ = bg.groupBy(idCol, "bg").agg(count(lit(1)).as("k"))
    val cnt = lmBg.groupBy("bg").agg(count(lit(1)).as("c"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val pref = cnt.groupBy("w1").agg(sum("c").as("cp"))
    val scored = cnt.join(pref, Seq("w1"))
      .select(col("bg"), expr("(c * 1000000) div cp").as("s"))
    // left join: a bigram unseen by the LM corpus scores 0 ppm (the
    // OOV-transition floor) but still counts toward n_bigrams — with
    // lmCorpus=None every bigram self-counts, so left == inner
    val perDoc = occ.join(scored, Seq("bg"), "left")
      .groupBy(idCol)
      .agg(sum("k").as("n_bigrams"),
        sum(col("k") * coalesce(col("s"), lit(0L))).as("score_sum"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          expr("score_sum div n_bigrams")).as("fam_ppm"))
  }
}
