package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is a pure per-row column expression built from codegen'd
  * built-ins — no UDFs, no shuffles — so each scales linearly with input
  * splits and stays inside WholeStageCodegen.
  */
object TextOps {

  /** Whitespace tokens; empty/blank text → empty array. */
  def tokens(text: Column): Column =
    when(text.isNull || trim(text) === "", array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of word chars count 1 per ~4 chars (subword
    * pieces), plus each punctuation symbol. A cheap, deterministic proxy for
    * LLM token budgeting. */
  def bpeishTokenCount(text: Column): Column = {
    val words = tokens(text)
    val wordPieces = aggregate(
      transform(words, w => ceil(char_length(w).cast(DoubleType) / 4.0)),
      lit(0L), (acc, x) => acc + x.cast(LongType))
    val punct = char_length(regexp_replace(coalesce(text, lit("")), "[\\w\\s]+", ""))
    wordPieces + punct.cast(LongType)
  }

  /** Quality metrics: char/token counts, mean token length, ratios of
    * punctuation / digits / uppercase, stopword ratio. Ratios are rounded to
    * 6 places to be oracle-stable. */
  val EnStopwords = Seq("the", "and", "of", "to", "a", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "an", "be", "this")

  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val t = coalesce(text, lit(""))
    val nChars = char_length(t)
    val toks = tokens(text)
    val nTokens = size(toks)
    val meanTokLen = when(nTokens > 0,
      round(aggregate(transform(toks, w => char_length(w).cast(LongType)),
        lit(0L), (a, x) => a + x).cast(DoubleType) / nTokens, 4)).otherwise(lit(0.0))
    val nPunct = char_length(regexp_replace(t, "[^.,;:!?'\"()\\[\\]-]+", ""))
    val nDigit = char_length(regexp_replace(t, "[^0-9]+", ""))
    val nUpper = char_length(regexp_replace(t, "[^A-Z]+", ""))
    val nStop = size(filter(toks, w => lower(w).isin(EnStopwords: _*)))
    def ratio(n: Column) =
      when(nChars > 0, round(n.cast(DoubleType) / nChars, 6)).otherwise(lit(0.0))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "mean_token_len" -> meanTokLen,
      "punct_ratio" -> ratio(nPunct),
      "digit_ratio" -> ratio(nDigit),
      "upper_ratio" -> ratio(nUpper),
      "stopword_ratio" -> when(nTokens > 0,
        round(nStop.cast(DoubleType) / nTokens, 6)).otherwise(lit(0.0))
    )
  }

  /** Gopher-style document-quality rule battery (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", §A1.1 repetition/quality
    * filters — the word-level subset that needs no line structure):
    * word-count bounds, mean-word-length bounds, fraction of words
    * containing an alphabetic character, required-stopword hits, and a
    * symbol-to-word ratio ('#' and ellipses). `keep` is the conjunction
    * the paper applies; thresholds are parameters because every corpus
    * re-tunes them. Pure per-row expressions over one tokenize — no
    * shuffle, fully codegen'd, trivially 100 TB-safe. */
  val GopherStopwords = Seq("the", "be", "to", "of", "and", "that", "have",
    "with")

  def gopherColumns(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopHits: Int = 2,
      maxSymbolRatio: Double = 0.1): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks).cast(LongType)
    val meanLen = when(nWords > 0,
      round(aggregate(transform(toks, w => char_length(w).cast(LongType)),
        lit(0L), (a, x) => a + x).cast(DoubleType) / nWords, 4))
      .otherwise(lit(0.0))
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast(LongType)
    val alphaFrac = when(nWords > 0,
      round(nAlpha.cast(DoubleType) / nWords, 6)).otherwise(lit(0.0))
    // DISTINCT required-stopword hits: Gopher demands >= 2 of its 8-word
    // list appear, not 2 occurrences of one word
    val stopHits = size(array_intersect(
      array_distinct(transform(toks, w => lower(w))),
      typedlit(GopherStopwords))).cast(LongType)
    val t = coalesce(text, lit(""))
    val nSymbols = (char_length(regexp_replace(t, "[^#]+", "")) +
      (size(split(t, "\\.\\.\\.|\\u2026", -1)) - 1)).cast(LongType)
    val symbolRatio = when(nWords > 0,
      round(nSymbols.cast(DoubleType) / nWords, 6)).otherwise(lit(0.0))
    val keep = nWords.between(minWords, maxWords) &&
      meanLen.between(minMeanLen, maxMeanLen) &&
      alphaFrac >= minAlphaFrac && stopHits >= minStopHits &&
      symbolRatio <= maxSymbolRatio
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanLen,
      "alpha_word_frac" -> alphaFrac,
      "stop_hits" -> stopHits,
      "symbol_ratio" -> symbolRatio,
      "keep" -> keep.cast(LongType)
    )
  }

  /** Language-ID heuristic: per-language function-word hit counts (plus CJK
    * codepoint presence for zh); argmax with deterministic tie order. */
  val LangPatterns: Seq[(String, String)] = Seq(
    "en" -> "(?i)\\b(the|and|of|to|is|in|that|it|for|was)\\b",
    "es" -> "(?i)\\b(el|la|los|las|de|que|y|en|un|una|es|por)\\b",
    "de" -> "(?i)\\b(der|die|das|und|ist|nicht|mit|ein|eine|zu|von)\\b",
    "fr" -> "(?i)\\b(le|la|les|des|est|et|une|dans|pour|que|du)\\b"
  )

  def langScore(text: Column, pattern: String): Column =
    size(split(coalesce(text, lit("")), pattern)) - 1

  /** Argmax over language scores, ties broken by `scores` order; all-zero →
    * "und". Pass *materialized* score columns (attribute refs) — each score
    * is referenced twice (greatest + equality), so an inline regex-split
    * expression here would run twice per row. */
  def langIdFromScores(isZh: Column, scores: Seq[(String, Column)]): Column = {
    val g = greatest(scores.map(_._2): _*)
    val byOrder = scores.foldLeft(when(g <= 0, lit("und"))) {
      case (acc, (l, s)) => acc.when(s === g, lit(l))
    }
    when(isZh, lit("zh")).otherwise(byOrder)
  }

  def isCjk(text: Column): Column = text.rlike("[\\u4e00-\\u9fff]")

  /** Single-expression form; for DataFrame pipelines prefer materializing
    * [[langScore]] columns and calling [[langIdFromScores]]. */
  def langId(text: Column): Column =
    langIdFromScores(isCjk(text),
      LangPatterns.map { case (l, p) => l -> langScore(text, p) })

  /** Unicode scripts profiled by [[scriptColumns]]: display name →
    * (Java regex class, RE2/DuckDB class). Java prefixes scripts with
    * `Is`; RE2 uses the bare name — semantics are the same Unicode
    * Script property. */
  val Scripts: Seq[(String, String, String)] = Seq(
    ("latin", "\\p{IsLatin}", "\\p{Latin}"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("arabic", "\\p{IsArabic}", "\\p{Arabic}"))

  /** Per-script letter fractions + dominant script — the multilingual
    * complement to [[langId]] (script routing decides which per-language
    * pipeline, tokenizer, or quality model a document enters; langid
    * then discriminates within the script). Counting is ONE code-point
    * scan per row (custom codegen'd [[graft.functions.ScriptCounts]] —
    * semantically the `\p{IsXxx}` regex counts, without running five
    * regex engines per row); the fraction is one division rounded 4 dp;
    * the dominant-script argmax compares integer counts with
    * first-listed-wins ties — engine-replayable throughout. Denominator
    * = letters (`\p{L}`), so digits/punct/space don't dilute. */
  def scriptColumns(text: Column): Seq[(String, Column)] = {
    val arr = graft.functions.ScriptExprs.scriptCounts(
      coalesce(text, lit("")))
    val total = arr.getItem(0)
    val counts = Scripts.zipWithIndex.map { case ((name, _, _), i) =>
      name -> arr.getItem(i + 1)
    }
    val dominant = counts.foldLeft((lit("other"), lit(0L))) {
      case ((bestName, bestN), (name, n)) =>
        // strict > keeps first-listed on ties; 0 letters stays "other"
        (when(n > bestN, lit(name)).otherwise(bestName),
          when(n > bestN, n).otherwise(bestN))
    }._1
    Seq("n_letters" -> total) ++
      counts.map { case (name, n) =>
        s"frac_$name" ->
          round(when(total > 0, n.cast(DoubleType) / total.cast(DoubleType))
            .otherwise(lit(0.0)), 4)
      } :+ ("script" -> dominant)
  }

  /** Content fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text. Robust to formatting-only edits. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(coalesce(text, lit(""))), "[^\\p{L}\\p{N}]+", " "))

  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Polynomial rolling hash (Karp-Rabin) of the normalized text mod the
    * Mersenne prime 2^31-1 — a cheap content id; also the primitive behind
    * shingle hashing. The modulus keeps every intermediate < 2^52, so the
    * expression is safe under ANSI arithmetic (Spark 4 default) with no
    * overflow. Driver-side twin [[rollingHashScala]] for tests. */
  val RollingHashMod = 2147483647L // 2^31 - 1

  def rollingHashScala(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 1000003L + s.charAt(i)) % RollingHashMod
      i += 1
    }
    h
  }

  def rollingHash(text: Column): Column =
    aggregate(
      split(normalized(text), ""),
      lit(0L),
      (acc, ch) => pmod(
        acc * lit(1000003L) +
          when(char_length(ch) > 0, ascii(ch).cast(LongType)).otherwise(lit(0L)),
        lit(RollingHashMod)))

  private def repFrac(num: Column, den: Column): Column =
    when(den > 0, round(num.cast(DoubleType) / den, 6)).otherwise(lit(0.0))

  /** Per-row repetition signals over a MATERIALIZED token-array column.
    * `toks` must be a plain column reference, not the tokenize expression:
    * a reference inside the bigram lambda is re-evaluated per array
    * element, so an inline `tokens(normalized(text))` there would re-run
    * the regex pipeline O(tokens) times per row (measured 4-25× this
    * query's entire cost). Ratios are exact-integer double divisions
    * rounded to 6 places (cross-engine stable, see the header rules). */
  def repetitionColumns(toks: Column): Seq[(String, Column)] = {
    val n = size(toks)
    val nDistinct = size(array_distinct(toks))
    // adjacent-token bigrams; i is 0-based, element_at 1-based
    val bigrams = transform(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      (w, i) => concat(w, lit(" "), element_at(toks, i + 2)))
    val nb = size(bigrams)
    Seq(
      "n_tokens" -> n.cast(LongType),
      "dup_token_frac" -> repFrac(n - nDistinct, n),
      "dup_bigram_frac" -> repFrac(nb - size(array_distinct(bigrams)), nb))
  }

  /** Most-frequent-token count of a materialized token-array column,
    * as a run-length scan over the SORTED array: O(n log n) per row,
    * no shuffle. The alternatives both lose: a per-row
    * `transform(distinct, count-scan)` is O(distinct·tokens)
    * interpreted-lambda work (measured 4-25× this cost), and an
    * explode → (doc, token) count → per-doc max needs a shuffle + join
    * back AND silently mis-aggregates if the id column ever carries
    * duplicates — this formulation is row-local, so duplicate ids
    * cannot cross-contaminate. */
  def topTokenCount(toks: Column): Column =
    aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Full repetition signals per document (`n_tokens`, `dup_token_frac`,
    * `top_token_frac`, `dup_bigram_frac`). Tokenizes ONCE into a
    * materialized column; every signal is a row-local expression — one
    * narrow projection, no shuffle, duplicate-id safe. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), tokens(normalized(col(textCol))).as("__toks"))
      .select(
        col(idCol) +:
          (repetitionColumns(col("__toks")) :+
            ("top_token_frac" ->
              repFrac(topTokenCount(col("__toks")), size(col("__toks")))))
            .map { case (n, c) => c.as(n) }: _*)

  /** PII scrubbing: email and phone patterns replaced with typed redaction
    * tags, plus match counts for audit metrics. The regexes stick to the
    * syntax subset shared by Java regex and RE2 so external engines can
    * reproduce the scrub. Pure per-row expressions. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3} [0-9]{3}-[0-9]{4}"

  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(coalesce(text, lit("")), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  def piiCounts(text: Column): Seq[(String, Column)] = {
    val t = coalesce(text, lit(""))
    Seq(
      "n_emails" -> regexp_count(t, lit(EmailRe)).cast(LongType),
      "n_phones" -> regexp_count(t, lit(PhoneRe)).cast(LongType))
  }

  /** Token-window chunking — the downstream of [[graft.ops.Packing]]'s
    * `oversize` flag: split each document into windows of `budget`
    * whitespace tokens overlapping by `overlap` (context continuity for
    * training/embedding). Chunk k covers token positions
    * [k·(budget−overlap), k·(budget−overlap)+budget); the last chunk may
    * be short; a document of ≤ budget tokens yields itself; zero-token
    * documents yield no chunks. Chunk text is the tokens re-joined with
    * single spaces (original whitespace is not preserved — chunking
    * feeds tokenizers, not renderers).
    *
    * Pure per-row explode — tokenize once into a materialized column (the
    * lambda re-evaluation trap), no shuffle, linear in corpus size. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      budget: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && budget > overlap,
      s"need budget=$budget > overlap=$overlap >= 0")
    val stride = budget - overlap
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__toks"))
      .select(col("id"), col("__toks"), size(col("__toks")).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__k",
        greatest(lit(1L),
          ceil((col("__n") - lit(overlap)).cast(DoubleType) / stride)
            .cast(LongType)))
      .select(col("id"), col("__n"),
        posexplode(transform(
          sequence(lit(0L), col("__k") - 1),
          k => array_join(
            slice(col("__toks"), (k * stride + 1).cast(IntegerType),
              lit(budget)),
            " "))))
      .select(col("id"), col("pos").cast(LongType).as("chunk_id"),
        least(lit(budget.toLong), col("__n") - col("pos") * stride)
          .as("chunk_tokens"),
        col("col").as("chunk"))
  }

  /** Tokenize documents to integer id sequences against a vocab built
    * IN-ENGINE from the same corpus: ids 1..`vocabSize` rank tokens by
    * (count desc, token asc); everything else is OOV id 0. The
    * numericalization step that precedes packing/batch assembly.
    *
    * Shapes: token counting is one vocab-bounded aggregate; the vocab
    * top-N is a TakeOrdered over that table (the tiny global row_number
    * runs on ≤vocabSize rows); id assignment is a broadcast left join
    * against the exploded token stream; reassembly is one doc-id
    * shuffle producing the ids string, token count, and OOV count in a
    * single aggregate. Empty docs survive with empty ids. */
  def tokenizeToIds(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    // NOT seamed on purpose (measured r19): checkpointing this
    // positional token stream for its two consumers cost MORE than the
    // saved regex pass (0.96 → 1.08 s warm at sf0.1) — unlike the
    // (id, term, tf) histogram seams (topKeywords, vocabCoverage), the
    // positional stream is larger than the corpus text itself
    val toks = df.select(col(idCol),
      posexplode(tokens(normalized(col(textCol)))).as(Seq("pos", "w")))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(vocabSize)
    val vocab = counts.withColumn("tid",
      row_number().over(Window.orderBy(col("c").desc, col("w")))
        .cast(LongType))
      .select(col("w"), col("tid"))
    val agg = toks.join(broadcast(vocab), Seq("w"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("tid"), lit(0L)).as("tid"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tid")))),
          _.getField("tid").cast(StringType)), " ").as("ids"),
        count(lit(1)).as("n_tokens"),
        count(when(col("tid") === 0L, 1)).as("n_oov"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ids"), lit("")).as("ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Corpus keyword extraction: top-`k` terms per document by rational
    * tf-idf — score = tf · (N+1)/(df+1), N = corpus size, df = document
    * frequency. Rational (no logarithm) on purpose: libm `log` is not
    * bit-identical across engines, integer-derived double division is —
    * so an SQL oracle reproduces scores exactly; the RANKING it induces
    * matches log-idf's (both are monotone decreasing in df for fixed tf).
    *
    * Plan: token explode → (doc, term) tf agg → term df agg → join back →
    * per-doc window top-k. The tf↔df join is left to AQE: on a small
    * vocabulary it converts to a broadcast join at runtime; at corpus
    * scale the distinct-term table grows with the corpus (ids, typos,
    * hashes — far past any broadcast cap), where the shuffle join on
    * `term` is the only shape that survives. Ties broken (df, term) so
    * output is deterministic. */
  def topKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val n = df.count()
    val toks = df.select(col(idCol).as("id"),
        explode(tokens(normalized(col(textCol)))).as("term"))
    // one tokenization pass: the per-doc term histogram feeds both the
    // document-frequency aggregate and the score join — unmaterialized,
    // the corpus tokenize+explode ran once per consumer (the
    // [[vocabCoverage]] r8-measured double-tokenize, same fix)
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(tf)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score",
        col("tf").cast(DoubleType) * lit(n + 1.0) / (col("df") + lit(1L)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("rank").cast(LongType).as("rank"),
        col("score"))
  }

  /** Vocabulary coverage / out-of-vocabulary rate — the LM-free quality
    * prior: what fraction of a document's tokens fall outside the
    * corpus's top-`topK` vocabulary (by document frequency, ties broken
    * by term so the vocabulary is deterministic). High OOV → gibberish,
    * boilerplate, or the wrong language.
    *
    * Plan: ONE tokenization pass. The corpus folds to a per-document term
    * histogram (groupBy(id, term) with map-side combine — the only
    * corpus-sized shuffle, moving combined pairs, not raw tokens), which
    * is localCheckpoint'ed: both the vocabulary build (document frequency
    * = rows per term over the distinct (id, term) pairs — no
    * countDistinct expand needed) and the coverage count read the
    * materialized histogram instead of re-tokenizing the corpus (the
    * r8-measured double-tokenize). The vocabulary is a topK-row artifact
    * — broadcast into the histogram join, then one groupBy(id)
    * re-assembles per-document counts over pre-aggregated rows. Left
    * join keeps zero-token documents (oov_rate 0). */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 1000): DataFrame = {
    val docTerms = df.select(col(idCol).as("id"),
        explode(tokens(normalized(col(textCol)))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(docTerms)
    val vocab = docTerms
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(topK)
      .select(col("term"), lit(1).as("__inv"))
    val counts = docTerms.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("id").agg(sum(col("__c")).as("__n"),
        sum(when(col("__inv").isNotNull, col("__c"))).as("__in"))
    df.select(col(idCol).as("id"))
      .join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        coalesce(col("__in"), lit(0L)).as("n_in_vocab"),
        repFrac(coalesce(col("__n"), lit(0L)) - coalesce(col("__in"), lit(0L)),
          coalesce(col("__n"), lit(0L))).as("oov_rate"))
  }

  /** BPE merge learning — the tokenizer-training step of a data
    * pipeline, run in-engine. Classic byte-pair encoding: starting from
    * per-character symbols, repeatedly merge the highest-weight adjacent
    * symbol pair (weight = Σ word-frequency over words containing the
    * pair; ties broken (left, right) ascending).
    *
    * THE scale property: after one corpus pass builds the distinct-word
    * frequency table, every iteration runs on THAT table — O(vocab)
    * rows, not O(corpus) — so 10 merges over 100 TB cost one corpus
    * aggregate plus 10 tiny vocab-table passes. Symbols live as a
    * space-joined string; merge application is leftmost non-overlapping
    * `replace` on the space-padded string — deterministic and identical
    * in any SQL engine (classic BPE's per-word greedy differs from this
    * only on runs of the merged pair, e.g. "aaaa" with merge (a,a);
    * the rule here is the replayable one). No end-of-word marker:
    * merges are intra-word (the symbol strings are per-word).
    *
    * Returns one row per merge step: (step, left, right, merged,
    * pair_count) — the merge table a tokenizer applies at encode time.
    * Driver-side loop with one small action per merge (argmax of the
    * pair aggregate); the evolving word table is localCheckpoint'ed per
    * step so the plan stays flat. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = df
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(expr("array_join(transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)), ' ')").as("sym"), col("c"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(words)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var continue = merges > 0
    while (continue && step <= merges) {
      val top = words
        .select(col("c"), split(col("sym"), " ").as("a"))
        .select(col("c"), explode(expr(
          "zip_with(slice(a, 1, greatest(size(a) - 1, 0)), " +
            "slice(a, 2, greatest(size(a) - 1, 0)), " +
            "(x, y) -> struct(x as l, y as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) continue = false
      else {
        val (l, r, pc) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step, l, r, l + r, pc))
        val prev = words
        // replace applied exactly TWICE: a matched occurrence consumes
        // its boundary spaces, so back-to-back occurrences inside one
        // word ("a b a b") leave every second one unmerged after a
        // single pass; the second pass catches it. Deeper alternation
        // runs (>4 in one word) may keep a residual occurrence — the
        // pair then simply wins a later step (self-healing), and both
        // engines apply the identical two-pass rule.
        words = words.select(
          trim(expr(
            s"replace(replace(concat(' ', sym, ' '), ' $l $r ', " +
              s"' $l$r '), ' $l $r ', ' $l$r ')")).as("sym"), col("c"))
          .localCheckpoint()
        prev.unpersist()
        step += 1
      }
    }
    words.unpersist()
    out.toSeq.toDF("step", "left_sym", "right_sym", "merged", "pair_count")
      .select(col("step").cast(LongType).as("step"), col("left_sym"),
        col("right_sym"), col("merged"), col("pair_count"))
  }

  /** Batched BPE training — byte-identical OUTPUT to [[bpeTrain]]
    * (strict argmax order), up to `batchN`× fewer driver round trips.
    * The strict trainer's cost at tokenizer scale is the per-merge
    * round trip (one aggregate action + one checkpoint per merge —
    * 30k merges = 30k tiny jobs); this trainer collects the top
    * `batchN` candidate pairs per aggregate and accepts a PREFIX of
    * them per round, applying all accepted merges as one chained
    * replace before re-aggregating.
    *
    * A candidate is accepted only while it is PROVABLY still the
    * strict next argmax after the merges accepted before it:
    *
    *  - a candidate sharing a symbol with an accepted merge is skipped
    *    this round (its count may have changed);
    *  - the acceptance HAZARD is the max count over every not-accepted
    *    candidate that shares a symbol with the accepted set (their old
    *    counts upper-bound every pair the accepted merges changed or
    *    created: a merge (a,b) only reduces (·,a)/(b,·) pairs and only
    *    creates (·,ab)/(ab,·) pairs from them), plus — when the
    *    aggregate was truncated at `batchN` — the last collected count
    *    (an unseen pair's bound);
    *  - an accepted SELF-PAIR merge (l == r, e.g. (a,a)→aa) folds its
    *    OWN count into the hazard: inside a run "a a a a" the pairs it
    *    creates — (aa,a), (a,aa), (aa,aa) — arise from occurrences of
    *    (a,a) itself, so no other candidate's old count bounds them;
    *    only pc(a,a) does. Since candidates arrive count-descending,
    *    this effectively ends the round at the next acceptance check —
    *    the price of exactness on run-heavy corpora;
    *  - the next candidate must STRICTLY exceed the hazard (an equal
    *    count could tie and win on the (l, r) order rule), else the
    *    round ends and the next aggregate re-ranks exactly.
    *
    * Rounds therefore accept many merges while the count curve is
    * steep and symbol-disjoint (the zipf shape real corpora have) and
    * degrade to one merge per round in the adversarial case — never
    * diverging from [[bpeTrain]]'s sequence (BpeBatchSpec pins equality
    * against the strict trainer; the DuckDB oracle replays the strict
    * unrolled stages). */
  def bpeTrainBatched(df: DataFrame, textCol: String, merges: Int,
      batchN: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(batchN >= 1, s"batchN must be >= 1, got $batchN")
    var words = df
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .select(expr("array_join(transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)), ' ')").as("sym"), col("c"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 1
    var rounds = 0L
    var sinceCkpt = 0
    var lastCkpt = words
    var exhausted = false
    while (!exhausted && step <= merges) {
      rounds += 1
      val cand = words
        .select(col("c"), split(col("sym"), " ").as("a"))
        .select(col("c"), explode(expr(
          "zip_with(slice(a, 1, greatest(size(a) - 1, 0)), " +
            "slice(a, 2, greatest(size(a) - 1, 0)), " +
            "(x, y) -> struct(x as l, y as r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("pc"))
        .orderBy(col("pc").desc, col("l"), col("r"))
        .limit(batchN).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cand.isEmpty) exhausted = true
      else {
        val truncated = cand.length == batchN
        val lastPc = cand.last._3
        val touched = scala.collection.mutable.Set.empty[String]
        val acceptedIdx = scala.collection.mutable.Set.empty[Int]
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        // counts of accepted SELF-PAIR merges: the pairs they create
        // are bounded only by their own pc (see the hazard Scaladoc)
        var selfPairHazard = Long.MinValue
        var stop = false
        var i = 0
        while (!stop && i < cand.length &&
            step + accepted.length <= merges) {
          val (l, r, pc) = cand(i)
          if (accepted.isEmpty) {
            accepted += ((l, r, pc)); acceptedIdx += i
            touched ++= Seq(l, r, l + r)
            if (l == r) selfPairHazard = math.max(selfPairHazard, pc)
          } else if (!touched.contains(l) && !touched.contains(r)) {
            // hazard over the WHOLE candidate list, later entries
            // included: an equal-count symbol-sharing pair below this
            // one could, once changed into a created pair, tie and win
            // the (l, r) order rule
            val hazard = cand.indices.foldLeft(
              math.max(selfPairHazard,
                if (truncated) lastPc else Long.MinValue)) { (h, j) =>
              val (jl, jr, jpc) = cand(j)
              if (!acceptedIdx.contains(j) &&
                  (touched.contains(jl) || touched.contains(jr)))
                math.max(h, jpc)
              else h
            }
            if (pc > hazard) {
              accepted += ((l, r, pc)); acceptedIdx += i
              touched ++= Seq(l, r, l + r)
              if (l == r) selfPairHazard = math.max(selfPairHazard, pc)
            } else stop = true
          }
          i += 1
        }
        accepted.foreach { case (l, r, pc) =>
          out += ((step, l, r, l + r, pc)); step += 1
        }
        val symExpr = accepted.foldLeft("concat(' ', sym, ' ')") {
          case (cur, (l, r, _)) =>
            s"replace(replace($cur, ' $l $r ', ' $l$r '), " +
              s"' $l $r ', ' $l$r ')"
        }
        // replace chains stay LAZY for up to 8 rounds before the next
        // checkpoint: re-running ≤16 string replaces over the O(vocab)
        // table inside the next aggregate is microseconds of executor
        // CPU, while a per-round checkpoint is a whole scheduled job —
        // at character-BPE acceptance rates (~1.5 merges/round, see
        // BENCHNOTES r16) the checkpoint job WAS half the round cost
        words = words.select(trim(expr(symExpr)).as("sym"), col("c"))
        sinceCkpt += 1
        if (sinceCkpt >= 8) {
          val prev = lastCkpt
          words = words.localCheckpoint()
          lastCkpt = words
          prev.unpersist()
          sinceCkpt = 0
        }
      }
    }
    lastCkpt.unpersist()
    // observability for the sweep harness: merges-per-aggregate is THE
    // number that says whether batching pays at tokenizer scale
    graft.core.Metrics.gauge("bpe_batched", "rounds", rounds.toDouble)
    graft.core.Metrics.gauge("bpe_batched", "merges", out.length.toDouble)
    out.toSeq.toDF("step", "left_sym", "right_sym", "merged", "pair_count")
      .select(col("step").cast(LongType).as("step"), col("left_sym"),
        col("right_sym"), col("merged"), col("pair_count"))
  }

  /** Apply a learned BPE merge table ([[bpeTrain]]'s output collected as
    * (left, right) in step order) and return per-document subword
    * stats: word count and subword count after all merges. Encoding is
    * ONE codegen'd projection — the k merges fold into k chained
    * two-pass `replace` calls on each word's symbol string (the same
    * rule training applied, so train-then-encode round-trips) — no
    * joins, no shuffle beyond the final per-doc aggregate. */
  def bpeEncodeStats(df: DataFrame, idCol: String, textCol: String,
      mergesInOrder: Seq[(String, String)]): DataFrame = {
    // merge symbols are alphanumeric by construction (normalized()
    // strips everything else), so the literals embed into the SQL
    // expression directly — the exact string the oracle uses
    val base = "concat(' ', array_join(transform(" +
      "sequence(1, length(__w)), i -> substring(__w, i, 1)), ' '), ' ')"
    val symSql = mergesInOrder.foldLeft(base) { case (cur, (l, r)) =>
      s"replace(replace($cur, ' $l $r ', ' $l$r '), ' $l $r ', ' $l$r ')"
    }
    df.select(col(idCol),
        explode(tokens(normalized(col(textCol)))).as("__w"))
      .select(col(idCol),
        size(split(trim(expr(symSql)), " ")).cast(LongType).as("__ns"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__ns")).as("n_subwords"))
  }

  /** Structural fingerprint: md5 of the document's line-length sequence
    * (character count of every '\n'-split line, comma-joined). Two pages
    * from the same template farm share the skeleton even when the slot
    * text differs — the duplicate class content hashing can't see. One
    * codegen'd projection per row, no shuffle. */
  def templateFingerprint(text: Column): Column =
    md5(array_join(transform(
      split(coalesce(text, lit("")), "\n", -1),
      l => length(l).cast(StringType)), ","))

  /** C4 line-level cleaning (Raffel et al. 2020 §2.2, the "Colossal
    * Clean Crawled Corpus" rules) — the line-granularity complement to
    * the word-level [[gopherColumns]] battery: keep a line only if it
    * ends in terminal punctuation (. ! ? "), has at least `minWords`
    * words, and does not mention "javascript"; flag the PAGE for drop
    * when it contains "lorem ipsum" or a curly brace (code), or when
    * the cleaned text carries fewer than `minSentences` sentence
    * terminators. (C4's fourth rule — corpus-level three-sentence-span
    * dedup — is [[graft.ops.Dedup.removeRepeatedSpans]]'s job, not a
    * per-row one.)
    *
    * Everything is string ops on literals — no regex subtleties to
    * drift cross-engine, no tokenizer, NO shuffle: one codegen'd
    * projection per row, the same zero-exchange shape as [[gopherColumns]].
    * Returns (id, clean_text, n_lines, n_kept, n_sentences, keep_page). */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minSentences: Int = 5): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n", -1)
    val keepLine = (l: Column) => {
      val r = rtrim(l)
      (endswith(r, lit(".")) || endswith(r, lit("!")) ||
        endswith(r, lit("?")) || endswith(r, lit("\""))) &&
        size(split(trim(l), "\\s+")) >= minWords &&
        !contains(lower(l), lit("javascript"))
    }
    val kept = filter(lines, keepLine)
    def occurrences(s: Column, ch: String): Column =
      (char_length(s) - char_length(replace(s, lit(ch), lit(""))))
        .cast(LongType)
    df.select(col(idCol),
        array_join(kept, "\n").as("clean_text"),
        size(lines).cast(LongType).as("n_lines"),
        size(kept).cast(LongType).as("n_kept"),
        coalesce(col(textCol), lit("")).as("__raw"))
      .withColumn("n_sentences",
        occurrences(col("clean_text"), ".") +
          occurrences(col("clean_text"), "!") +
          occurrences(col("clean_text"), "?"))
      .withColumn("keep_page",
        col("n_sentences") >= minSentences &&
          // lorem/brace are RAW-page signals (C4 drops the page even
          // when the offending line would also fail the line filter)
          !contains(lower(col("__raw")), lit("lorem ipsum")) &&
          !contains(col("__raw"), lit("{")))
      .drop("__raw")
  }

  /** Template-farm detection: group documents by [[templateFingerprint]]
    * and keep groups of at least `minDocs`. Returns (id, template_id,
    * n_docs) for every member of a detected template group. Group sizes
    * come from a map-side-combined `groupBy(template_id).count` joined
    * back — not a template-keyed window: a detected farm is BY
    * DEFINITION a hot key (millions of pages, one skeleton), and a
    * window would buffer the whole farm on one task (the ShingleBench
    * crossover, BENCHNOTES r14); the count collapses to one row per
    * input partition before its exchange and the join can broadcast or
    * AQE-skew-split. */
  def templateGroups(df: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2): DataFrame = {
    val fps = df.select(col(idCol),
      templateFingerprint(col(textCol)).as("template_id"))
    val sizes = fps.groupBy("template_id")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    fps.join(sizes, Seq("template_id"))
      .select(col(idCol), col("template_id"), col("n_docs"))
  }

  /** Per-group length-outlier flags by EXACT discrete percentiles: a row
    * is an outlier when its value falls strictly outside its group's
    * [p_lo, p_hi] (values at sorted positions ceil(q·n) — discrete
    * selection, so the bound is an actual member value and any SQL
    * engine replays it bit-for-bit; interpolated percentiles are not
    * cross-engine-stable). The winsorization screen run per source
    * before length-sensitive curation.
    *
    * Scale shape (the bounds-only two-pass plan, the
    * [[CorpusStats.winsorize]] pattern — VERDICT r13 #2 closed): ranks
    * come from [[Ranks.grouped]] (never a per-group single-reducer
    * window sort — with provenance-cardinality groups that shape puts a
    * source's ENTIRE row set on one task), one partial-aggregated pass
    * reduces the ranked frame to an O(groups) bounds table (`max(v
    * where rn ≤ ⌈q·n⌉)` = the ⌈q·n⌉-th smallest value — a value at a
    * rank, identical under any tie permutation), which broadcast-joins
    * back onto the plain projected input. No corpus-wide window at
    * all. */
  def lengthOutliers(df: DataFrame, groupCols: Seq[String],
      idCol: String, valueCol: String, pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi < 1 && pLo < pHi, "need 0 < pLo < pHi < 1")
    val gs = groupCols.map(col)
    val slim = df.select((gs :+ col(idCol)) :+ col(valueCol): _*)
    val ranked = Ranks.grouped(slim, groupCols, Seq(col(valueCol)),
      rankCol = Some("__rn"), totalCountCol = Some("__n"))
    val bounds = ranked.groupBy(gs: _*).agg(
      max(when(col("__rn") <= ceil(lit(pLo) * col("__n")).cast("int"),
        col(valueCol))).as("__lo"),
      max(when(col("__rn") <= ceil(lit(pHi) * col("__n")).cast("int"),
        col(valueCol))).as("__hi"))
    val bSel = bounds.select(
      groupCols.zipWithIndex.map { case (g, i) => col(g).as(s"__bg$i") } ++
        Seq(col("__lo"), col("__hi")): _*)
    val cond = groupCols.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__bg$i") }.reduce(_ && _)
    slim.join(broadcast(bSel), cond)
      .select(gs ++ Seq(col(idCol), col(valueCol),
        col("__lo").as("p_lo"), col("__hi").as("p_hi"),
        (col(valueCol) < col("__lo") || col(valueCol) > col("__hi"))
          .as("is_outlier")): _*)
  }

  /** Corpus collocation extraction: top-`k` adjacent bigrams by rational
    * PMI — score = c(ab) · N / (c(a) · c(b)), N = total token count.
    * Rational on purpose (the [[topKeywords]] discipline): every factor
    * is an exact corpus integer, so the score is one integer-derived
    * IEEE multiply/divide an SQL oracle reproduces bit-for-bit, and the
    * ranking it induces equals log-PMI's. `minCount` floors c(ab) —
    * PMI's classic failure mode is hapax pairs scoring highest.
    *
    * Shapes: bigrams come from one `zip_with` over each doc's token
    * array (no positional self-join — the array is materialized once per
    * row); unigram and bigram counts are two aggregates over exploded
    * streams; the pair↔unigram joins are left to AQE (vocab-sized — the
    * broadcast call at a 10⁶-type vocabulary is runtime information);
    * top-k is TakeOrderedAndProject. N is a 1-row aggregate collected
    * driver-side (construction is eager the way [[Search.bm25TopK]] is).
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 100): DataFrame = {
    val toksOf = df.select(tokens(normalized(col(textCol))).as("__toks"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(toksOf)
    val uni = toksOf.select(explode(col("__toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    graft.core.Metrics.deferUnpersist(uni)
    val nRow = uni.agg(sum(col("__c")).as("n")).head()
    val nTok = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    if (nTok == 0L)
      return toksOf.limit(0).select(lit("").as("term_a"),
        lit("").as("term_b"), lit(0L).as("pair_count"),
        lit(0.0).as("score"))
    val pairs = toksOf
      .select(explode(expr(
        "zip_with(slice(__toks, 1, greatest(size(__toks) - 1, 0)), " +
          "slice(__toks, 2, greatest(size(__toks) - 1, 0)), " +
          "(x, y) -> struct(x as a, y as b))")).as("__p"))
      .select(col("__p.a").as("term_a"), col("__p.b").as("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val score = (col("pair_count").cast(DoubleType) * lit(nTok.toDouble)) /
      (col("__ca") * col("__cb")).cast(DoubleType)
    pairs
      .join(uni.select(col("term").as("term_a"), col("__c").as("__ca")),
        Seq("term_a"))
      .join(uni.select(col("term").as("term_b"), col("__c").as("__cb")),
        Seq("term_b"))
      .withColumn("__s", score)
      .orderBy(col("__s").desc, col("term_a"), col("term_b"))
      .limit(k)
      .select(col("term_a"), col("term_b"), col("pair_count"),
        round(col("__s"), 4).as("score"))
  }

  /** Mojibake table: the UTF-8 byte sequences of common non-ASCII chars
    * mis-decoded as Latin-1/CP1252 — the classic double-encoding damage
    * web crawls carry (the screen ftfy exists for; Caswell et al. 2020
    * "Language ID in the Wild" reports encoding damage as a top crawl-
    * quality defect). Keyed by the DAMAGED sequence; value = the
    * original char. Two-char entries are Latin-1-page mis-decodes
    * (é → "Ã©"), three-char entries are CP1252 punctuation (’ → "â€™");
    * U+FFFD marks bytes already lost to a replacement-char decode. */
  val MojibakeMap: Seq[(String, String)] = Seq(
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã¤" -> "ä", "Ã¶" -> "ö", "Ã¼" -> "ü", "Ã§" -> "ç",
    "â€™" -> "'", "â€œ" -> "\"", "â€“" -> "-", "Â°" -> "°", "Â·" -> "·")

  /** Count of occurrences of `seq` in `text` — substring arithmetic
    * (length delta / pattern length), NOT regex, so any SQL engine
    * computes the identical integer with no dialect risk. */
  def occurrences(text: Column, seq: String): Column = {
    require(seq.nonEmpty, "occurrences needs a non-empty pattern")
    ((length(text) - length(replace(text, lit(seq), lit("")))) /
      lit(seq.length)).cast(LongType)
  }

  /** Per-row encoding-damage signals: `n_mojibake` (total occurrences
    * of [[MojibakeMap]] damage sequences), `n_replacement` (U+FFFD
    * chars — bytes unrecoverably lost upstream), `is_damaged`. Pure
    * codegen'd column expressions — the screen runs inside the scan
    * stage at 100 TB, no shuffle, no UDF. */
  def mojibakeColumns(text: Column): Seq[(String, Column)] = {
    val t = coalesce(text, lit(""))
    val n = MojibakeMap.map { case (bad, _) => occurrences(t, bad) }
      .reduce(_ + _)
    val repl = occurrences(t, "�")
    Seq("n_mojibake" -> n, "n_replacement" -> repl,
      "is_damaged" -> (n > 0 || repl > 0))
  }

  /** Repair [[MojibakeMap]] damage by longest-first chained replace
    * (three-char CP1252 artifacts before two-char Latin-1 ones, so
    * "â€™" never half-matches after an inner pair is rewritten).
    * Replacement chars are NOT touched — those bytes are gone; route
    * `n_replacement > 0` rows to quarantine instead. Deterministic,
    * engine-portable, single codegen'd expression chain. */
  def repairMojibake(text: Column): Column =
    MojibakeMap.sortBy(-_._1.length).foldLeft(coalesce(text, lit(""))) {
      case (acc, (bad, good)) => replace(acc, lit(bad), lit(good))
    }
}
