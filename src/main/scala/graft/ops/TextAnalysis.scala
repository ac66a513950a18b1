package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: quality stats,
  * language-ID heuristic, token counting, and document fingerprinting.
  * Every output column is an integer or hash — deliberately no floating
  * point in driver-compared results. All pure Catalyst (oracle-able).
  */
object TextAnalysis {

  /** Per-document quality stats: lengths, token counts, stopword counts,
    * type/token info — the usual filter features. */
  def qualityStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(split(col("text"), " ")).as("n_tokens"),
      size(array_distinct(split(col("text"), " "))).as("n_types"),
      expr("size(filter(split(text, ' '), t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and'))").as("n_stop"),
      expr("aggregate(split(text, ' '), 0, (acc, t) -> greatest(acc, length(t)))").as("max_token_len"),
    )

  /** Marker-word language-ID vote. Deterministic argmax with fixed tie
    * order (en > de > es > fr); 'und' when no marker hits. */
  def langId(docs: DataFrame): DataFrame = {
    def score(markers: Seq[String]) = {
      val cond = markers.map(m => s"t = '$m'").mkString(" OR ")
      expr(s"size(filter(split(text, ' '), t -> $cond))")
    }
    val scored = docs.select(
      col("doc_id"),
      score(Seq("the", "of", "and")).as("s_en"),
      score(Seq("der", "und", "die")).as("s_de"),
      score(Seq("el", "los", "las")).as("s_es"),
      score(Seq("le", "les", "et")).as("s_fr"),
    )
    scored.select(
      col("doc_id"),
      when(greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")) === 0, "und")
        .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr").as("predicted"),
      greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr")).as("votes"))
  }

  /** BPE-ish token counting: alpha runs, digit runs, and single non-space
    * symbols each count as one token. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).as("bpeish_tokens"),
    )

  /** Subword (BPE-style) token accounting — the unit training pipelines
    * actually meter cost in: greedy longest-prefix segmentation against the
    * merged-subword vocabulary (graft.functions.Subword), applied to the
    * ASCII-sanitized lowercase text so both engines tokenize identical
    * bytes. A narrow map-only projection: the vocabulary is a plan-time
    * constant inside the codegen expression, so the count adds no join, no
    * broadcast variable, and no UDF barrier at any corpus size. */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.GraftFunctions.bpe_count(
        lower(regexp_replace(col("text"), "[^A-Za-z0-9]+", " "))).as("n_bpe"))

  /** Document fingerprint: md5 of the whitespace-collapsed, lowercased
    * text — the exact-dedup key that survives formatting noise. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"),
    )

  /** Max per-word frequency as the longest equal-adjacent run of the SORTED
    * token array (`arr` = any array<string> SQL fragment) — the exactness of
    * an explode + groupBy count without its (doc_id, word) exchange; shared
    * by [[repetitionStats]] and [[corpusFilter]]'s repetition rule. */
  private def topWordCountExpr(arr: String) =
    s"""aggregate(
         array_sort($arr),
         named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
         (acc, w) -> named_struct(
           'prev', w,
           'run',  CASE WHEN acc.prev IS NOT NULL AND w = acc.prev THEN acc.run + 1 ELSE 1 END,
           'best', greatest(acc.best,
                     CASE WHEN acc.prev IS NOT NULL AND w = acc.prev THEN acc.run + 1 ELSE 1 END)),
         acc -> acc.best)"""

  /** Gopher-style repetition metrics: repeated-bigram mass and the count of
    * the most frequent word. Shapes chosen for 100 TB: everything is a
    * per-row narrow projection (array HOFs over the token list — work
    * bounded by document length, no shuffle), including `top_word_count`
    * (see [[topWordCountExpr]]). */
  def repetitionStats(docs: DataFrame): DataFrame =
    // Written with slice/zip_with (array-level ops) rather than per-index
    // element_at(split(...), i): a split inside a HOF lambda re-tokenizes
    // the document once PER ELEMENT (O(len·words) per row); here split is
    // evaluated a constant number of times per row.
    docs.select(
      col("doc_id"),
      expr("size(split(text, ' ')) - 1").as("n_bigrams"),
      expr("""size(array_distinct(zip_with(
                slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
                slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
                (a, b) -> concat(a, ' ', b))))""")
        .as("distinct_bigrams"),
      expr(topWordCountExpr("split(text, ' ')")).as("top_word_count"),
    )

  /** Rule-based corpus filter (the C4/Gopher-style keep/drop gate a
    * training-data pipeline runs before anything expensive): per document,
    * `keep` plus the FIRST failing rule as `reason` (null when kept) — the
    * reason taxonomy is what makes removal rates auditable per rule.
    * Defaults are the published Gopher bounds: 50–100k words, mean word
    * length in [3, 10], ≥ 2 stopwords, most-frequent word ≤ 20% of tokens.
    *
    * Scale shape: a map-only narrow projection — every rule is integer
    * arithmetic on the token array of the row itself (mean word length is
    * compared as `word_chars ≷ bound × n_tokens`, so no floating point
    * reaches the driver-hashed output), and the repetition rule reuses
    * [[topWordCountExpr]]'s sorted-run fold instead of an explode +
    * groupBy — the whole filter runs in the scan's projection with no
    * shuffle, which is the only acceptable cost for a gate that touches
    * all 100 TB by definition. The token array and the rule cascade are
    * each bound ONCE in their own projection (the HOF rules are
    * CodegenFallback, so expression-level CSE cannot be assumed to fire;
    * CollapseProject keeps a non-cheap alias referenced more than once in
    * its own project, so Catalyst preserves the single evaluation). */
  def corpusFilter(docs: DataFrame,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanWordLen: Int = 3, maxMeanWordLen: Int = 10,
                   minStopwords: Int = 2, maxTopWordPct: Int = 20): DataFrame = {
    val ntok = size(col("__toks"))
    val wchars = length(translate(col("text"), " ", ""))
    val nstop = expr("size(filter(__toks, t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and'))")
    val reason = when(col("text").isNull, "null_text")
      .when(ntok < minWords, "too_few_words")
      .when(ntok > maxWords, "too_many_words")
      .when(wchars < ntok * minMeanWordLen, "mean_word_len_low")
      .when(wchars > ntok * maxMeanWordLen, "mean_word_len_high")
      .when(nstop < minStopwords, "too_few_stopwords")
      .when(expr(topWordCountExpr("__toks")) * 100 > ntok * maxTopWordPct, "repetitive")
    docs.select(col("doc_id"), col("text"), split(col("text"), " ").as("__toks"))
      .select(col("doc_id"), reason.as("reason"))
      .select(col("doc_id"), col("reason").isNull.as("keep"), col("reason"))
  }

  /** Rolling-hash fingerprint: 64-bit FNV-1a over the chars of the
    * normalized text, via the native codegen `fnv1a64` expression — one
    * streaming pass per document, no digest allocation (vs md5), and the
    * same hash the MinHash stages use, so fingerprints and shingle hashes
    * share one lattice. */
  def rollingFingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.GraftFunctions
        .fnv1a64(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp64"),
    )

  /** Corpus term statistics — the inverted-index aggregate under TF-IDF /
    * BM25 scoring and vocabulary pruning: per term, document frequency and
    * total term frequency, thresholded at `minDf` (a singleton-term tail is
    * noise for scoring and dominated by typos at corpus scale).
    *
    * Scale shape: the (term, doc_id) explode is the classic inverted-index
    * shuffle, but both aggregations are sum/count — associative with
    * map-side partial aggregation — so stopword skew ("the" appearing in
    * every document) concentrates COUNTS, not rows: each map task
    * pre-collapses its local (term, doc_id) pairs, and the term-keyed
    * reduce sees one partial row per (task, hot term), not the raw
    * postings. No cap is needed for the same reason — output cardinality
    * is the vocabulary, not the postings list. Integer-only output so the
    * driver hash is float-free; scoring (idf = ln(N/df) etc.) stays a
    * downstream map over this table. */
  def termStats(docs: DataFrame, minDf: Long = 5L): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
      .filter(col("df") >= minDf)
}
