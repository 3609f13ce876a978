package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language-ID heuristic, quality scoring, and document
  * fingerprinting. All built from codegen-friendly built-in expressions —
  * no UDFs — so they run inside whole-stage codegen and scale linearly
  * with document count (embarrassingly parallel per row; zero shuffles).
  */
object Text {

  /** Whitespace tokenizer; empty tokens filtered so "" input → 0 tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= lit(""))

  /** English-ish stopword markers used for both language-ID and quality
    * scoring. Kept tiny and explicit so the DuckDB oracle can repeat the
    * exact same list.
    */
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val DeMarkers: Seq[String] = Seq("der", "die", "das", "und", "ist")
  val FrMarkers: Seq[String] = Seq("le", "la", "les", "et", "est")
  val EsMarkers: Seq[String] = Seq("el", "los", "las", "y", "es")

  private def hits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** N-gram/stopword-marker language-ID heuristic: the language whose marker
    * list scores the most hits wins; deterministic priority order on ties
    * (en > de > fr > es), 'und' (undetermined) when nothing hits.
    */
  def langGuess(toks: Column): Column = {
    val en = hits(toks, EnMarkers); val de = hits(toks, DeMarkers)
    val fr = hits(toks, FrMarkers); val es = hits(toks, EsMarkers)
    val best = greatest(en, de, fr, es)
    when(best === 0, "und")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
  }

  /** Polynomial rolling-hash fingerprint of the whole document,
    * h = fold(h*31 + codepoint) mod 1e9+7 — deterministic, order-sensitive,
    * and expressible identically in ANSI SQL for the oracle. Computed by
    * the native codegen'd [[graft.functions.PolyHash]] expression.
    */
  def fingerprint(spark: org.apache.spark.sql.SparkSession, textCol: String): Column = {
    graft.functions.PolyHash.register(spark)
    expr(s"${graft.functions.PolyHash.FnName}($textCol, 31, 1000000007)")
  }

  /** Word n-gram shingles: contiguous n-token windows joined by a single
    * space — the unit MinHash-style near-dup usually hashes (word order
    * becomes part of the set, unlike unigram tokens).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array())
      .otherwise(transform(
        sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Character n-gram shingles: every length-`n` substring (the trailing
    * grams shorter when the text runs out, exactly like ANSI substr).
    * Character-level shingling is the standard unit for near-dup detection
    * that must survive token-boundary edits (whitespace/punctuation churn)
    * where word-level shingles break.
    */
  def charShingles(text: Column, n: Int): Column = {
    require(n >= 1, "shingle width must be positive")
    transform(
      sequence(lit(1), greatest(length(text) - lit(n - 1), lit(1))),
      i => text.substr(i, lit(n)))
  }

  /** Chunk documents into overlapping token windows — the
    * context-window-sized pieces a training pipeline feeds downstream.
    * One row per chunk: (doc id, chunk index, chunk text, token count).
    * Pure projection + explode: linear, shuffle-free, parallel per doc.
    */
  def chunk(docs: DataFrame, chunkTokens: Int, strideTokens: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(strideTokens > 0 && chunkTokens > 0)
    val toks = tokens(col(textCol))
    docs
      .withColumn("toks", toks)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(lit(0),
            ceil((size(col("toks")) - lit(chunkTokens)).cast("double") / strideTokens)
              .cast("int")))))
      .withColumn("chunk_toks",
        slice(col("toks"), col("chunk_idx") * strideTokens + 1, lit(chunkTokens)))
      .filter(size(col("chunk_toks")) > 0)
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("chunk_toks")).as("chunk_text"),
        size(col("chunk_toks")).cast("long").as("chunk_tokens"))
  }

  /** Content-defined chunking ([[graft.functions.CdcBoundaries]]): cut
    * each document where the rolling hash of the trailing `window` code
    * points divides `divisor`, so chunk edges follow the content — an
    * insertion early in a document only reshapes the chunks it touches,
    * where [[chunk]]'s fixed-width cuts shift every downstream edge. The
    * per-chunk md5 is the sub-document dedup key: two documents sharing a
    * run of text longer than ~2·divisor share interior chunk digests no
    * matter where the run sits in either document.
    *
    * Scale shape: the boundary scan is one codegen'd rolling pass per
    * document and the rest is array HOFs — linear, shuffle-free; the
    * digest groupBy a caller would add shuffles on content keys only.
    * Empty documents yield no chunks; a document shorter than `window`
    * (no full hash window) is one whole-document chunk.
    */
  def cdcChunks(docs: DataFrame, window: Int = 8, divisor: Long = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && divisor > 0)
    graft.functions.CdcBoundaries.register(docs.sparkSession)
    docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__text"),
        length(col(textCol)).as("__len"),
        expr(s"${graft.functions.CdcBoundaries.FnName}(" +
          s"$textCol, $window, $divisor)").as("__bs"))
      .withColumn("__ends",
        when(size(col("__bs")) > 0 &&
            element_at(col("__bs"), -1) === col("__len"), col("__bs"))
          .otherwise(concat(col("__bs"), array(col("__len").cast("int")))))
      .withColumn("__c", explode(expr(
        "transform(__ends, (e, i) -> struct(i + 1 AS k, " +
          "CASE WHEN i = 0 THEN 1 ELSE __ends[i - 1] + 1 END AS s, e AS e))")))
      .select(col(idCol), col("__c.k").cast("long").as("chunk_idx"),
        col("__c.s").cast("long").as("start_pos"),
        (col("__c.e") - col("__c.s") + 1).cast("long").as("chunk_len"),
        md5(expr("substring(__text, __c.s, __c.e - __c.s + 1)"))
          .as("chunk_md5"))
  }

  /** Concat-and-chop sequence packing: lay each shard's documents end to
    * end in deterministic (`orderCol`) order and cut the token stream every
    * `budgetTokens` — the GPT-style packing step that turns a cleaned corpus
    * into fixed-length training sequences. Each document reports the
    * sequence its first token lands in plus whether it straddles a cut.
    *
    * Scale shape: ONE window partitioned by the shard column (a 100 TB run
    * packs per source/shard exactly like this — a single global token order
    * would serialize the corpus through one partition). Empty documents are
    * dropped (they contribute no tokens to any sequence).
    */
  def packSequences(docs: DataFrame, budgetTokens: Long,
      shardCol: String = "source", orderCol: String = "doc_id",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budgetTokens > 0, "token budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("tokens_before") / budgetTokens))
      .withColumn("end_seq_id",
        floor((col("tokens_before") + col("n_tokens") - 1) / budgetTokens))
      .select(col(shardCol), col(idCol), col("n_tokens"), col("tokens_before"),
        col("seq_id"), (col("end_seq_id") > col("seq_id")).as("straddles_cut"))
  }

  /** Okapi BM25 relevance of every document against a fixed bag of query
    * terms (Robertson/Spärck Jones; the Lucene `(1 + (N-df+0.5)/(df+0.5))`
    * idf flavor, so idf stays positive even for df > N/2). The retrieval
    * primitive of a RAG corpus store, as a batch scoring pass.
    *
    * Plan shape: tf comes from one explode→hash-aggregate FILTERED to the
    * query terms before the shuffle (postings for ≤ |terms| tokens, not the
    * whole vocabulary); df aggregates that same tiny frame; N and avgdl ride
    * along as a one-row broadcast. Linear in corpus size, one shuffle on
    * (doc, term), never a global sort.
    *
    * Engine-parity: idf and the per-term contribution are rounded to 6
    * digits and decimal-cast before the per-doc sum (transcendental `ln`
    * may differ in the last ulp across libm builds; the round washes it),
    * so scores hash-match across engines.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val meta = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        col("__toks"))
    val stats = meta.agg(
      count(lit(1)).cast("long").as("n_docs"),
      (sum(col("dl").cast(D6)).cast("double") / count(lit(1))).as("avgdl"))
    val tf = meta
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val idf = round(log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)), 6)
    val tfc = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / col("avgdl"))))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(idf * tfc, 6).cast(D6).as("__contrib"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("__contrib")).cast("double").as("bm25"))
  }

  /** [[bm25]] against MANY queries at once: `queryTerms` is a
    * (pid, term) frame — each probe's term SET — and the output scores
    * every (probe, doc) pair sharing at least one term. Same Lucene
    * positive-idf arithmetic with per-term contributions rounded +
    * decimal-cast before the sum (engine-exact); df stays the GLOBAL
    * per-term document frequency, independent of which probes ask. The
    * corpus-sized work (tf explode + hash agg) happens once for the
    * union of all probes' terms, restricted BEFORE the shuffle; the
    * per-probe fan-out rides a broadcast of the small query frame, so
    * the shuffled volume is term-selectivity-bounded exactly like the
    * single-query form.
    */
  def bm25PerQuery(docs: DataFrame, queryTerms: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val meta = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("dl"),
        col("__toks"))
    val stats = meta.agg(
      count(lit(1)).cast("long").as("n_docs"),
      (sum(col("dl").cast(D6)).cast("double") / count(lit(1))).as("avgdl"))
    val terms = queryTerms.select(col("term")).distinct()
    val tf = meta
      .select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val idf = round(log(
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0)), 6)
    val tfc = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / col("avgdl"))))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", round(idf * tfc, 6).cast(D6))
      .join(broadcast(queryTerms), Seq("term"))
      .groupBy(col("pid"), col(idCol))
      .agg(count(lit(1)).cast("long").as("n_terms"),
        sum(col("__contrib")).cast("double").as("bm25"))
  }

  /** Corpus unigram log-probability score — the cheap perplexity proxy used
    * to rank documents by "typicality" (fluent text scores high, gibberish
    * and boilerplate low). Two hash aggregations (term counts, then the
    * per-doc mean), one equi-join of the token stream against the vocabulary;
    * the corpus total rides along as a one-row broadcast. Per-token log-probs
    * are rounded then decimal-summed so the mean is order-independent and
    * engine-exact (the oracle-parity discipline from SparkEntry's header).
    */
  /** Exact 6-dp mean of a DECIMAL(_,6) sum named `sumName` over a BIGINT
    * count named `nName`: the sum goes to integer micro-units and divides
    * with half-away-from-zero tie rounding over NON-NEGATIVE operands, so
    * Spark's truncating `div` and DuckDB's flooring `//` agree bit-exactly.
    * `round(sum/count, 6)` on a DOUBLE is NOT engine-stable: Spark rounds
    * the shortest decimal rendering (BigDecimal.valueOf) while DuckDB
    * rounds the binary double, and they split `...xx5` ties (t17 hit one
    * at sf0.001).
    *
    * PRECONDITION: |sumName| < 2^63 / 1e6 ≈ 9.2e12 — the `cast(sum *
    * 1000000 as bigint)` overflows past that (silent null under non-ANSI
    * Spark, error under DuckDB). Log-prob sums are bounded well below it
    * (|logp| ≤ ~30 per token ⇒ needs ~3e11 tokens in ONE doc to trip);
    * callers aggregating unbounded magnitudes must keep the doubling /
    * halving arithmetic in DECIMAL before the final cast instead.
    */
  private[graft] def meanE6Expr(sumName: String, nName: String): Column =
    expr(s"cast((case when $sumName < 0 then -1L else 1L end) * " +
      s"((abs(cast($sumName * 1000000 as bigint)) * 2 + $nName) div ($nName * 2)) " +
      s"as double) / 1e6")

  /** DuckDB rendering of [[meanE6Expr]] (same micro-unit fold, `//` floor
    * division over the same non-negative operands). */
  private[graft] def meanE6Sql(sumName: String, nName: String): String =
    s"CAST((CASE WHEN $sumName < 0 THEN -1 ELSE 1 END) * " +
      s"((abs(CAST($sumName * 1000000 AS BIGINT)) * 2 + $nName) // ($nName * 2)) " +
      s"AS DOUBLE) / 1e6"

  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).cast("long").as("cnt"))
    val total = vocab.agg(sum(col("cnt")).cast("double").as("total"))
    tok.join(vocab, "token")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(log(col("cnt") / col("total")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("logp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(col("logp")).as("logp_sum"))
      .select(col(idCol), col("n_tokens"),
        meanE6Expr("logp_sum", "n_tokens").as("avg_logprob"))
  }

  /** Interpolated bigram-LM quality score — the t13 unigram's stronger
    * sibling (Jelinek-Mercer smoothing, public LM literature): per bigram
    * position, p = λ·c(prev,cur)/c(prev) + (1−λ)·c(cur)/N, scored as the
    * per-doc mean of ln p over positions 2..n. Corpus-trained in the same
    * pass that scores (both count tables come from the scored corpus).
    *
    * Scale shape: bigram and unigram count tables are hash aggregations
    * with map-side partials; the token stream then equi-joins them on the
    * bigram / token keys — shuffles on data-bounded vocab keys, never a
    * cross product; the corpus total is a one-row broadcast. Log-probs
    * round to 6dp then DECIMAL-sum so the mean is order-independent on
    * both engines (t13's parity recipe).
    *
    * Output: (doc_id, n_bigrams, avg_logprob); docs with < 2 tokens carry
    * n_bigrams = 0 and a NULL score.
    */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("toks"))
    val bi = toks.filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(2), size(col("toks"))),
        i => struct(element_at(col("toks"), i - 1).as("prev"),
          element_at(col("toks"), i).as("cur")))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val tok = docs.select(explode(tokens(col(textCol))).as("token"))
    val uni = tok.groupBy(col("token")).agg(count(lit(1)).cast("long").as("cnt"))
    val total = uni.agg(sum(col("cnt")).cast("double").as("total"))
    val big = bi.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).cast("long").as("bcnt"))
    val perDoc = bi
      .join(big, Seq("prev", "cur"))
      .join(uni.select(col("token").as("prev"), col("cnt").as("pcnt")), Seq("prev"))
      .join(uni.select(col("token").as("cur"), col("cnt").as("ccnt")), Seq("cur"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(log(lit(lambda) * col("bcnt") / col("pcnt")
          + lit(1.0 - lambda) * col("ccnt") / col("total")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("lp")).as("lp_sum"))
      .select(col(idCol), col("n_bigrams"),
        meanE6Expr("lp_sum", "n_bigrams").as("avg_logprob"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logprob"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", unigram variant):
    * score every pool document by how much more likely its tokens are
    * under the TARGET distribution (the high-quality slice you want more
    * of) than under the pool's own distribution — log w(doc) =
    * Σ_t [ln p_tgt(t) − ln p_pool(t)], add-one smoothed over the joint
    * vocabulary. Positive log-weight = "looks like the target"; `selected`
    * keeps those, giving a deterministic importance-resampled subset (the
    * hash-free analogue of DSIR's Gumbel sampling — reproducible from the
    * tables alone).
    *
    * Scale shape: two vocab-keyed hash aggregations (target counts, pool
    * counts) full-outer-merged into one per-token weight table; totals are
    * a one-row broadcast; the pool token stream equi-joins the weight
    * table — shuffles on vocab keys only, never a cross product. Each ln
    * rounds to 6dp and the difference DECIMAL-sums per doc, so both the
    * score and the `selected` cut are order-independent and engine-exact
    * (t13's parity recipe; the selection compares the exact DECIMAL sum,
    * not the rounded double).
    */
  def dsirImportance(docs: DataFrame, targetFilter: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol), targetFilter.as("__tgt"),
      explode(tokens(col(textCol))).as("token"))
    val tgtCnt = tok.filter(col("__tgt")).groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("cnt_t"))
    val poolCnt = tok.filter(!col("__tgt")).groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("cnt_p"))
    val vocab = tgtCnt.join(poolCnt, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_t"), lit(0L)).as("cnt_t"),
        coalesce(col("cnt_p"), lit(0L)).as("cnt_p"))
    val tots = vocab.agg(
      sum(col("cnt_t")).cast("double").as("tot_t"),
      sum(col("cnt_p")).cast("double").as("tot_p"),
      count(lit(1)).cast("double").as("v"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val weights = vocab.crossJoin(broadcast(tots))
      .select(col("token"),
        (round(log((col("cnt_t") + 1) / (col("tot_t") + col("v"))), 6).cast(dec)
          - round(log((col("cnt_p") + 1) / (col("tot_p") + col("v"))), 6).cast(dec))
          .as("w"))
    tok.filter(!col("__tgt"))
      .join(weights, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(sum(col("w")).cast("double"), 6).as("log_importance"),
        (sum(col("w")) > lit(0)).as("selected"))
  }

  /** Quality filter: keep documents meeting minimum token count, bounded
    * average token length, and a stopword-ratio floor — the classic
    * heuristic pre-filter of web-scale corpora.
    */
  def qualityFilter(docs: DataFrame, minTokens: Long, maxAvgTokenLen: Double,
      minStopwordRatio: Double, textCol: String = "text"): DataFrame = {
    val f = features(docs, textCol)
    f.filter(col("n_tokens") >= minTokens &&
        col("avg_token_len") <= maxAvgTokenLen &&
        col("stopword_ratio") >= minStopwordRatio)
      .drop("sum_token_len", "stopword_hits")
  }

  /** Repetition signals in the style of the Gopher quality rules (public
    * literature: Rae et al. 2021 §A1.1): the fraction of duplicated token
    * 3-grams and the share of the single most frequent token. High values
    * flag boilerplate/spam documents for removal before training. One
    * projection over the token array — linear, shuffle-free; the
    * per-distinct-token count is O(tokens²) WITHIN a row, bounded by
    * document length, never a cross-row join.
    */
  def repetitionFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs.select(col(idCol), t.as("toks"))
      .withColumn("g3", shingles(col("toks"), 3))
      .select(
        col(idCol),
        size(col("g3")).cast("long").as("n_3grams"),
        round(when(size(col("g3")) === 0, 0.0)
          .otherwise((size(col("g3")) - size(array_distinct(col("g3"))))
            .cast("double") / size(col("g3"))), 6).as("dup_3gram_frac"),
        round(when(size(col("toks")) === 0, 0.0)
          .otherwise(array_max(transform(array_distinct(col("toks")),
            tk => size(filter(col("toks"), x => x === tk))))
            .cast("double") / size(col("toks"))), 6).as("top_token_frac"))
  }

  /** Exact 6-dp rounding of the non-negative integer ratio k/n: the value
    * goes to micro-units with half-up tie rounding entirely in integer
    * arithmetic — `floor((k*2e6 + n) / (2n))` — so Spark and DuckDB agree
    * bit-exactly (a `round(k/n, 6)` on the DOUBLE quotient splits `...5`
    * ties across engines; see [[meanE6Expr]]). The double division inside
    * `floor` is itself exact here: operands stay far below 2^53 and a
    * correctly-rounded quotient of integers that small cannot land within
    * one ulp of a wrong integer boundary. 0 when n = 0.
    */
  private def ratioE6(k: Column, n: Column): Column =
    when(n === 0, lit(0.0)).otherwise(
      floor((k.cast("long") * lit(2000000L) + n.cast("long")) /
        (n.cast("long") * lit(2L))).cast("double") / lit(1e6))

  /** The full Gopher-style repetition rule set (public literature: Rae et
    * al. 2021, Table A1), adapted to token units for whitespace-token
    * corpora: duplicate 2/3/4-gram fractions, the token share covered by
    * the single most frequent 2-gram, the distinct-token ratio, and the
    * composed keep/drop verdict. The verdict compares RAW INTEGER counts
    * cross-multiplied against rational thresholds (dup2 ≤ 1/20, dup3 ≤
    * 1/50, dup4 ≤ 1/50, 2·max2/n ≤ 1/10, distinct/n ≥ 2/5), so the cut is
    * bit-reproducible on any engine — no rounded-double boundary can flip
    * it. Fractions are reported at exact 6 dp via [[ratioE6]].
    *
    * Scale: one projection, zero shuffles; the per-distinct-gram count is
    * O(len²) WITHIN a row only (bounded by document length), never a
    * cross-row join — linear in corpus size, embarrassingly parallel.
    */
  def gopherRepetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // one native hash-map pass per gram order (graft.functions.GramStats:
    // [n_grams, dups, max_count]) instead of the O(len²) interpreted
    // array_distinct/filter chain — identical counts, spec-pinned
    val s = docs.sparkSession
    def st(n: Int) = graft.functions.GramStats(s, col("toks"), n)
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("s1", st(1))
      .withColumn("s2", st(2))
      .withColumn("s3", st(3))
      .withColumn("s4", st(4))
      .select(Seq(col(idCol),
        col("s1").getItem(0).as("n_tokens"),
        col("s2").getItem(0).as("n2"), col("s2").getItem(1).as("dup2"),
        col("s3").getItem(0).as("n3"), col("s3").getItem(1).as("dup3"),
        col("s4").getItem(0).as("n4"), col("s4").getItem(1).as("dup4"),
        col("s2").getItem(2).as("max2"),
        (col("s1").getItem(0) - col("s1").getItem(1)).as("n_distinct")): _*)
      .select(
        col(idCol), col("n_tokens"),
        ratioE6(col("dup2"), col("n2")).as("dup_2gram_frac"),
        ratioE6(col("dup3"), col("n3")).as("dup_3gram_frac"),
        ratioE6(col("dup4"), col("n4")).as("dup_4gram_frac"),
        ratioE6(col("max2") * 2, col("n_tokens")).as("top_2gram_frac"),
        ratioE6(col("n_distinct"), col("n_tokens")).as("distinct_ratio"),
        (col("dup2") * 20 <= col("n2") &&
          col("dup3") * 50 <= col("n3") &&
          col("dup4") * 50 <= col("n4") &&
          col("max2") * 20 <= col("n_tokens") &&
          col("n_distinct") * 5 >= col("n_tokens") * 2).as("gopher_keep"))
  }

  /** Canonical merge ranking for [[bpeTokenize]] — fixed and tiny so the
    * oracle can embed it as a VALUES list; ranks are list positions. In a
    * real deployment this is the `merges.txt` a trained tokenizer ships.
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("s", "c"), ("sc", "an"),
    ("r", "o"), ("ro", "w"), ("t", "a"), ("b", "l"), ("ta", "bl"),
    ("tabl", "e"), ("e", "r"), ("o", "r"), ("s", "t"), ("i", "n"),
    ("d", "a"), ("da", "ta"), ("l", "o"), ("w", "i"), ("wi", "n"))

  /** REAL byte-pair-encoding tokenization over the corpus (Sennrich et al.
    * 2016): every word runs the exact GPT-2-style merge-apply loop against
    * [[BpeMerges]] via the native codegen'd
    * [[graft.functions.BpeEncode]] expression, and the result aggregates
    * to the corpus piece vocabulary with exact counts — the token-level
    * accounting (packing budgets, per-piece frequencies) a training
    * pipeline needs actual-tokenizer numbers for, not the whitespace
    * proxy.
    *
    * Scale: one projection (per-row encode, no shuffle) plus ONE hash
    * aggregate on the piece key, map-combined to |piece vocabulary| rows
    * per partition. Zipf-heavy corpora can dictionary-encode distinct
    * words first (distinct → encode → join back — the oracle's shape);
    * the per-row form keeps the plan a single scan-project-agg.
    */
  def bpeTokenize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    docs.select(explode(tokens(col(textCol))).as("word"))
      .select(explode(
        graft.functions.BpeEncode(spark, col("word"), BpeMerges)).as("piece"))
      .groupBy(col("piece"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** Email-ish and long-digit-run patterns, conservative syntax shared by
    * Java regex and RE2-style engines so the oracle can repeat them.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val LongNumRe = "[0-9]{7,}"

  /** Canonicalize + redact: lowercase, collapse whitespace runs, replace
    * email addresses and 7+-digit runs with typed placeholders — the
    * PII-scrub / normalization pass before hashing or training. Pure
    * codegen'd regexp_replace chain, linear, shuffle-free.
    */
  def normalizeRedact(textCol: Column): Column =
    // collapse BEFORE trim: trim only strips spaces (not tabs/newlines) in
    // both Spark and ANSI SQL, so stray \t at the edges must first be
    // collapsed into plain spaces
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(lower(textCol), EmailRe, "<EMAIL>"),
        LongNumRe, "<NUM>"),
      "\\s+", " "))

  /** Per-document feature vector: token counts, distinct ratio, average
    * token length, stopword ratio, language guess, fingerprint. One
    * projection, no shuffle.
    */
  def features(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    docs
      .withColumn("toks", t)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("sum_token_len",
        aggregate(transform(col("toks"), tk => length(tk).cast("long")),
          lit(0L), (acc, x) => acc + x))
      .withColumn("avg_token_len",
        round(col("sum_token_len").cast("double") / col("n_tokens"), 4))
      .withColumn("stopword_hits", hits(col("toks"), EnMarkers).cast("long"))
      .withColumn("stopword_ratio",
        round(col("stopword_hits").cast("double") / col("n_tokens"), 4))
      .withColumn("lang_guess", langGuess(col("toks")))
      .withColumn("fingerprint", fingerprint(docs.sparkSession, textCol))
      .drop("toks")
  }

  /** Sentence segmentation with stream offsets: sentences are maximal
    * `[^.!?]+` runs plus their trailing terminators (the same regex on
    * both engines — no lookbehind, so RE2 and Java agree), indexed per
    * doc with `char_start` = cumulative length of the preceding extracted
    * sentences (offsets into the extracted stream; a leading terminator
    * run is skipped by the pattern, so stream == source offset except in
    * that degenerate case). The offset window partitions by doc — bounded
    * by per-doc sentence count, never a global sort. Linear, shuffle-free
    * otherwise.
    */
  def sentenceSplit(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val sents = docs.select(col(idCol),
      posexplode(expr(s"regexp_extract_all($textCol, '[^.!?]+[.!?]*', 0)"))
        .as(Seq("pos", "sentence")))
    val w = W.partitionBy(col(idCol)).orderBy(col("pos"))
    sents.select(col(idCol), (col("pos") + 1).cast("long").as("sent_idx"),
      col("sentence"), length(col("sentence")).cast("long").as("n_chars"),
      (sum(length(col("sentence")).cast("long")).over(w)
        - length(col("sentence"))).cast("long").as("char_start"))
  }

  /** Hashed-feature linear quality classifier INFERENCE (the fastText /
    * Vowpal-Wabbit hashing-trick shape, with fixed pseudo-weights so both
    * engines reproduce it): tokens hash into `nBuckets` feature buckets,
    * each bucket carries a deterministic integer micro-weight in
    * [-1e6, 1e6], and a doc's score is the mean token weight — exact
    * BIGINT arithmetic end-to-end (sum of micro-weights, then the
    * half-away-from-zero integer mean), so the decision boundary is
    * bit-identical anywhere. Replace the pseudo-weights with a trained
    * vector and this is production classifier scoring: one explode + one
    * hash agg per doc, no shuffle wider than the doc table.
    */
  def hashedLinearScore(docs: DataFrame, nBuckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.PolyHash.register(spark)
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val wm = tok.select(col(idCol),
      ((lit(2654435761L) *
        (pmod(expr(s"${graft.functions.PolyHash.FnName}(token, 31, 2147483647)"),
          lit(nBuckets.toLong)) + 1)) % lit(2000001L) - lit(1000000L)).as("wm"))
    val agg = wm.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("wm")).cast("long").as("s"))
      .select(col(idCol), col("n_tokens"),
        (when(col("s") < 0, lit(-1L)).otherwise(lit(1L)) *
          expr("(abs(s) * 2 + n_tokens) div (n_tokens * 2)"))
          .cast("long").as("score_micro"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("score_micro"),
        coalesce(col("score_micro") > 0, lit(false)).as("keep"))
  }

  /** Positional inverted index: one posting row (id, pos, term) per token
    * occurrence, positions 1-based. THE index structure for exact-phrase /
    * proximity search over a tokenized corpus; built with a single
    * posexplode so it inherits the scan's partitioning (no shuffle).
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos0", "term")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"),
        col("term"))

  /** Exact phrase search over the positional index — the classic
    * inverted-index phrase plan: each phrase term selects its own postings
    * list, and adjacency is enforced by equi-joining on
    * (id, pos − term offset) so every occurrence of the full phrase
    * surfaces as one (id, start) row. Every join is keyed on BOTH the doc
    * id and the aligned start position, so the shuffles carry only the
    * phrase terms' postings (term-selectivity-bounded, never
    * corpus-bounded) and no per-doc array is ever re-materialized — at
    * 100 TB the cost is the document frequency of the rarest phrase term,
    * exactly as in a search engine.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val post = postings(docs, idCol, textCol)
    val first = post.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos").as("start"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, i)) =>
      val pi = post.filter(col("term") === w)
        .select(col(idCol).as("m_id"), (col("pos") - i).as("m_start"))
      acc.join(pi,
          acc(idCol) === col("m_id") && col("start") === col("m_start"))
        .select(acc(idCol), col("start"))
    }
  }

  /** Per-source unigram KL divergence from the corpus distribution,
    * KL(P_s ‖ P) = Σ_t (c_st/N_s)·ln(c_st·N / (N_s·c_t)) — the
    * dataset-mixing diagnostic (which sources' token distributions drift
    * furthest from the blend they feed). One corpus-sized (source, token)
    * hash agg; everything downstream is vocabulary-bounded: per-source
    * totals broadcast (|sources| rows), corpus term counts re-aggregate
    * the per-source counts (never a second pass over the token stream),
    * and the grand total is a one-row broadcast. Engine parity: the ln
    * argument is the product of two DOUBLE ratios (c_st/N_s)·(N/c_t) —
    * IEEE-deterministic and overflow-free at any corpus size (a BIGINT
    * N_s·c_t product would silently wrap past ~3e9 tokens per uniform
    * source) — and per-term contributions pass through DECIMAL(38,12)
    * before summing so the total is order-independent (the
    * PageRank/logprob recipe).
    */
  def sourceKlDivergence(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(srcCol),
      explode(tokens(col(textCol))).as("tok"))
    // ONE pass over the token stream: the (source, token) counts feed four
    // consumers (contribs, per-source totals, corpus counts, grand total),
    // and without materialization Catalyst re-plans the corpus-sized
    // explode+agg once per consumer — at 100 TB that's 4× the dominant
    // scan. The agg output itself is |sources|·|vocab|-bounded, so
    // checkpointing it is cheap and truncates all four branches to a
    // small-table read.
    val cst = toks.groupBy(col(srcCol), col("tok"))
      .agg(count(lit(1)).cast("long").as("c_st"))
      .localCheckpoint(true)
    val ns = cst.groupBy(col(srcCol))
      .agg(sum(col("c_st")).cast("long").as("n_s"))
    val ct = cst.groupBy(col("tok"))
      .agg(sum(col("c_st")).cast("long").as("c_t"))
    val n = ct.agg(sum(col("c_t")).cast("long").as("n_total"))
    cst.join(broadcast(ns), srcCol)
      .join(ct, "tok")
      .crossJoin(broadcast(n))
      .select(col(srcCol), col("n_s"),
        ((col("c_st").cast("double") / col("n_s")) *
          log((col("c_st").cast("double") / col("n_s")) *
            (col("n_total").cast("double") / col("c_t"))))
          .cast(org.apache.spark.sql.types.DecimalType(38, 12)).as("contrib"))
      .groupBy(col(srcCol), col("n_s"))
      .agg(round(sum(col("contrib")).cast("double"), 6).as("kl"))
      .select(col(srcCol), col("n_s").as("n_tokens"), col("kl"))
  }

  /** TRAIN a BPE merge table from the corpus (Sennrich et al. 2016 —
    * [[graft.functions.BpeEncode]] is the ENCODE side consuming such a
    * table): `rounds` iterations of count-all-adjacent-pairs → pick the
    * most frequent → fuse it everywhere. Returns one row per learned
    * merge: (rank, pair "a b", merged "ab", cnt).
    *
    * Distribution shape, per round:
    *  - the corpus collapses ONCE up front to the word-frequency table
    *    (the standard BPE training substrate) — a vocabulary-sized frame,
    *    orders of magnitude smaller than the corpus at any scale;
    *  - pair counting is one explode + hash agg over that frame;
    *  - the argmax is a 1-row driver pick, the same bounded-metadata
    *    collect discipline as d20/s14's tuner picks (one scalar per
    *    round, never data-scaled);
    *  - the merge applies as a single boundary-guarded string replace,
    *    leftmost non-overlapping in BOTH engines (Java's String.replace
    *    and DuckDB's replace agree), followed by a localCheckpoint so the
    *    per-round plan stays flat instead of growing by one explode+join
    *    per iteration.
    *
    * Symbols join with a DOUBLE space, which is what makes the plain
    * consuming replace equal Sennrich's non-consuming lookaround sub:
    * each symbol owns one boundary space on each side, neighbors never
    * share one, so replacing ' a  b ' with ' ab ' consumes only the
    * pair's own boundaries and the next disjoint occurrence in a run
    * still matches — 'a a a a' merges to 'aa aa' in ONE pass, exactly
    * the reference behavior (single-space joins would consume the shared
    * boundary and merge runs only alternately).
    *
    * OPERATING ENVELOPE: each round costs 2 Spark jobs (the
    * localCheckpoint and the 1-row argmax), so the sequential trainer is
    * sized for rounds ≲ 100 — ample for the taught-vocabulary regimes
    * here, but a 10k-merge production vocabulary would mean 20k jobs of
    * pure scheduler latency over a vocabulary-sized frame. For that
    * regime set `pairsPerRound > 1`: each round picks the top
    * NON-INTERACTING pairs (no shared symbol — a merge can only change
    * the counts of pairs touching its own symbols, so disjoint picks see
    * exactly the counts sequential training would have seen) and fuses
    * them all before the next recount, cutting jobs by up to that
    * factor. An interacting candidate is DEFERRED to the next round's
    * recount, never applied on stale counts; the batch emits in (cnt
    * desc, pair asc) order so ranks stay deterministic. Equality with
    * sequential training when picks don't interact is property-tested;
    * when a fused pair's new symbol would out-rank the stale runner-up,
    * batched and sequential tables may legitimately differ (the standard
    * trade every batched BPE trainer makes — tokenizers.BpeTrainer's
    * max_merges-per-step behaves the same way).
    */
  /** The word-frequency BPE substrate: one row per distinct word with its
    * occurrence count and its DOUBLE-space-joined character symbols (the
    * canonical-fuse invariant both train and apply depend on).
    */
  private def wordSymbolFrame(docs: DataFrame, textCol: String,
      countName: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as(countName))
      .select(col("w"),
        concat_ws("  ", transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as("sym"),
        col(countName))

  /** THE canonical fuse — the one expression every BPE path shares:
    * boundary-guarded, leftmost non-overlapping, exact on runs because
    * each symbol owns its own boundary spaces (double-space joins).
    * Column-typed literals, so corpus-derived symbols need no SQL-string
    * escaping.
    */
  private def canonicalFuse(sym: Column, a: String, b: String,
      merged: String): Column =
    trim(replace(concat(lit(" "), sym, lit(" ")),
      lit(s" $a  $b "), lit(s" $merged ")))

  def bpeTrain(docs: DataFrame, rounds: Int,
      textCol: String = "text", pairsPerRound: Int = 1): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    require(pairsPerRound >= 1, "pairsPerRound must be >= 1")
    val spark = docs.sparkSession
    var words = wordSymbolFrame(docs, textCol, "freq")
      .select(col("sym"), col("freq"))
      .localCheckpoint()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    for (_ <- 1 to rounds) {
      val syms = split(col("sym"), "  ")
      val pairs = words
        .select(col("freq"),
          when(size(syms) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(syms) - 1),
              i => concat_ws(" ", element_at(syms, i), element_at(syms, i + 1))))
            .as("ps"))
        .select(explode(col("ps")).as("pair"), col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
      // over-fetch so the non-interaction filter below still fills the
      // batch when ranked neighbors share symbols; vocabulary-bounded,
      // never data-scaled
      val top = pairs.orderBy(col("cnt").desc, col("pair").asc)
        .limit(math.max(1, pairsPerRound * 8))
        .collect()
      if (top.nonEmpty) {
        // greedy non-interacting batch in rank order: a pair is taken
        // only when neither of its symbols was touched by an earlier
        // pick this round — disjoint merges see exactly the counts the
        // sequential trainer would recount (see envelope note above)
        val used = scala.collection.mutable.Set.empty[String]
        val picked = top.iterator.map { r0 =>
          (r0.getString(0), r0.getLong(1))
        }.filter { case (pair, _) =>
          val Array(a, b) = pair.split(' ')
          if (used(a) || used(b)) false
          else { used += a; used += b; used += (a + b); true }
        }.take(pairsPerRound).toSeq
        picked.foreach { case (pair, cnt) =>
          val Array(a, b) = pair.split(' ')
          val merged = a + b
          rank += 1
          learned += ((rank, pair, merged, cnt))
          words = words.withColumn("sym", canonicalFuse(col("sym"), a, b, merged))
        }
        // ONE checkpoint per ROUND (not per merge): the fuses chain as
        // string replaces inside a single plan, which is the whole point
        // of batching
        if (picked.nonEmpty) words = words.localCheckpoint()
      }
    }
    import spark.implicits._
    learned.result().toDF("rank", "pair", "merged", "cnt")
      .select(col("rank").cast("long").as("rank"), col("pair"),
        col("merged"), col("cnt"))
  }

  /** ENCODE with a learned merge table — [[bpeTrain]]'s inverse
    * direction, at the vocabulary level: every distinct word runs the
    * merge sequence in RANK ORDER (each merge one [[canonicalFuse]], the
    * same operation training used, so train→apply reproduces exactly the
    * segmentation training ended on) and comes out as its piece
    * sequence. One corpus pass for the word count; the merge
    * applications are `merges.length` chained per-row string ops on the
    * vocabulary-sized frame — no shuffle beyond the initial word count,
    * no per-round actions (unlike training there is nothing to pick, so
    * the whole sequence is ONE lazy plan).
    *
    * Semantics note vs [[graft.functions.BpeEncode]]: this is the
    * rank-SEQUENTIAL single pass (merge 1 everywhere, then merge 2, …) —
    * by construction identical to what training produced, which is the
    * t31 reproducibility contract. BpeEncode implements the
    * lowest-rank-FIRST priority loop most runtime tokenizers use; the
    * two can differ on the rare word where a later merge recreates an
    * earlier pair (the priority loop would revisit it, the sequential
    * pass is already past it). Both are standard; a deployment picks one
    * and ships it with the merge table.
    */
  def bpeApply(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame = {
    var words = wordSymbolFrame(docs, textCol, "n_occurrences")
    merges.foreach { case (pair, merged) =>
      val Array(a, b) = pair.split(' ')
      words = words.withColumn("sym", canonicalFuse(col("sym"), a, b, merged))
    }
    words.select(col("w").as("word"),
      size(split(col("sym"), "  ")).cast("long").as("n_pieces"),
      replace(col("sym"), lit("  "), lit(" ")).as("encoded"),
      col("n_occurrences"))
  }
}
