package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface
  * (BASELINE.json north star): tokenization, language ID, quality
  * scoring, token counting, fingerprinting. All native column
  * expressions — codegen'd, no UDFs, no driver round-trips.
  */
object TextOps {

  /** Whitespace tokenization. `split` on \s+ can yield a leading empty
    * token for leading whitespace; filter for exact token semantics. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-unit count: runs of letters, runs of digits, or a
    * single non-alnum non-space char each count as one unit — a cheap
    * deterministic proxy for tokenizer cost accounting. */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "(?<=[a-zA-Z])(?=[^a-zA-Z])|(?<=[0-9])(?=[^0-9])" +
      "|(?<=[^a-zA-Z0-9\\s])(?=.)|\\s+"), t => length(t) > 0))

  /** Distinct-token set. */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Adjacent-bigram structs over an already-materialized token-array
    * column (two-projection friendly): one struct(a, b) per adjacent
    * pair, empty when fewer than 2 tokens. The `when` guard matters:
    * Spark's `sequence(1, n)` REVERSES when n < 1 (step defaults to
    * -1), so a 1-token document would otherwise fabricate a (t[1],
    * t[0]) pair — DuckDB's generate_series is empty there, and so are
    * we. Pure codegen'd builtins; the LM-statistics feed (repetition
    * signals, conditional next-token tables) at corpus scale is this
    * explode + one map-side-combinable count. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("a"),
          element_at(toks, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** Let-binding for column expressions: evaluate `v` ONCE and make it
    * available to `body` as a lambda variable. Catalyst has no `let`;
    * referencing a subexpression twice re-evaluates its whole tree
    * (projection collapse + predicate pushdown re-inline aliases, and
    * a lambda body referencing an outer expression re-evaluates it PER
    * ELEMENT). Encoding: `v` becomes the single element of a wrapper
    * array, `body` runs inside a transform over it, element_at unwraps.
    * Turns an O(elements × cost(v)) evaluation into cost(v) + O(n). */
  def bind(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Word n-gram shingles: the space-joined sliding windows of n
    * consecutive tokens (the classic dedup shingling unit; n = 1
    * degenerates to [[tokens]]). Pure column expressions — a transform
    * over an index sequence, no explode until the caller wants rows.
    * The token array is [[bind]]-bound: without it, every shingle
    * element's slice re-runs the regex split (~n splits per row — the
    * difference between 0.6 s and 14 s on the sf0.1 corpus). */
  def shingles(c: Column, n: Int): Column =
    bind(tokens(c), toks => shinglesOf(toks, n))

  /** [[shingles]] over an already-materialized token array. */
  def shinglesOf(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Distinct shingle set (for shingle-level Jaccard / MinHash). */
  def shingleSet(c: Column, n: Int): Column = array_distinct(shingles(c, n))

  /** Stopword-hit-based language scores: count of hits from each
    * language's marker list; argmax wins, 'und' if no hits. Pure
    * column expressions — one pass, no shuffle. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "que", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** [[langId]] over an already-materialized token-set column. When
    * `toks` is a plain attribute (see the two-projection pattern on
    * [[langId]]) the whole argmax chain stays in whole-stage codegen. */
  def langIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      lang -> ws.map(w => when(array_contains(toks, w), 1).otherwise(0))
        .reduce(_ + _)
    }
    // argmax with deterministic tie-break on language code order
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0 && acc === lit("und"), lit(lang))
        .otherwise(acc)
    }
  }

  /** Single-expression form: the 20 marker probes and the argmax chain
    * all reference the token set, so it is [[bind]]-bound (built once
    * per row, not once per reference). bind's wrapper forces the
    * interpreted higher-order path; when a DataFrame is available,
    * prefer projecting `tokenSet` as a column and calling
    * [[langIdFromTokens]] on the attribute — CollapseProject keeps a
    * non-cheap multiply-referenced alias materialized, and the probe
    * chain then runs fully codegen'd (2× faster than the bind form at
    * sf0.1). */
  def langId(c: Column): Column =
    bind(tokenSet(c), langIdFromTokens)

  /** English stopword sample for the stopword-ratio quality signal. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "is",
    "to", "in", "that", "it")

  /** Heuristic quality features: length, mean word length, type-token
    * ratio, alpha/punctuation character ratios, stopword ratio.
    * Deterministic, SQL-expressible, single pass, no shuffle. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val sw = typedLit(stopwords)
    // two-projection pattern: the token array is projected ONCE and
    // every signal references the attribute — CollapseProject keeps a
    // non-cheap multiply-referenced alias materialized, so the regex
    // split runs once per row instead of once per signal
    val toks = col("_toks")
    val nTok = size(toks)
    val nChr = length(c)
    df.withColumn("_toks", tokens(c))
      .withColumn("n_tokens", nTok)
      .withColumn("n_chars_m", nChr)
      .withColumn("mean_tok_len",
        when(nTok > 0, (nChr - (nTok - 1)).cast("double") / nTok)
          .otherwise(lit(0.0)))
      .withColumn("distinct_ratio",
        when(nTok > 0, size(array_distinct(toks)).cast("double") / nTok)
          .otherwise(lit(0.0)))
      .withColumn("alpha_ratio",
        when(nChr > 0,
          (nChr - length(regexp_replace(c, "[a-zA-Z]", ""))).cast("double")
            / nChr).otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(nChr > 0,
          (nChr - length(regexp_replace(c, "[^a-zA-Z0-9\\s]", "")))
            .cast("double") / nChr).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(nTok > 0,
          size(filter(toks, t => array_contains(sw, t)))
            .cast("double") / nTok).otherwise(lit(0.0)))
      .drop("_toks")
  }

  /** Duplicate-shingle ratio: 1 − distinct/total word n-grams — the
    * repetition signal behind published quality-filter rule sets
    * (degenerate generated text repeats its own n-grams). 0.0 for docs
    * too short to have a shingle. */
  def dupShingleRatio(c: Column, n: Int): Column =
    bind(shingles(c, n), sh =>
      when(size(sh) > 0,
        lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
        .otherwise(lit(0.0)))

  /** Cross-document duplicated-SPAN stats — the corpus-level sibling of
    * [[dupShingleRatio]] (which is within-doc): for every word n-gram
    * occurrence, is that n-gram present in ≥2 distinct documents? Per
    * doc: total span occurrences, duplicated occurrences, and their
    * ratio — the exact-substring dedup signal of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"),
    * where repeated 50-token spans across a corpus are removed; at
    * fixture doc lengths the span unit is the caller's n.
    *
    * Scale shape: two hash aggregates and one equi-join, all keyed on
    * the shingle or the doc id — linear in corpus token count, never
    * pairwise. The exploded occurrence table feeds three consumers, so
    * it is checkpointed once (the q141 single-tokenization convention)
    * instead of re-running the tokenize+explode lineage 3×. */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    val occ = df.select(col(idCol), explode(shingles(col(textCol), n))
      .as("_sh")).localCheckpoint()
    val dup = occ.groupBy(col("_sh"))
      .agg(count_distinct(col(idCol)).as("_docs"))
      .filter(col("_docs") >= 2).select(col("_sh"))
    val perDoc = occ.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
    val dupPerDoc = occ.join(dup, Seq("_sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("dup_spans"))
    perDoc.join(dupPerDoc, Seq(idCol))
      .select(col(idCol), col("n_spans"), col("dup_spans"),
        round(col("dup_spans").cast("double") / col("n_spans"), 6)
          .as("dup_frac"))
  }

  /** Duplicated-span REMOVAL — the rewrite step [[dupSpanStats]] only
    * measures: every token covered by a cross-document n-gram span is
    * dropped and the remaining tokens are re-joined in order (Lee et
    * al. 2022's ExactSubstr deletion, at word-shingle granularity).
    * Returns (id, n_before, n_after, clean) for EVERY doc — callers
    * filter `n_after < n_before` for the rewritten subset.
    *
    * Scale shape: the token array is materialized once (checkpoint) and
    * feeds both the position-explode and the shingle-explode; duplicated
    * spans come from one shingle-keyed aggregate; span→token coverage
    * is a bounded ×n map-side explode, deduped before the anti-join;
    * the rebuild is one per-doc collect_list whose size is bounded by
    * doc length (the q141/packing class — never corpus-sized). */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val tdf = df.select(col(idCol), tokens(col(textCol)).as("_tk"))
      .localCheckpoint()
    val toks = tdf.select(col(idCol),
      posexplode(col("_tk")).as(Seq("_pos", "_tok")))
    val spans = tdf.select(col(idCol),
      posexplode(shinglesOf(col("_tk"), n)).as(Seq("_spos", "_sh")))
    val dupSh = spans.groupBy(col("_sh"))
      .agg(count_distinct(col(idCol)).as("_docs"))
      .filter(col("_docs") >= 2).select(col("_sh"))
    val covered = spans.join(dupSh, Seq("_sh"))
      .select(col(idCol),
        explode(sequence(col("_spos"), col("_spos") + (n - 1)))
          .as("_pos"))
      .distinct()
    val kept = toks.join(covered, Seq(idCol, "_pos"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_after"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          x => x.getField("_tok"))).as("clean"))
    tdf.select(col(idCol), size(col("_tk")).cast("long").as("n_before"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Rule-based quality gate: token-count window + repetition ceiling
    * (the Gopher/RefinedWeb-style threshold filter, composed from the
    * same column expressions as [[qualityFeatures]]). A pure filter —
    * pushes into the scan stage, no shuffle. */
  def qualityGate(df: DataFrame, textCol: String, minTokens: Int,
                  maxTokens: Int, maxDupTrigramRatio: Double): DataFrame = {
    val c = col(textCol)
    df.filter(tokenCount(c) >= minTokens && tokenCount(c) <= maxTokens &&
      dupShingleRatio(c, 3) <= maxDupTrigramRatio)
  }

  /** Fixed-size token chunking with overlap (the context-window
    * splitter): chunk starts at token 1, 1+step, … (step = chunkSize −
    * overlap) while ≤ n; each chunk is the space-rejoined slice of
    * `chunkSize` tokens (the last may be shorter). One explode over
    * O(n/step) starts per doc — no shuffle; empty docs yield no
    * chunks. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"need 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val step = chunkSize - overlap
    df.select(col(idCol), tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) > 0)
      .select(col(idCol),
        explode(sequence(lit(1), size(col("_t")), lit(step))).as("_start"),
        col("_t"))
      .select(col(idCol),
        ((col("_start") - 1) / step).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("_t"), col("_start"), lit(chunkSize)))
          .as("chunk_text"))
  }

  /** PII/URL scrubbing: replace URLs, e-mail addresses, and long digit
    * runs (IDs, account-number-shaped values) with typed placeholder
    * tokens — the standard pre-training redaction pass. A pure
    * regexp_replace chain: codegen'd, one pass over the scan, no UDF,
    * no shuffle. Order matters: URLs first (an e-mail-shaped userinfo
    * inside a URL is part of the URL), then e-mails, then digit runs of
    * ≥ 9 (shorter runs — years, quantities — are signal, not PII).
    * Patterns stay in the RE2 ∩ java.util.regex common subset so the
    * DuckDB oracle applies the identical expressions. */
  def redactPii(c: Column): Column = {
    val url = regexp_replace(c, "https?://[^\\s]+", "<URL>")
    val mail = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(mail, "[0-9]{9,}", "<NUM>")
  }

  /** Corpus-wide top-k terms (exact heavy hitters): explode the token
    * bag, hash-aggregate counts — map-side partial combine keeps the
    * shuffle at distinct-terms × partitions, not total tokens — then
    * top-k as TakeOrderedAndProject (no full sort). Ties at the k
    * boundary break on the term for cross-engine determinism. At 100 TB
    * the shuffle volume is the vocabulary, which is why exact heavy
    * hitters stay feasible where exact medians don't. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)

  /** BPE MERGE-PAIR TRAINING statistics (tokenizer-training prep): run
    * `k` rounds of the byte-pair-encoding training loop over a
    * (word, freq) vocabulary — count adjacent symbol pairs weighted by
    * word frequency, merge the most frequent pair everywhere (ties →
    * lexicographic (a, b)), repeat — and return the merge table
    * (round, sym_a, sym_b, pair_count), the artifact tokenizer training
    * actually produces.
    *
    * MERGE SEMANTICS, pinned for cross-engine replay: each word is
    * encoded as `_s1__s2__..._sn_` (symbols joined by `__`, flanked by
    * `_`; symbols must not contain `_` — callers filter the alphabet).
    * Applying merge (a,b) is then the literal string replacement
    * `_a__b_` → `_ab_`, whose left-to-right non-overlapping scan IS
    * BPE's leftmost-greedy rule (a run `a a a` merges once, `a a a a`
    * twice) — and because each match consumes exactly two symbol slots
    * and restores the `__` boundary, the scan can neither over-merge a
    * run nor match inside a multi-character symbol. Any engine's
    * standard `replace` reproduces it exactly; no per-row loop, no UDF.
    *
    * Scale shape: the loop runs over the VOCABULARY (one corpus-sized
    * groupBy builds (word, freq) once — upstream of this function),
    * so each round is one explode + hash aggregate over vocab-sized
    * data plus one argmax `collect` of a single row (k driver actions
    * total, the [[graft.ops.SimilarityOps.ivfCentroids]] class of
    * driver bridge); the merge application is a map-side projection.
    * The vocab table is localCheckpoint'ed once; round r's plan chains
    * r literal replaces over it (depth k, no re-aggregation). */
  def bpeMerges(words: DataFrame, wordCol: String, freqCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = words.sparkSession
    var enc = words.select(
        concat(lit("_"),
          array_join(filter(split(col(wordCol), ""),
            x => length(x) > lit(0)), "__"),
          lit("_")).as("e"),
        col(freqCol).cast("long").as("f"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val s = split(expr("trim(BOTH '_' FROM e)"), "__")
      val top = enc.select(col("f"), s.as("s"))
        .withColumn("p", explode(arrays_zip(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1))))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word down to one symbol
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, a, b, cnt))
        enc = enc.select(
          replace(col("e"), lit(s"_${a}__${b}_"), lit(s"_$a$b" + "_"))
            .as("e"),
          col("f"))
        round += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "sym_a", "sym_b", "pair_count")
  }

  /** BPE ENCODE (the apply half of [[bpeMerges]]): segment each word
    * into the subword symbols a trained merge list produces — apply the
    * merges IN TRAINING ORDER, each as the same literal `_a__b_` →
    * `_ab_` replace over the boundary encoding (so apply-time greedy
    * behavior matches training bit for bit), then split the final
    * encoding back into symbols. Returns (wordCol, encoding
    * space-joined, n_symbols).
    *
    * Scale shape: the merge list is a tiny driver-side literal (the
    * trained artifact); the whole encode is |merges| chained codegen'd
    * string replaces — a pure map-side projection, ZERO shuffle, the
    * tokenization hot path at 100 TB. */
  def bpeEncode(df: DataFrame, wordCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val enc0 = concat(lit("_"),
      array_join(filter(split(col(wordCol), ""),
        x => length(x) > lit(0)), "__"),
      lit("_"))
    val encoded = merges.foldLeft(enc0) { case (e, (a, b)) =>
      replace(e, lit(s"_${a}__${b}_"), lit(s"_$a$b" + "_"))
    }
    val syms = split(trim(encoded, "_"), "__")
    df.select(col(wordCol), array_join(syms, " ").as("encoding"),
      size(syms).cast("long").as("n_symbols"))
  }

  /** Greedy concat-packing of documents into fixed token-budget training
    * sequences: documents lie head-to-tail in `orderCol` order within
    * each `groupCol` partition (packing runs per shard/language stream
    * in practice, so the window parallelizes across groups); each doc's
    * bin = floor(exclusive-cumulative-tokens / budget) and offset =
    * cum mod budget. Docs straddle bin boundaries — the concat-and-slice
    * model of sequence packing (attention masks keep doc boundaries;
    * split positions are offset arithmetic, not data motion). One
    * exchange on the group key; the running sum is a frame-bounded
    * window aggregate, no self-join. */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
                    textCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("_nt", tokenCount(col(textCol)).cast("long"))
      .withColumn("_cum", coalesce(sum(col("_nt"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol), col(orderCol), col("_nt").as("n_tokens"),
        floor(col("_cum") / budget).cast("long").as("bin"),
        (col("_cum") % budget).cast("long").as("bin_offset"))
  }

  /** Fraction of an array's elements taken by its most frequent value —
    * the "fraction in most common n-gram" repetition signal from
    * published quality-filter rule sets (a doc whose top 2-gram covers
    * 20% of the text is degenerate). Computed as the longest run in the
    * SORTED array via a single `aggregate` fold — per-row, zero
    * shuffle, so the signal costs a projection even at 100 TB (the
    * group-by-gram alternative would shuffle every n-gram occurrence
    * in the corpus). 0.0 for empty arrays. String arrays only (the
    * fold's zero state types `prev` as string — the token/shingle
    * domain this module works in). */
  def topElementFraction(arr: Column): Column = {
    // the run-length expression appears twice in the fold step; keep it
    // a plain duplicated comparison — a per-element [[bind]] pays a
    // wrapper-array + transform + element_at PER ELEMENT (measured
    // ~20% slower), and a run-boundary index formulation (filter over
    // sequence + zip_with of starts) measured slower still: the fold's
    // struct is cheaper than two element_at probes per element.
    def run(acc: Column, x: Column): Column =
      when(x <=> acc.getField("prev"), acc.getField("run") + 1L)
        .otherwise(lit(1L))
    bind(array_sort(arr), sorted =>
      when(size(sorted) === 0, lit(0.0)).otherwise(
        aggregate(sorted,
          struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
            lit(0L).as("best")),
          (acc, x) => struct(x.as("prev"), run(acc, x).as("run"),
            greatest(acc.getField("best"), run(acc, x)).as("best")),
          acc => acc.getField("best")).cast("double") / size(sorted)))
  }

  /** [[topElementFraction]] over the word n-gram shingles of `c`. */
  def topShingleFraction(c: Column, n: Int): Column =
    topElementFraction(shingles(c, n))

  /** [[dupShingleRatio]] over an already-materialized shingle array —
    * for the two-projection pattern (one tokenization + one shingle
    * construction per plan) when several signals share the array. */
  def dupRatioOf(sh: Column): Column =
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
      .otherwise(lit(0.0))

  /** Canonical URL: strip query string and fragment, drop a trailing
    * slash, lowercase scheme+host (the path keeps its case). The
    * standard pre-dedup URL normalization; RE2 ∩ java.util.regex
    * patterns so the DuckDB oracle applies identical expressions. */
  def urlNormalize(c: Column): Column =
    bind(regexp_replace(regexp_replace(c, "[?#].*", ""), "/$", ""), u =>
      concat(lower(regexp_extract(u, "^([A-Za-z]+://[^/]*)", 1)),
        regexp_extract(u, "^[A-Za-z]+://[^/]*(.*)", 1)))

  /** Lowercased host component of a URL ('' if not URL-shaped). */
  def urlHost(c: Column): Column =
    lower(regexp_extract(c, "^[A-Za-z]+://([^/?#]+)", 1))

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set — robust to shuffled word order, cheap exact-near-dup key. */
  def setFingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(tokenSet(c))))

  /** CCNet-style bigram-LM quality score (Wenzek et al. 2020's KenLM
    * perplexity filter, re-expressed with an add-one-smoothed bigram
    * LM): train on `train`'s lowercased whitespace tokens, score each
    * `held` document by per-bigram negative log-likelihood — the
    * quality gate a pretraining pipeline runs after dedup, where low
    * avg_nll ≈ fluent and high ≈ noise. P(b|a) = (n(a,b)+1) /
    * (n(a,·)+V); unseen bigrams and unseen first tokens fall out of
    * the same formula with the counts coalesced to 0.
    *
    * DETERMINISM: each bigram's log-prob is fixed to integer
    * micro-nats (round(ln p × 1e6), the q186 convention) BEFORE the
    * per-doc sum, so no engine ever sums raw doubles in its own order.
    *
    * SCALE: the held side is reduced to per-(doc, a, b) COUNTS before
    * any join, so the two probability lookups join an aggregate, not
    * the raw token stream; both LM tables are observed-vocabulary-
    * bounded (broadcast candidates once pruned); every aggregate is
    * map-side combinable. The tokenized train projection and the pair
    * table are localCheckpoint'ed because each feeds two consumers
    * (the q124/q141 convention).
    */
  def bigramLmScore(train: DataFrame, held: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val trainT = train.select(toks.as("_t"))
      .localCheckpoint() // feeds the pair table AND the vocab count
    val pairs = trainT
      .select(explode(bigrams(col("_t"))).as("_p"))
      .groupBy(col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(count(lit(1)).as("_n_ab"))
      .localCheckpoint() // feeds firsts AND the scoring join
    val firsts = pairs.groupBy(col("_a"))
      .agg(sum(col("_n_ab")).as("_n_a"))
    val vocab = trainT.select(explode(col("_t")).as("_w"))
      .agg(count_distinct(col("_w")).as("_v"))
    held
      .select(col(idCol), explode(bigrams(toks)).as("_p"))
      .groupBy(col(idCol), col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .join(pairs, Seq("_a", "_b"), "left")
      .join(firsts, Seq("_a"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_lp_micro", round(log(
          (coalesce(col("_n_ab"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("_n_a"), lit(0L)) + col("_v")).cast("double"))
        * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_bigrams"),
        sum(col("_c") * col("_lp_micro")).as("sum_lp_micro"))
      .withColumn("avg_nll", round(
        -col("sum_lp_micro").cast("double") / 1e6 / col("n_bigrams"), 6))
  }

  /** c-TF-IDF top terms per cluster (Grootendorst's BERTopic
    * class-based TF-IDF — the topic-labeling pass run after embedding
    * clustering to name what each cluster is about): weight(t, c) =
    * tf(t, c) · ln(1 + A / f(t)), A = average token mass per cluster,
    * f(t) = corpus frequency of t. Common-everywhere terms are damped,
    * cluster-concentrated terms surface.
    *
    * DETERMINISM: tf and f are integers, A is one integer divide, and
    * the weight is fixed to integer micro-units (q186 convention)
    * before the rank window, whose tie-break is (weight desc, token).
    *
    * SCALE: one token explode feeds ONE map-side-combinable (cluster,
    * token) aggregate; corpus frequency and the A scalar derive from
    * that aggregate (vocabulary-sized, localCheckpoint'ed for its
    * three consumers), never from the token stream again. The rank
    * window partitions by cluster over the (cluster, token) table —
    * per-cluster VOCABULARY bounded, not corpus bounded.
    */
  def cTfIdfTopTerms(docs: DataFrame, clusterCol: String,
      textCol: String, k: Int): DataFrame = {
    val tf = docs.select(col(clusterCol).as("cluster"),
        explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col("cluster"), col("_w"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds corpus freq, the A scalar, the weights
    val corpus = tf.groupBy(col("_w")).agg(sum(col("tf")).as("_f"))
    val avgMass = tf.agg((sum(col("tf")).cast("double") /
      count_distinct(col("cluster")).cast("double")).as("_a"))
    tf.join(corpus, Seq("_w"))
      .crossJoin(broadcast(avgMass))
      .withColumn("weight_micro", round(col("tf").cast("double") *
        log(lit(1.0) + col("_a") / col("_f").cast("double")) * 1e6, 0)
        .cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cluster"))
          .orderBy(col("weight_micro").desc, col("_w")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("cluster"), col("rank"), col("_w").as("token"),
        col("tf"), col("weight_micro"))
  }

  /** PMI COLLOCATIONS (pointwise mutual information over adjacent
    * bigrams — the phrase-mining pass a tokenizer/vocabulary pipeline
    * runs to find multi-word units worth fusing): PMI(a,b) =
    * ln(n_ab·N / (n_a·n_b)) with n_a = count of a as FIRST token,
    * n_b = count of b as SECOND token, N = total bigrams. A minimum
    * pair count screens the unstable long tail (classic Church &
    * Hanks practice).
    *
    * DETERMINISM: n_ab·N and n_a·n_b are exact integer products
    * (< 2^53), so the PMI is one divide + one ln fixed to integer
    * micro-nats (q186 convention) — no engine sums raw doubles.
    *
    * SCALE: one token explode → ONE map-side-combinable pair
    * aggregate; firsts/seconds/N all derive from the
    * vocabulary-bounded pair table (localCheckpoint'ed for its
    * multiple consumers, the q124 rule), never the token stream again.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    val pairs = docs
      .select(tokens(lower(col(textCol))).as("_t"))
      .select(explode(bigrams(col("_t"))).as("_p"))
      .groupBy(col("_p.a").as("a"), col("_p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint() // feeds firsts, seconds, N, and the join
    val firsts = pairs.groupBy(col("a")).agg(sum(col("n_ab")).as("_na"))
    val seconds = pairs.groupBy(col("b")).agg(sum(col("n_ab")).as("_nb"))
    val total = pairs.agg(sum(col("n_ab")).as("_n"))
    pairs.where(col("n_ab") >= minCount)
      .join(firsts, "a").join(seconds, "b")
      .crossJoin(broadcast(total))
      .withColumn("pmi_micro", round(log(
          (col("n_ab") * col("_n")).cast("double") /
          (col("_na") * col("_nb")).cast("double")) * 1e6, 0)
        .cast("long"))
      .select(col("a"), col("b"), col("n_ab"), col("pmi_micro"))
  }

  /** Order-sensitive rolling fingerprint: polynomial hash over token
    * xxhash64s, base 31 mod the Mersenne prime 2^31−1. Modular (not
    * wraparound) arithmetic: Spark 4's default ANSI mode turns Long
    * overflow into a runtime error, so operands are kept < 2^36.
    * Detects exact sequence duplicates; cheap single pass. */
  def rollingFingerprint(c: Column): Column = {
    val m = lit(2147483647L)
    aggregate(tokens(c), lit(0L),
      (acc, t) => (acc * lit(31L) + pmod(xxhash64(t), m)) % m)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET distribution than under the RAW distribution —
    * weight(d) = Σ_b count_d(b)·( ln p_t(b) − ln p_r(b) ) with
    * add-one-smoothed bucket probabilities over `buckets` md5 hash
    * buckets. Selection (the "resampling" half) is then a top-k or
    * threshold cut on the returned weight; this deterministic variant
    * omits the paper's Gumbel noise so the cut is reproducible.
    *
    * DETERMINISM: each bucket's log-ratio is fixed to integer
    * micro-nats from an exact integer rational
    * ((n_t(b)+1)·(N_r+B)) / ((n_r(b)+1)·(N_t+B)) — the q195
    * convention — so a document's weight is an order-free integer
    * dot product of its bucket counts against a B-row literal table.
    *
    * SCALE: both distributions collapse to B-row aggregates
    * (map-side combinable, broadcast); scoring is one (doc, bucket)
    * aggregate joined against the broadcast ratio table — one corpus
    * scan per side, no shuffle wider than B per doc. Returns
    * (idCol, n_tokens, weight_micro). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets <= 256, "bucket id comes from the md5 first byte")
    def bucket(w: Column): Column =
      pmod(conv(substring(md5(w), 1, 2), 16, 10).cast("int"),
        lit(buckets))
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(tokens(lower(col(textCol)))).as("_w"))
        .groupBy(bucket(col("_w")).as("_b"))
        .agg(count(lit(1)).as("_n"))
    val tc = bucketCounts(target)
    val rc = bucketCounts(raw)
    val tTot = tc.agg(sum(col("_n")).as("_nt"))
    val rTot = rc.agg(sum(col("_n")).as("_nr"))
    val lam = rc.join(tc.withColumnRenamed("_n", "_t"), Seq("_b"),
        "full_outer")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("_b"),
        round(log(
          ((coalesce(col("_t"), lit(0L)) + 1L) *
            (col("_nr") + buckets)).cast("double") /
          ((coalesce(col("_n"), lit(0L)) + 1L) *
            (col("_nt") + buckets)).cast("double")) * 1e6, 0)
          .cast("long").as("_lam"))
    raw.select(col(idCol), explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col(idCol), bucket(col("_w")).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .join(broadcast(lam), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_tokens"),
        sum(col("_c") * col("_lam")).as("weight_micro"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the
    * MOSS local fingerprinting scheme): hash every `k`-token shingle,
    * slide a window of `w` consecutive hashes, and select each
    * window's minimum (rightmost position on ties — the "robust"
    * rule). The selected set has expected density 2/(w+1) yet
    * GUARANTEES any shared token run of length ≥ w + k − 1 between
    * two documents shares a fingerprint — the positional dedup
    * primitive MinHash (a global signature) cannot provide.
    *
    * DETERMINISM: the hash is the 36-bit md5 prefix of the shingle
    * (engine-portable, q67 convention); min-with-rightmost-tie is
    * ONE integer min over h·2^24 + (2^24−1−pos) — no argmax window
    * needed. Token positions must stay below 2^24 (16M tokens/doc).
    *
    * SCALE: one shuffle by document id, then per-doc windows bounded
    * by document length; the fingerprint table that feeds cross-doc
    * matching is (2/(w+1))·|shingles| rows — the downstream join is
    * the standard hash equi-join on the fingerprint.
    *
    * Returns one row per doc: n_grams, n_fingerprints, fp_digest
    * (md5 of the sorted distinct packed fingerprints — the
    * set-equality witness). Docs with at least one shingle but fewer
    * than w complete windows appear with n_fingerprints = 0; docs
    * shorter than k tokens have no shingles and drop out. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 4): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol))
    winnowGrams(docs, idCol, textCol, k, w)
      .withColumn("_ng", count(lit(1)).over(byDoc))
      .groupBy(col(idCol))
      .agg(max(col("_ng")).as("n_grams"),
        count_distinct(col("_sel")).as("n_fingerprints"),
        md5(concat_ws(",",
          transform(array_sort(collect_set(col("_sel"))),
            x => x.cast("string")))).as("fp_digest"))
  }

  /** The fingerprint TABLE behind [[winnowFingerprints]]: one row per
    * selected fingerprint — (idCol, fp_hash, fp_pos), where fp_pos is
    * the shingle position the winnowing rule picked. This is the side
    * a cross-document matcher equi-joins on fp_hash (two docs sharing
    * a ≥ w+k−1 token run MUST share a row here). */
  def winnowFingerprintRows(docs: DataFrame, idCol: String,
                            textCol: String, k: Int = 4,
                            w: Int = 4): DataFrame =
    winnowGrams(docs, idCol, textCol, k, w)
      .where(col("_sel").isNotNull)
      .select(col(idCol), col("_sel")).distinct()
      .select(col(idCol),
        // integer div/mod — a double `/` would lose bits above 2^53
        expr("_sel DIV 16777216").as("fp_hash"),
        (lit(16777215L) - pmod(col("_sel"), lit(16777216L)))
          .as("fp_pos"))

  /** Shared winnowing core: shingle rows with `_sel` = the packed
    * window minimum for complete-window start positions, null
    * elsewhere. */
  /** Distinct (doc, fingerprint-hash) postings from the winnowing
    * selection — the join side of cross-doc matching (q265's MOSS
    * clusters): the position half of the packed value is stripped
    * (hash = packed div 2^24) because the MOSS sharing guarantee is
    * on HASHES; positions only break window ties. Density 2/(w+1) of
    * the shingle stream, so the posting table (and the downstream
    * fingerprint equi-join) is a small fraction of the corpus. */
  def winnowFingerprintTable(docs: DataFrame, idCol: String,
                             textCol: String, k: Int = 4,
                             w: Int = 4): DataFrame =
    winnowGrams(docs, idCol, textCol, k, w)
      .filter(col("_sel").isNotNull)
      .select(col(idCol), expr("_sel div 16777216").as("fp"))
      .distinct()

  private def winnowGrams(docs: DataFrame, idCol: String,
                          textCol: String, k: Int, w: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol))
    val frame = byDoc.orderBy(col("_pos"))
      .rowsBetween(Window.currentRow, w - 1)
    docs.select(col(idCol),
        posexplode(shingles(lower(col(textCol)), k)).as(Seq("_pos", "_sh")))
      .withColumn("_packed",
        conv(substring(md5(col("_sh")), 1, 9), 16, 10).cast("long") *
          lit(16777216L) + (lit(16777215L) - col("_pos")))
      .withColumn("_sel",
        when(col("_pos") <= count(lit(1)).over(byDoc) - w,
          min(col("_packed")).over(frame)))
  }

  /** CONTENT-DEFINED CHUNKING (Muthitacharoen, Chen & Mazières 2001
    * — the LBFS boundary rule, FastCDC's ancestor, at token
    * granularity): a chunk boundary falls AFTER token p whenever the
    * md5 hash of the k-gram ENDING at p ≡ 0 (mod `mask`), so
    * boundaries move WITH the content — an insertion re-chunks only
    * its own neighborhood, where q64's fixed-width chunks shift every
    * downstream chunk. Expected chunk length ≈ `mask` tokens. All
    * windows are per-doc (doc-length bounded — the partition key is
    * the doc id, so a 100 TB corpus chunks embarrassingly parallel);
    * chunk fingerprints are md5 over the position-ordered token
    * join (engine-portable), and the cross-doc sharing count is one
    * fingerprint-key aggregate joined back — the
    * dedup-at-chunk-granularity primitive of a dedup-storage /
    * incremental-crawl pipeline. Output: (idCol, chunk_id, n_tokens,
    * fp, n_docs_sharing). */
  def contentDefinedChunks(docs: DataFrame, idCol: String,
                           textCol: String, k: Int = 3,
                           mask: Int = 16): DataFrame = {
    require(k >= 2, s"gram size must be >= 2, got $k")
    require(mask >= 2, s"mask must be >= 2, got $mask")
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val toks = docs.select(col(idCol),
      posexplode(tokens(lower(col(textCol)))).as(Seq("_pos", "_w")))
    val gram = concat_ws(" ", (k - 1 to 0 by -1).map { i =>
      if (i == 0) col("_w") else lag(col("_w"), i).over(byDoc)
    }: _*)
    val withChunk = toks
      .withColumn("_bnd", when(col("_pos") >= k - 1 &&
        pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"),
          lit(mask.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk_id", lit(1L) + coalesce(
        sum(col("_bnd")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = withChunk.groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_w")))),
          x => x.getField("_w")), " ")).as("fp"))
      .localCheckpoint() // feeds the share count AND the join-back
    val share = chunks.groupBy(col("fp"))
      .agg(countDistinct(col(idCol)).as("n_docs_sharing"))
    chunks.join(share, Seq("fp"))
      .select(col(idCol), col("chunk_id"), col("n_tokens"),
        col("fp"), col("n_docs_sharing"))
  }

  /** HASHING-TRICK FEATURE STATS (Weinberger et al. 2009 feature
    * hashing — the fixed-width sparse featurization that needs no
    * vocabulary fit): every token maps to bucket md5(token) mod
    * `buckets`; per doc, the populated-bucket count (nnz), token
    * total, and the EXACT integer squared L2 norm Σ c_b² of the
    * hashed count vector (collision-aware — colliding tokens add
    * into one bucket before the square). One token explode + two
    * map-side-combinable hash aggregates; the md5 bucket is the
    * engine-portable q222 convention. */
  def hashingTrickStats(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 64): DataFrame = {
    require(buckets <= 256, "bucket id comes from the md5 first byte")
    docs.select(col(idCol),
        explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col(idCol),
        pmod(conv(substring(md5(col("_w")), 1, 2), 16, 10).cast("int"),
          lit(buckets)).as("_b"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_tokens"),
        count(lit(1)).as("nnz"),
        sum(col("_c") * col("_c")).as("l2sq"))
  }

  /** INTERPOLATED KNESER–NEY bigram LM score (Kneser & Ney 1995;
    * Chen & Goodman 1998's interpolated form — the standard n-gram
    * smoothing a perplexity-gate pipeline reaches for once add-one
    * (q195 / [[bigramLmScore]]) proves too blunt): the bigram
    * probability discounts every seen count by a fixed D and gives
    * the freed mass to the CONTINUATION unigram — how many distinct
    * contexts a word follows, not how often it occurs — so "Francisco"
    * (frequent, but only ever after "San") stops inflating unseen
    * bigrams.
    *
    *   Pcont(b)  = (N1+(·,b) + 1) / (N1+(··) + V)        [add-one so
    *                an unseen continuation still scores]
    *   P(b|a)    = max(c(a,b) − D, 0)/c(a)
    *               + (D · N1+(a,·)/c(a)) · Pcont(b)       [seen a]
    *             = Pcont(b)                               [unseen a]
    *   with D = 0.75 (exact in binary — no decimal drift). With the
    *   +1-smoothed continuation, Σ_b P(b|a) = 1 exactly for every
    *   context (spec-checked).
    *
    * Exactness: all model tables (pair counts, context totals,
    * forward/backward continuation type counts, the (N1+(··), V)
    * scalar pair) are INTEGER aggregates; the one float expression per
    * scored bigram is spelled identically in the DuckDB oracle and
    * fixed to integer micro-nats before the per-doc sum (the q195
    * convention), so document scores hash-compare.
    *
    * Scale shape = [[bigramLmScore]]: the held side collapses to
    * per-doc bigram COUNTS before any model join (so a 100 TB held
    * corpus joins |doc|·|distinct-bigrams-per-doc| rows, not tokens),
    * model tables are vocabulary-bounded, the two corpus scalars ride
    * a 1-row broadcast, and scoring is one map-side projection. */
  def knBigramLmScore(train: DataFrame, held: DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75)
      : DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val trainT = train.select(toks.as("_t"))
      .localCheckpoint() // feeds the pair table AND the vocab count
    val pairs = trainT
      .select(explode(bigrams(col("_t"))).as("_p"))
      .groupBy(col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(count(lit(1)).as("_n_ab"))
      // feeds contexts, continuations, the scalar AND the scoring join
      .localCheckpoint()
    val contexts = pairs.groupBy(col("_a"))
      .agg(sum(col("_n_ab")).as("_n_a"),
        count(lit(1)).as("_n1p_fwd"))
    val conts = pairs.groupBy(col("_b"))
      .agg(count(lit(1)).as("_n1p_bwd"))
    // V = distinct unigrams of the TRAIN corpus (pair firsts miss the
    // final token of each doc — count from the raw token stream,
    // q195's vocab rule); N1+(··) = distinct seen bigrams
    val vocab = trainT.select(explode(col("_t")).as("_w"))
      .agg(count_distinct(col("_w")).as("_v"))
    val consts = pairs.agg(count(lit(1)).as("_n1p_all"))
      .crossJoin(vocab)
    val d = lit(discount)
    val pcont = (coalesce(col("_n1p_bwd"), lit(0L)) + lit(1L))
      .cast("double") /
      (col("_n1p_all") + col("_v")).cast("double")
    val pSeen = greatest(col("_n_ab").cast("double") - d, lit(0.0)) /
      col("_n_a").cast("double") +
      (d * col("_n1p_fwd").cast("double") / col("_n_a").cast("double")) *
      col("_pc")
    held
      .select(col(idCol), explode(bigrams(tokens(lower(col(textCol)))))
        .as("_p"))
      .groupBy(col(idCol), col("_p.a").as("_a"), col("_p.b").as("_b"))
      .agg(count(lit(1)).as("_c"))
      .join(pairs, Seq("_a", "_b"), "left")
      .join(contexts, Seq("_a"), "left")
      .join(conts, Seq("_b"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("_pc", pcont)
      .withColumn("_lp_micro", round(log(
          when(col("_n_a").isNull, col("_pc"))
            .otherwise(pSeen)) * 1e6, 0).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_bigrams"),
        sum(col("_c") * col("_lp_micro")).as("sum_lp_micro"))
      .withColumn("avg_nll", round(
        -col("sum_lp_micro").cast("double") / 1e6 / col("n_bigrams"), 6))
  }

  /** GOOD–TURING frequency re-estimation (Good 1953; the
    * count-of-counts smoothing under every held-out LM estimate): for
    * each observed count level r, the adjusted count r* =
    * (r+1)·N_{r+1}/N_r where N_r = how many distinct tokens occur
    * exactly r times; the unseen-mass estimate P₀ = N₁/N. Raw GT
    * leaves r* = 0 where N_{r+1} = 0 (high-r gaps) — emitted as-is
    * (the classic gap the Simple-GT regression papers fix; the gap
    * levels are part of the pinned output, not hidden).
    *
    * Exactness: token counts, count-of-counts, and N are all integer
    * aggregates; r* and P₀ are fixed to micro-units with ONE float
    * divide each, spelled identically in the oracle — the whole
    * smoothing table hash-compares.
    *
    * Scale shape: one token aggregate (map-side combinable) → a
    * VOCABULARY-sized count table → a LEVEL-sized count-of-counts
    * table (≤ distinct frequencies, typically a few hundred rows at
    * any corpus size); the level self-join for N_{r+1} and the 1-row
    * N broadcast are both bounded — nothing past the first aggregate
    * is corpus-sized. Output: one row per observed level
    * (r, n_r, r_star_micro, n_tokens, p0_micro). */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(tokens(lower(col(textCol)))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).as("_r"))
    val levels = counts.groupBy(col("_r").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .localCheckpoint() // feeds the r+1 self-join AND the totals
    val next = levels.select((col("r") - 1L).as("r"),
      col("n_r").as("_n_next"))
    val totals = levels.agg(sum(col("r") * col("n_r")).as("n_tokens"),
      sum(when(col("r") === 1L, col("n_r")).otherwise(0L)).as("_n1"))
      .select(col("n_tokens"),
        round(col("_n1").cast("double") /
          col("n_tokens").cast("double") * 1e6).cast("long")
          .as("p0_micro"))
    levels.join(next, Seq("r"), "left")
      .crossJoin(broadcast(totals))
      .select(col("r"), col("n_r"),
        round((col("r") + 1L).cast("double") *
          coalesce(col("_n_next"), lit(0L)).cast("double") /
          col("n_r").cast("double") * 1e6).cast("long")
          .as("r_star_micro"),
        col("n_tokens"), col("p0_micro"))
  }

  /** JENSEN–SHANNON DIVERGENCE of each group's token distribution vs
    * the REST of the corpus (Lin 1991) — the corpus-composition
    * diagnostic a mixture pipeline reads before reweighting. Input:
    * the grouped (groupCol, tokCol, cntCol) count table (build it
    * with one hash aggregate over the exploded tokens). JSD(P‖Q) =
    * ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)) with P = the group's
    * distribution and Q = everything else's; tokens the group never
    * saw still carry q-mass (their p=0 term is q·ln 2 — the anti-join
    * side below). Every per-token term fixes to integer NANO-nats
    * BEFORE the cross-token sum (the q186 convention: float adds
    * never reorder), divisions/ln spelled once and mirrored verbatim
    * in the oracle; the final halving/rescale are PLAIN TRUNCATING
    * `div`s (Scala side), which the oracle matches with its
    * sign-split `//` CASE emulation — DuckDB `//` floors, so the
    * CASE is what keeps the two engines equal on a per-term-rounded
    * total that could land a hair negative. Vocabulary-bounded
    * everywhere past the input
    * aggregate; the per-group directory broadcasts. Output:
    * (groupCol, n_tokens, vocab, jsd_micro) with
    * 0 ≤ jsd_micro ≤ ln 2 ·10⁶ ≈ 693147. */
  def jsdVsRest(counts: DataFrame, groupCol: String, tokCol: String,
                cntCol: String): DataFrame = {
    val tok = counts.select(col(groupCol), col(tokCol).as("_tok"),
        col(cntCol).cast("long").as("_c"))
      .localCheckpoint() // feeds group totals, token totals, terms
    val perGrp = tok.groupBy(col(groupCol))
      .agg(sum(col("_c")).as("nl"), count(lit(1)).as("vocab"))
    val perTok = tok.groupBy(col("_tok")).agg(sum(col("_c")).as("ct"))
    val all = perGrp.agg(sum(col("nl")).as("n"))
    val terms = tok.join(perTok, Seq("_tok"))
      .join(broadcast(perGrp.select(col(groupCol), col("nl"))),
        Seq(groupCol))
      .crossJoin(broadcast(all))
      .withColumn("_p", col("_c").cast("double") / col("nl"))
      .withColumn("_q", (col("ct") - col("_c")).cast("double") /
        (col("n") - col("nl")))
      .withColumn("_tp", when(col("_c") > 0,
        col("_p") * log(lit(2.0) * col("_p") / (col("_p") + col("_q"))))
        .otherwise(lit(0.0)))
      .withColumn("_tq", when(col("ct") - col("_c") > 0,
        col("_q") * log(lit(2.0) * col("_q") / (col("_p") + col("_q"))))
        .otherwise(lit(0.0)))
      .select(col(groupCol),
        round(col("_tp") * 1e9).cast("long").as("_tpn"),
        round(col("_tq") * 1e9).cast("long").as("_tqn"))
    val missing = perTok.crossJoin(broadcast(perGrp))
      .join(tok.select(col(groupCol), col("_tok")),
        Seq(groupCol, "_tok"), "left_anti")
      .crossJoin(broadcast(all))
      .withColumn("_q", col("ct").cast("double") /
        (col("n") - col("nl")))
      .select(col(groupCol), lit(0L).as("_tpn"),
        round(col("_q") * log(lit(2.0)) * 1e9).cast("long").as("_tqn"))
    terms.unionByName(missing)
      .groupBy(col(groupCol))
      .agg(sum(col("_tpn")).as("_sp"), sum(col("_tqn")).as("_sq"))
      .join(perGrp, Seq(groupCol))
      .select(col(groupCol), col("nl").as("n_tokens"), col("vocab"),
        expr("((_sp + _sq) div 2L) div 1000L").as("jsd_micro"))
  }

  // ── UNIGRAM-LM (SentencePiece) TOKENIZER ──────────────────────────
  // Kudo 2018 ("Subword Regularization") next to the BPE pair of
  // [[bpeMerges]]/[[bpeEncode]] — the OTHER tokenizer real pipelines
  // ship. The deterministic hard-EM (Viterbi-EM) variant: a fixed
  // candidate inventory, fixed EM rounds, integer micro-nat costs, so
  // the whole trajectory replays bit-for-bit in any engine (the
  // oracle unrolls the per-position DP as generated CTEs).

  /** Candidate-piece INVENTORY for the unigram-LM tokenizer (the seed
    * step): every substring of length 1..maxPieceLen of every
    * vocabulary word, counted per occurrence weighted by word
    * frequency. The inventory keeps ALL single characters (coverage
    * guarantee — every vocabulary word stays segmentable forever)
    * plus the top `topMulti` multi-character pieces by
    * (count DESC, piece ASC). Returns (piece, cnt).
    *
    * Scale shape: one explode of the VOCABULARY (≤ len·maxPieceLen
    * substrings per word — never the corpus token stream) into one
    * map-side-combinable count; the multi-piece cut is a bounded
    * TakeOrderedAndProject, never a global sort. */
  def unigramSeedPieces(words: DataFrame, wordCol: String,
                        freqCol: String, maxPieceLen: Int,
                        topMulti: Int): DataFrame = {
    val w = col(wordCol)
    val subs = words.select(
        explode(flatten(transform(sequence(lit(1), length(w)), j =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(w) - j + 1)),
            l => w.substr(j, l))))).as("piece"),
        col(freqCol).cast("long").as("_f"))
      .groupBy(col("piece")).agg(sum(col("_f")).as("cnt"))
      .localCheckpoint() // feeds the singles filter AND the top-k cut
    subs.where(length(col("piece")) === 1)
      .unionByName(subs.where(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(topMulti))
  }

  /** Add-one-smoothed negative-log-likelihood piece costs in integer
    * micro-nats from (piece, count): cost = round(−ln((cnt+1) /
    * (Σcnt+|inv|))·10⁶). Always positive (cnt+1 < Σcnt+|inv| whenever
    * the inventory has ≥ 2 pieces), so JVM HALF_UP rounding equals
    * DuckDB's away-from-zero round(); the ln runs on the same
    * integer-derived rational in both engines (the q195 add-one
    * convention — unused pieces keep a finite cost, coverage never
    * collapses). Driver math over the inventory-bounded artifact. */
  def unigramCostsMicro(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val tot = counts.map(_._2).sum
    val n = counts.size
    counts.map { case (p, c) =>
      (p, math.round(-math.log((c + 1).toDouble / (tot + n).toDouble) * 1e6))
    }
  }

  /** VITERBI SEGMENTATION under a unigram-LM piece-cost table (the EM
    * E-step of [[unigramTrain]] and the SentencePiece encode): per
    * word, the minimum-total-cost split into inventory pieces —
    * forward DP over the word's own positions, dp[j] = min over piece
    * length l of dp[j−l] + cost(w[j−l+1..j]), ties to the LONGEST
    * piece — then a backward reconstruction walk. BOTH passes are
    * single `aggregate` folds over `sequence(1, len)`: pure per-row
    * expressions, zero shuffle, embarrassingly parallel across
    * words/docs — the tokenization hot path at 100 TB. The cost table
    * is the trained artifact (inventory-bounded map literal). Appends
    * (pieces array<string>, n_pieces, score_micro) to `df`.
    *
    * PRECONDITION (documented, round-16): `costs` must cover every
    * single character that can appear in `wordCol` (the
    * [[unigramSeedPieces]] inventory guarantees this by keeping all
    * singles). A word containing an uncovered character has NO valid
    * segmentation: every DP candidate at that position is the inf
    * sentinel (bl = 0), the backward walk never advances, and the
    * row emits an empty `pieces` array with an inf-magnitude
    * `score_micro` rather than failing — callers that cannot
    * guarantee coverage must filter on
    * `score_micro < Long.MaxValue / 4` (the sentinel) afterwards. */
  def unigramViterbi(df: DataFrame, wordCol: String,
                     costs: Seq[(String, Long)],
                     maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val inf = lit(Long.MaxValue / 4)
    val cm = map(costs.flatMap { case (p, c) => Seq(lit(p), lit(c)) }: _*)
    val w = col(wordCol)
    val len = length(w)
    // forward: dp[idx] = struct(best score s, best last-piece length bl)
    // for the prefix of length idx−1 (1-based array, entry 1 = empty
    // prefix). The fold keeps the expression LINEAR in word length —
    // a static unroll would re-inline the whole prefix per position.
    val dpZero = array(struct(lit(0L).as("s"), lit(0).as("bl")))
    val dp = aggregate(sequence(lit(1), len), dpZero, (acc, j) => {
      def candAt(l: Int): Column = {
        val c = try_element_at(cm, w.substr(j - lit(l - 1), lit(l)))
        when(j >= lit(l) && c.isNotNull,
          struct((element_at(acc, j - lit(l - 1)).getField("s") + c)
            .as("s"), lit(l).as("bl")))
          .otherwise(struct(inf.as("s"), lit(0).as("bl")))
      }
      // strict-less fold from the longest candidate down: equal
      // scores keep the earlier (longer) piece — the pinned tie rule
      // the oracle mirrors with ORDER BY s, bl DESC
      val best = (maxPieceLen - 1 to 1 by -1).map(candAt)
        .foldLeft(candAt(maxPieceLen)) { (b, c) =>
          when(c.getField("s") < b.getField("s"), c).otherwise(b)
        }
      concat(acc, array(best))
    })
    // backward: walk bl pointers from the full length, prepending the
    // piece each step (≤ len steps; finished words idle on pos = 0)
    val btZero = struct(len.cast("int").as("pos"),
      array().cast("array<string>").as("ps"))
    val bt = aggregate(sequence(lit(1), len), btZero, (st, _) => {
      val pos = st.getField("pos")
      val bl = element_at(col("_dp"), pos + 1).getField("bl")
      when(pos > 0,
        struct((pos - bl).as("pos"),
          concat(array(w.substr(pos - bl + 1, bl)), st.getField("ps"))
            .as("ps")))
        .otherwise(st)
    })
    df.withColumn("_dp", dp)
      .withColumn("pieces", bt.getField("ps"))
      .withColumn("n_pieces", size(bt.getField("ps")).cast("long"))
      .withColumn("score_micro",
        element_at(col("_dp"), len + 1).getField("s"))
      .drop("_dp")
  }

  /** UNIGRAM-LM TOKENIZER TRAINING — `rounds` deterministic Viterbi-EM
    * rounds over a fixed [[unigramSeedPieces]] inventory. E-step:
    * segment every vocabulary word under the current costs (ONE
    * distributed [[unigramViterbi]] projection — zero shuffle);
    * M-step: frequency-weighted piece usage counts (ONE map-side-
    * combinable aggregate) re-estimate the costs via
    * [[unigramCostsMicro]]. Returns one row per (round, piece):
    * (round, piece, cnt, cost_micro) — cnt is the round's usage, 0
    * for pieces the Viterbi never chose.
    *
    * The cost artifact (≤ topMulti + alphabet rows) is the only
    * driver bridge per round — the [[bpeMerges]] k-collect
    * convention; the result table itself is inventory-bounded. */
  def unigramTrain(words: DataFrame, wordCol: String, freqCol: String,
                   rounds: Int, maxPieceLen: Int,
                   topMulti: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = words.sparkSession
    import spark.implicits._
    val seed = unigramSeedPieces(words, wordCol, freqCol, maxPieceLen,
        topMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    val vocab = words.select(col(wordCol), col(freqCol).cast("long")
      .as("_f")).localCheckpoint() // re-segmented every round
    var costs = unigramCostsMicro(seed)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long)]
    for (r <- 1 to rounds) {
      val usage = unigramViterbi(vocab, wordCol, costs, maxPieceLen)
        .select(explode(col("pieces")).as("piece"), col("_f"))
        .groupBy(col("piece")).agg(sum(col("_f")).as("cnt"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val cnts = seed.map { case (p, _) => (p, usage.getOrElse(p, 0L)) }
      costs = unigramCostsMicro(cnts)
      val cm = costs.toMap
      cnts.foreach { case (p, c) => out += ((r.toLong, p, c, cm(p))) }
    }
    out.toSeq.toDF("round", "piece", "cnt", "cost_micro")
  }

  /** UNIGRAM-LM TRAINING WITH INVENTORY PRUNING — the real
    * SentencePiece shape (Kudo 2018 §3.2: EM alternates estimate ↔
    * prune until the vocabulary reaches its target): each round runs
    * [[unigramTrain]]'s E-step (one zero-shuffle Viterbi projection
    * over the vocabulary) and M-step usage counts, then DROPS the
    * bottom `prunePct`% of MULTI-character pieces by usage
    * (cnt ASC, piece ASC — the pinned deterministic rank; nDrop =
    * ⌊nMulti·prunePct/100⌋) before re-costing over the SURVIVING
    * inventory. Single characters are never pruned, so every
    * vocabulary word stays segmentable forever (the coverage
    * guarantee [[unigramViterbi]]'s precondition needs). The result
    * table shows the SHRINKING inventory: round r emits only that
    * round's survivors.
    *
    * The per-round cost artifact (≤ topMulti + alphabet rows) is the
    * only driver bridge — the [[bpeMerges]] k-collect convention;
    * inventories past the low thousands should return the usage
    * aggregate as a frame instead (the round-15 verdict note on
    * [[unigramTrain]]). Returns (round, piece, cnt, cost_micro). */
  def unigramTrainPruned(words: DataFrame, wordCol: String,
                         freqCol: String, rounds: Int,
                         maxPieceLen: Int, topMulti: Int,
                         prunePct: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(prunePct >= 0 && prunePct < 100,
      s"prunePct must be in [0, 100), got $prunePct")
    val spark = words.sparkSession
    import spark.implicits._
    val seed = unigramSeedPieces(words, wordCol, freqCol, maxPieceLen,
        topMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    val vocab = words.select(col(wordCol), col(freqCol).cast("long")
      .as("_f")).localCheckpoint() // re-segmented every round
    var inv: Seq[(String, Long)] = seed
    var costs = unigramCostsMicro(inv)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long)]
    for (r <- 1 to rounds) {
      val usage = unigramViterbi(vocab, wordCol, costs, maxPieceLen)
        .select(explode(col("pieces")).as("piece"), col("_f"))
        .groupBy(col("piece")).agg(sum(col("_f")).as("cnt"))
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val cnts = inv.map { case (p, _) => (p, usage.getOrElse(p, 0L)) }
      val (singles, multis) = cnts.partition(_._1.length == 1)
      val nDrop = multis.size * prunePct / 100
      val kept = multis.sortBy { case (p, c) => (c, p) }.drop(nDrop)
      inv = (singles ++ kept).sortBy(_._1)
      costs = unigramCostsMicro(inv)
      val cm = costs.toMap
      inv.foreach { case (p, c) => out += ((r.toLong, p, c, cm(p))) }
    }
    out.toSeq.toDF("round", "piece", "cnt", "cost_micro")
  }

  /** The final cost artifact of [[unigramTrain]] (the piece → micro-nat
    * cost table the encode path broadcasts) — re-derived by the same
    * loop, the q192 retrain convention. */
  def unigramTrainCosts(words: DataFrame, wordCol: String,
                        freqCol: String, rounds: Int, maxPieceLen: Int,
                        topMulti: Int): Seq[(String, Long)] = {
    val last = unigramTrain(words, wordCol, freqCol, rounds,
        maxPieceLen, topMulti)
      .where(col("round") === rounds)
      .collect().map(r => (r.getString(1), r.getLong(3))).toSeq
    last.sortBy(_._1)
  }

  /** All single-character-deletion variants of a string — the SymSpell
    * neighborhood generator (Garbe 2012): |w| strings, each missing
    * one position. Pure array expression. */
  private def deleteVariants(w: Column): Column =
    array_distinct(transform(sequence(lit(1), length(w)),
      i => concat(w.substr(lit(1), i - 1),
        w.substr(i + 1, length(w) - i))))

  /** SYMSPELL EDIT-DISTANCE JOIN (Garbe 2012's delete-neighborhood
    * blocking — the spell-variant/near-key consolidation pass a
    * vocabulary-cleaning pipeline runs): all word pairs within
    * Levenshtein distance ≤ 2, found WITHOUT the n² distance scan.
    * If ed(a, b) = k ≤ 2, deleting the edited positions reaches a
    * common string in ≤ k deletions from each side — so candidates
    * are exactly the pairs sharing a member of {w} ∪ del¹(w) ∪
    * del²(w) (≤ 1 + |w| + |w|² strings per word), ONE equi-join on
    * the variant key; the exact `levenshtein` verify then runs only
    * on candidates. Both the blocking theorem and the verify replay
    * verbatim in any engine.
    *
    * SCALE: the neighborhood explode and join are VOCABULARY-sized
    * (never the corpus token stream), the join key is a bounded
    * generated column, and no pair of words is ever compared unless
    * it shares a variant — the canonical sub-quadratic fuzzy join.
    * The del² neighborhood is O(|w|²) strings per word, so a single
    * hostile mega-token could dominate the explode: words longer
    * than `maxWordLen` fail LOUDLY (raise_error on the word column
    * itself, so the guard cannot be pruned away) rather than
    * silently exploding — callers with longer keys raise the bound
    * explicitly and accept the L² cost.
    *
    * ==BEHAVIOR CHANGE (round 16)== the `maxWordLen = 24` default is
    * NEW: before round 16 any word length was accepted silently. A
    * caller with a legitimate >24-char vocabulary (chemical names,
    * agglutinative languages, URLs-as-tokens) now fails at runtime
    * until it passes an explicit larger bound — that failure is the
    * intended loud surfacing of a cost the old default paid
    * silently, but existing callers upgrading across the change must
    * audit their vocabularies (24 covers every English corpus word
    * in the fixtures; `maxWordLen = 64` restores near-old behavior
    * at up-to-64² variants per word).
    * Output: (w_a, w_b, dist, f_a, f_b) with w_a < w_b. */
  def symspellPairs(words: DataFrame, wordCol: String,
                    freqCol: String, maxWordLen: Int = 24): DataFrame = {
    require(maxWordLen >= 1,
      s"maxWordLen must be >= 1, got $maxWordLen")
    val w0 = col(wordCol)
    // the guard rides the word column every consumer reads; under
    // the bound it is the identity, over it the job fails with the
    // offending word in the message
    val w = when(length(w0) <= maxWordLen, w0)
      .otherwise(raise_error(concat(
        lit(s"symspellPairs: word exceeds maxWordLen=$maxWordLen: "),
        w0)).cast("string"))
    val vocab = words.select(w.as("_w"),
      col(freqCol).cast("long").as("_f"))
    val d1 = deleteVariants(col("_w"))
    val vars = vocab.select(col("_w"),
        explode(array_distinct(concat(
          array(col("_w")), d1,
          flatten(transform(d1, v => array_distinct(
            transform(sequence(lit(1), length(v)),
              i => concat(v.substr(lit(1), i - 1),
                v.substr(i + 1, length(v) - i))))))))).as("_var"))
    val cand = vars.as("a")
      .join(vars.as("b"), col("a._var") === col("b._var") &&
        col("a._w") < col("b._w"))
      .select(col("a._w").as("w_a"), col("b._w").as("w_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("w_a"), col("w_b"))
        .cast("long"))
      .where(col("dist") <= 2)
      .join(vocab.select(col("_w").as("w_a"), col("_f").as("f_a")),
        "w_a")
      .join(vocab.select(col("_w").as("w_b"), col("_f").as("f_b")),
        "w_b")
      .select(col("w_a"), col("w_b"), col("dist"), col("f_a"),
        col("f_b"))
  }

  /** HEAPS'-LAW FIT (Heaps 1978; the vocabulary-growth exponent next
    * to q178's Zipf head fit — V(T) ≈ K·T^β, the datasheet number
    * that says how fast a corpus keeps minting new types): sample the
    * growth curve at `bins` positions along the document order — per
    * bin, token mass and NEW-type count (a type's bin = the first bin
    * it appears in, one min-aggregate over the vocabulary) — then the
    * cumulative (T, V) points and the q178 regr_slope/intercept/r2
    * fit on the ln–ln curve.
    *
    * SCALE: the curve is sampled at a FIXED bin grid, so the
    * cumulative window orders `bins` rows no matter how many
    * documents stream through (a per-document curve would serialize
    * the corpus through one window); token mass and first-occurrence
    * both reduce map-side. No r² is reported: on a saturating corpus
    * ln V goes CONSTANT and r² is 0/0 — engine-dependent float noise
    * — while the slope/intercept numerators collapse to an ε that
    * rounds away at 6 dp (slope exactly 0 after rounding), so those
    * stay cross-engine deterministic. Returns one row:
    * (n_bins_fit, total_tokens, vocab, heaps_beta, heaps_intercept). */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String,
               bins: Int): DataFrame = {
    val n = docs.agg(max(col(idCol)).cast("long").as("_mx"))
    // exact integer bin cut (non-negative operands, so Spark's
    // truncating `div` == DuckDB's flooring `//` — the pinned rule)
    val toks = docs.crossJoin(broadcast(n))
      .select(col(idCol).cast("long").as("_id"), col("_mx"),
        explode(tokens(lower(col(textCol)))).as("_tok"))
      .select(expr(s"_id * ${bins}L div (_mx + 1L)").as("_bin"),
        col("_tok"))
      .localCheckpoint() // feeds mass AND first-occurrence
    val mass = toks.groupBy(col("_bin"))
      .agg(count(lit(1)).as("_nt"))
    val news = toks.groupBy(col("_tok"))
      .agg(min(col("_bin")).as("_bin"))
      .groupBy(col("_bin")).agg(count(lit(1)).as("_nv"))
    val wCum = Window.orderBy(col("_bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mass.join(news, Seq("_bin"), "left")
      .withColumn("_t", sum(col("_nt")).over(wCum))
      .withColumn("_v", sum(coalesce(col("_nv"), lit(0L))).over(wCum))
      .where(col("_t") > 0 && col("_v") > 0)
      .agg(count(lit(1)).as("n_bins_fit"),
        max(col("_t")).as("total_tokens"),
        max(col("_v")).as("vocab"),
        // + 0.0 normalizes IEEE negative zero: on a saturated corpus
        // the covariance collapses to ±ε and the rounded slope lands
        // on -0.0 or 0.0 per accumulation order — distinct hash
        // strings for the same value. x + 0.0 is exact for every
        // other double.
        (round(regr_slope(log(col("_v")), log(col("_t"))), 6)
          + 0.0).as("heaps_beta"),
        (round(regr_intercept(log(col("_v")), log(col("_t"))), 4)
          + 0.0).as("heaps_intercept"))
  }
}
