package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword search over the document corpus — the retrieval sibling of
  * the embedding ANN surface ([[SimilarityOps]]): inverted-index
  * postings and BM25 ranking, all as native column expressions.
  *
  * Scale shape (the 100 TB design point): tokens are pruned to the
  * query terms BEFORE the aggregation shuffle, so shuffle volume is
  * O(matching postings), not O(corpus tokens); corpus statistics
  * (N, avgdl) are a 1-row aggregate broadcast to the scorers; per-term
  * document frequencies are |terms| rows — broadcast join. One corpus
  * scan end-to-end.
  */
object SearchOps {

  /** Inverted-index postings for `terms`: (term, doc, tf) — the
    * materialization a repeated-query workload would write out
    * bucketed by term. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String]): DataFrame =
    docs.select(col(idCol),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(array_contains(typedLit(terms), col("term")))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k for a bag of query `terms` (Okapi BM25 with the
    * Lucene-style non-negative idf = ln(1 + (N − df + 0.5)/(df + 0.5))).
    * Returns (idCol, score) for the k highest-scoring docs; ties break
    * on ascending id against the ROUNDED score so ranking is
    * deterministic across engines. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withLen = docs.select(col(idCol), col(textCol),
      TextOps.tokenCount(col(textCol)).cast("double").as("_dl"))
    val stats = withLen.agg(count(lit(1)).cast("double").as("_n"),
      avg(col("_dl")).as("_avgdl"))
    val tf = withLen
      .select(col(idCol), col("_dl"),
        explode(TextOps.tokens(col(textCol))).as("_tok"))
      .filter(array_contains(typedLit(terms), col("_tok")))
      .groupBy(col(idCol), col("_dl"), col("_tok"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val termDf = tf.groupBy(col("_tok"))
      .agg(count(lit(1)).cast("double").as("_df"))
    val scored = tf
      .join(broadcast(termDf), "_tok")
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log((col("_n") - col("_df") + 0.5) / (col("_df") + 0.5) + 1.0))
      .withColumn("_s",
        col("_idf") * col("_tf") * lit(k1 + 1.0) /
          (col("_tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("_s")).as("score"))
    scored
      .orderBy(round(col("score"), 6).desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion of N ranked lists (the standard hybrid-
    * retrieval combiner: sparse BM25 + dense ANN, each contributing
    * 1/(k0 + rank) per member): returns (idCol, n_lists, rrf_micro)
    * where rrf_micro = Σ round(1e9/(k0 + rank)) over the lists that
    * contain the id. Contributions are fixed to INTEGER micro-units
    * before the sum (the q186 bitext convention), so the fused score is
    * order-free and bit-identical on any engine — a float Σ 1/(k0+r)
    * over 3+ lists would expose summation order.
    *
    * Scale shape: union + ONE hash aggregate on the id — no join
    * between the lists, so fusing N lists of k rows shuffles N·k tiny
    * rows regardless of corpus size. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    rankings.map(df => df.select(col(idCol),
        round(lit(1e9) / (lit(k0) + col(rankCol)), 0).cast("long")
          .as("_c")))
      .reduce(_.unionByName(_))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(col("_c")).as("rrf_micro"))
  }

  /** POSITIONAL PHRASE SEARCH ("exact phrase" boolean retrieval —
    * the positional-postings query BM25 can't answer): docs where the
    * phrase terms occur at CONSECUTIVE positions, found by chaining
    * equi-joins on (doc, pos − offset) over the positional postings
    * of the QUERY TERMS ONLY — the `isin` prune reaches the token
    * stream before any join, so the index slice is proportional to
    * the query terms' document frequency, never the corpus. Returns
    * (id, n_occ) with one row per matching doc.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val toks = docs
      .select(col(idCol), posexplode(
        TextOps.tokens(lower(col(textCol)))).as(Seq("_pos", "_w")))
      .where(col("_w").isin(phrase.distinct: _*))
      .localCheckpoint() // one slice feeds every term's posting side
    val head = toks.where(col("_w") === phrase.head)
      .select(col(idCol), col("_pos"))
    phrase.zipWithIndex.drop(1)
      .foldLeft(head) { case (acc, (term, i)) =>
        acc.join(toks.where(col("_w") === term)
            .select(col(idCol), (col("_pos") - i).as("_pos")),
          Seq(idCol, "_pos"))
      }
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occ"))
  }
}
