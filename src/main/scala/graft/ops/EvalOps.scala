package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline EVALUATION operators — the measurement half of the
  * retrieval ([[SearchOps]], [[SimilarityOps]]) and classification
  * (`ml.IdsPipeline`) surfaces: ranked-retrieval metrics
  * (P@k / recall@k / MRR / NDCG), exact ROC-AUC, and calibration
  * (reliability bins + ECE).
  *
  * Exactness convention: every transcendental constant (the NDCG
  * log-discount table) is fixed to INTEGER micro-units on the driver
  * and embedded as a literal in BOTH engines (the q186/q193
  * convention), and every per-group reduction runs over exact
  * integers with the float divides happening once, at the end, on
  * identical operands — so metric values are bit-reproducible across
  * engines and partitionings.
  *
  * Scale shape (the 100 TB design point): rankingMetrics consumes an
  * already-truncated top-k table (k·|queries| rows — ONE hash
  * aggregate); rocAuc never sorts the row set — scores collapse to a
  * grouped (score, n_pos, n_neg) table and ranking becomes a
  * two-level prefix sum (the q181 pattern: O(buckets) driver offsets
  * + bucket-partitioned windows), so a 10^11-row score column
  * aggregates map-side before anything is ordered; calibrationBins is
  * two hash aggregates and a broadcast.
  */
object EvalOps {

  /** TOP-K OVERLAP (recall@k of one ranked result set against a
    * reference) — the ANN-quality readout as a first-class RELATIONAL
    * op: per query, |approx ∩ exact| over the reference's top-k, as
    * an exact ppm rational. Unlike [[rankingMetrics]] (graded
    * relevance labels), this compares two RESULT SETS — the
    * approx-vs-brute-force evaluation every ANN deployment runs
    * before trusting an index. With a DETERMINISTIC index
    * (`ivfTopKMicro`) and the deterministic brute force, the metric
    * itself is hash-oracle-able (q274) — ANN quality becomes a
    * checked quantity, not a spec-only recall floor.
    *
    * Scale shape: both inputs are already-truncated top-k tables
    * (k·|queries| rows); the overlap is one equi-join on
    * (query, item) + one hash aggregate against the reference's
    * per-query counts — nothing data-sized. */
  def topKOverlap(approx: DataFrame, exact: DataFrame,
                  queryCol: String, itemCol: String): DataFrame = {
    val ex = exact.select(col(queryCol), col(itemCol))
    val n = ex.groupBy(col(queryCol)).agg(count(lit(1)).as("n_exact"))
    val hits = ex
      .join(approx.select(col(queryCol), col(itemCol)),
        Seq(queryCol, itemCol), "left_semi")
      .groupBy(col(queryCol)).agg(count(lit(1)).as("hits"))
    n.join(hits, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("n_exact"),
        expr("coalesce(hits, 0) * 1000000 div n_exact")
          .as("recall_ppm"))
  }

  /** NDCG discount table in integer micro-units:
    * gain(r) = round(1e6 / log2(r + 1)), r = 1..k. */
  def dcgGainsMicro(k: Int): Array[Long] =
    (1 to k).map(r => math.round(1e6 * math.log(2) / math.log(r + 1.0)))
      .toArray

  /** Prefix sums of [[dcgGainsMicro]] — ideal DCG for m relevant docs
    * in the top k is idcg(min(m, k)). Index 0 (no relevant) = 0. */
  def idcgMicro(k: Int): Array[Long] =
    dcgGainsMicro(k).scanLeft(0L)(_ + _)

  /** Per-query ranked-retrieval metrics over a top-`k` result table.
    *
    * `ranked` must carry one row per (query, retrieved doc) with the
    * 1-based rank in `rankCol` (ranks > k are ignored), a 0/1
    * relevance in `relCol`, and the query's TOTAL relevant-doc count
    * (constant within a query) in `totalRelCol` — the denominator for
    * recall and the ideal-DCG length.
    *
    * Returns one row per query: n_rel_ret, p_at_k, recall_at_k
    * (null when the query has no relevant docs), mrr_micro
    * (round(1e6/first-relevant-rank), 0 when none), dcg_micro,
    * idcg_micro, ndcg. One map-side-combinable aggregate over
    * k·|queries| rows — the input is already truncated, so this costs
    * nothing at any corpus size. */
  def rankingMetrics(ranked: DataFrame, queryCol: String, rankCol: String,
                     relCol: String, totalRelCol: String,
                     k: Int): DataFrame = {
    val gains = typedLit(dcgGainsMicro(k))
    val idcg = typedLit(idcgMicro(k))
    ranked.filter(col(rankCol) <= k)
      .groupBy(col(queryCol))
      .agg(
        sum(col(relCol).cast("long")).as("n_rel_ret"),
        min(when(col(relCol) === 1, col(rankCol))).as("_fr"),
        sum(col(relCol).cast("long") *
          element_at(gains, col(rankCol).cast("int"))).as("dcg_micro"),
        first(col(totalRelCol)).cast("long").as("_tr"))
      .select(col(queryCol), col("n_rel_ret"),
        round(col("n_rel_ret").cast("double") / k, 6).as("p_at_k"),
        when(col("_tr") > 0,
          round(col("n_rel_ret").cast("double") / col("_tr"), 6))
          .as("recall_at_k"),
        coalesce(round(lit(1e6) / col("_fr"), 0).cast("long"), lit(0L))
          .as("mrr_micro"),
        col("dcg_micro"),
        // ideal ranking puts min(totalRel, k) relevant docs first
        element_at(idcg, least(col("_tr"), lit(k.toLong)).cast("int") + 1)
          .as("idcg_micro"))
      .withColumn("ndcg",
        when(col("idcg_micro") > 0,
          round(col("dcg_micro").cast("double") / col("idcg_micro"), 6)))
  }

  /** EXACT ROC-AUC (Mann–Whitney form with the tie-average
    * correction) over an integer score column — never sorts the row
    * set. `scored` needs `scoreCol` (long; fix floats to micro-units
    * upstream) and `labelCol` (boolean, true = positive).
    *
    * AUC = Σ_s [ n_pos(s)·( n_neg(<s) + n_neg(s)/2 ) ] / (P·N),
    * computed as the integer numerator
    * num2 = Σ_s n_pos(s)·(2·cum_neg_below(s) + n_neg(s))
    * with ONE float divide by 2·P·N at the end — identical operands in
    * any engine.
    *
    * Scale shape: rows collapse map-side to a grouped
    * (score, n_pos, n_neg) table; cum_neg_below is a TWO-LEVEL prefix
    * sum — scores pre-bucket by their high bits (arithmetic shift, so
    * bucket order == numeric order for negatives too), an O(buckets)
    * driver matrix gives each bucket its starting negative count, and
    * the only window partitions BY BUCKET. No global sort, no
    * single-partition window, at any score-column cardinality. */
  def rocAuc(scored: DataFrame, scoreCol: String, labelCol: String,
             bucketShift: Int = 32): DataFrame = {
    val grouped = scored.groupBy(col(scoreCol).as("_s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("_p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("_n"))
      .withColumn("_b", shiftright(col("_s"), bucketShift))
      .localCheckpoint() // feeds the bucket matrix AND the scan below
    // O(buckets) rows to the driver — the q181 accepted class
    val perBucket = grouped.groupBy(col("_b"))
      .agg(sum(col("_n")).as("_bn")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val starts = perBucket.scanLeft((0L, 0L)) {
      case ((_, cum), (b, bn)) => (b, cum + bn)
    }
    val offsets = perBucket.map(_._1).zip(starts.map(_._2))
    val spark = scored.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_b", "_start")
    val win = Window.partitionBy(col("_b")).orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grouped.join(broadcast(offDf), Seq("_b"))
      .withColumn("_negBelow",
        col("_start") + coalesce(sum(col("_n")).over(win), lit(0L)))
      .agg(sum(col("_p")).as("n_pos"), sum(col("_n")).as("n_neg"),
        sum(col("_p") * (lit(2L) * col("_negBelow") + col("_n")))
          .as("_num2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("_num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
      .withColumn("gini", round(lit(2.0) * col("auc") - 1.0, 6))
  }

  /** Reliability diagram + expected calibration error over an integer
    * confidence score. Scores min-max normalize to [0, 1] by exact
    * integer arithmetic (d = s − s_min over range R = s_max − s_min);
    * equal-width bin = min(d·bins div R, bins − 1) — d ≥ 0, so
    * truncating and flooring division agree in every engine.
    *
    * Per bin: n, n_pos, confidence = Σd/(n·R), accuracy = n_pos/n;
    * ECE rides every row as the constant
    * Σ_b |Σd_b − n_pos_b·R| / (R·N) — the numerator is an EXACT
    * integer (n·confidence − n·accuracy pre-multiplied by n·R), so
    * the weighted-|conf−acc| sum never accumulates float error.
    *
    * Scale: one 1-row min/max aggregate broadcast into the scan, one
    * hash aggregate on the bin id, one 1-row ECE aggregate broadcast
    * back. Degenerate input (R = 0, all scores equal) yields bin 0
    * with null confidence/ece. */
  def calibrationBins(scored: DataFrame, scoreCol: String,
                      labelCol: String, bins: Int = 10): DataFrame = {
    val st = scored.agg(min(col(scoreCol)).as("_lo"),
      max(col(scoreCol)).as("_hi"), count(lit(1)).as("_nt"))
      .withColumn("_r", col("_hi") - col("_lo"))
    val binned = scored.crossJoin(broadcast(st))
      .withColumn("_d", col(scoreCol) - col("_lo"))
      .withColumn("bin",
        when(col("_r") === 0, lit(0L)).otherwise(
          least(expr(s"(_d * $bins) DIV _r"), lit(bins - 1L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"),
        sum(col("_d")).as("_sd"), first(col("_r")).as("_r"),
        first(col("_nt")).as("_nt"))
      .localCheckpoint() // feeds the ECE total AND the per-bin rows
    val ece = binned
      .agg(sum(abs(col("_sd") - col("n_pos") * col("_r"))).as("_num"),
        first(col("_r")).as("_r2"), first(col("_nt")).as("_nt2"))
      .select(when(col("_r2") > 0,
        round(col("_num").cast("double") /
          (col("_r2").cast("double") * col("_nt2")), 6)).as("ece"))
    binned.select(col("bin"), col("n"), col("n_pos"),
        when(col("_r") > 0,
          round(col("_sd").cast("double") /
            (col("n").cast("double") * col("_r")), 6)).as("confidence"),
        round(col("n_pos").cast("double") / col("n"), 6).as("accuracy"))
      .crossJoin(broadcast(ece))
  }
}
