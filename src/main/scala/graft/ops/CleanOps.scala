package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-cleaning operators (SURVEY.md §2.2, §2.4, §2.10).
  *
  * Re-expresses the reference's clean-up pass — NaN profiling, ±Infinity
  * replacement, null drop/median impute
  * (`/root/reference/src/modelling.py:55-76`,
  * `/root/reference/ISAA_Review_3.ipynb:531,577,611` cells 21/23/24) — as
  * native Catalyst column expressions instead of Python UDFs. The
  * reference's `replace_infs_udf` (`src/modelling.py:61-68`) forces a
  * `BatchEvalPython` node that breaks whole-stage codegen and blocks
  * predicate pushdown; the `when`-based forms below stay inside codegen,
  * so the whole clean+featurize chain compiles to one stage.
  */
object CleanOps {

  /** Replace ±Infinity with `replacement`, pass everything else through —
    * including null and 0.0 (mirrors the reference UDF's `if x and
    * np.isinf(x)` falsiness semantics, `src/modelling.py:61-63`: a null
    * predicate falls to `otherwise`, so null → null; 0.0 is finite so it
    * passes through arithmetically rather than by falsiness accident).
    */
  def replaceInf(c: Column, replacement: Column): Column =
    when(c === lit(Double.PositiveInfinity) ||
         c === lit(Double.NegativeInfinity), replacement).otherwise(c)

  def replaceInf(df: DataFrame, cols: Seq[String], v: Double): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, replaceInf(col(c), lit(v))))

  /** One-pass per-column NaN counts (reference cell 21,
    * `ISAA_Review_3.ipynb:531`): 1 wide hash-aggregate, single stage —
    * at 100 TB this is one scan + a 1-row reduce, not N scans.
    */
  def nanCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      count(when(isnan(col(c)), lit(1))).as(c)): _*)

  /** One-pass per-column null-or-NaN counts. */
  def nullOrNanCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      count(when(isnan(col(c)) || col(c).isNull, lit(1))).as(c)): _*)

  /** One-pass wide min/max profile (reference cells 23-24: the ±∞
    * detectors). Returns 1 row with `<col>_min` / `<col>_max` columns.
    * `firstCols` adds `first(c, ignoreNulls = true)` representatives for
    * (typically string) columns alongside the numeric bounds — the
    * reference's A5 (`ISAA_Review_3.ipynb:577,611`). NOTE: `first` over
    * an unordered aggregate is nondeterministic across partitionings —
    * fine for profiling, not for hash-compared results.
    */
  def minMaxProfile(df: DataFrame, cols: Seq[String],
                    firstCols: Seq[String] = Nil): DataFrame =
    df.select(cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))) ++
      firstCols.map(c =>
        first(col(c), ignoreNulls = true).as(s"${c}_first")): _*)

  /** Drop rows with any null in `cols` (reference `df.na.drop()`,
    * `src/modelling.py:97-98`). Plain filter — pushes to the scan. */
  def dropNulls(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** Schema introspection: (string columns, numeric columns) — the
    * reference's dtype-driven split that decides which columns are
    * indexed vs assembled (`src/modelling.py:55-58` partitions on
    * `df.dtypes`). Metadata-only — no job runs. Columns that are
    * neither (timestamps, arrays, binary) appear in neither seq. */
  def columnsByType(df: DataFrame): (Seq[String], Seq[String]) = {
    val fields = df.schema.fields.toSeq
    (fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.StringType =>
          f.name
      },
      fields.collect {
        case f if f.dataType
            .isInstanceOf[org.apache.spark.sql.types.NumericType] =>
          f.name
      })
  }

  /** Median-impute nulls in each column (the reference's
    * `Imputer(strategy="median")`, `src/modelling.py:74-76`). Exact
    * interpolated median via `median()` for oracle parity; the Imputer's
    * `approxQuantile` path is what you'd run at 100 TB (single pass,
    * bounded-error sketch, no full sort).
    */
  def medianFill(df: DataFrame, cols: Seq[String]): DataFrame = {
    val medians = df.select(cols.map(c => median(col(c)).as(c)): _*).head()
    val fills = cols.zipWithIndex.collect {
      case (c, i) if !medians.isNullAt(i) => c -> medians.getDouble(i)
    }.toMap
    df.na.fill(fills)
  }

  /** IQR outlier filter: keep rows with `valueCol` inside
    * [q1 − k·IQR, q3 + k·IQR] (Tukey's fences, the standard numeric
    * outlier gate in a training-data pipeline). Declarative shape: the
    * two quantiles are a 1-row aggregate CROSS-joined (broadcast) onto
    * the scan — no driver action, one pass to bound + one to filter.
    * Exact `percentile` buffers per-partition values; at 100 TB swap
    * in `percentile_approx` for a single-pass sketch with the same
    * plan shape. */
  def iqrOutlierFilter(df: DataFrame, valueCol: String,
                       k: Double = 1.5): DataFrame = {
    // ONE percentile aggregate with both probes: the exact-percentile
    // buffer holds every value, so two separate aggregates would buffer
    // the column twice
    val bounds = df.agg(
        expr(s"percentile($valueCol, array(0.25, 0.75))").as("_q"))
      .select(col("_q")(0).as("_q1"), col("_q")(1).as("_q3"))
    val iqr = col("_q3") - col("_q1")
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col("_q1") - lit(k) * iqr &&
              col(valueCol) <= col("_q3") + lit(k) * iqr)
      .drop("_q1", "_q3")
  }

  /** Per-column approximate medians (one-pass Greenwald-Khanna sketch —
    * rank error ≤ relativeError·n, fixed memory, mergeable across
    * partitions). Columns that are all-null/empty are absent from the
    * result. Driver action is O(cols) doubles — the 100 TB-safe sibling
    * of the exact `median()` aggregate, which buffers every value. */
  def approxMedians(df: DataFrame, cols: Seq[String],
                    relativeError: Double = 0.001): Map[String, Double] = {
    val med = df.stat.approxQuantile(cols.toArray, Array(0.5), relativeError)
    cols.zip(med.map(_.headOption.getOrElse(Double.NaN)))
      .filterNot(_._2.isNaN).toMap
  }

  /** Approximate variant: one-pass approxQuantile sketch (what Imputer
    * actually runs). Use at scale; `medianFill` for exactness. */
  def medianFillApprox(df: DataFrame, cols: Seq[String],
                       relativeError: Double = 0.001): DataFrame =
    df.na.fill(approxMedians(df, cols, relativeError))

  /** Sketch-based IQR gate — [[iqrOutlierFilter]] with the exact
    * `percentile` buffer swapped for `percentile_approx` (fixed-size
    * KLL-style sketch, map-side combinable): the single-pass form that
    * survives 100× scale. Same declarative shape: a 1-row bounds
    * aggregate broadcast onto the scan, no driver action. Rank error
    * ≤ n/accuracy moves each fence by at most that many ranks. */
  def iqrOutlierFilterApprox(df: DataFrame, valueCol: String,
                             k: Double = 1.5,
                             accuracy: Int = 10000): DataFrame = {
    val bounds = df.agg(
        percentile_approx(col(valueCol),
          array(lit(0.25), lit(0.75)), lit(accuracy)).as("_q"))
      .select(col("_q")(0).as("_q1"), col("_q")(1).as("_q3"))
    val iqr = col("_q3") - col("_q1")
    df.crossJoin(broadcast(bounds))
      .filter(col(valueCol) >= col("_q1") - lit(k) * iqr &&
              col(valueCol) <= col("_q3") + lit(k) * iqr)
      .drop("_q1", "_q3")
  }

  /** Exact equi-depth (quantile) binning — the deterministic relational
    * form of QuantileDiscretizer: every row lands in
    * bin = floor(rank_below·bins / n), where rank_below counts rows
    * strictly smaller, so TIES always share a bin (no arbitrary split
    * of equal values across a boundary — the property a feature-binning
    * step needs for reproducible buckets). Output: one row per
    * non-empty bin with count and [lo, hi] value bounds — exactly the
    * cut-point table a discretizer ships to training.
    *
    * Plan shape: ONE map-side-combinable count aggregate collapses the
    * data to its distinct-VALUE histogram, and the only window runs
    * over that histogram — vocabulary-sized, like q124's bigram table,
    * not data-sized. The data itself is never globally sorted (a naive
    * global `ntile` window would single-task the whole table). For a
    * continuous column, quantize first (e.g. `round(c, -2)`) so the
    * histogram stays bounded; at 100 TB the sketch sibling is
    * `percentile_approx` cut points (q13/q62's path), which trades
    * this exactness for a fixed-size buffer. Integer arithmetic
    * throughout (counts·bins < 2^53 in the double division), so the
    * assignment is bit-reproducible on any engine.
    *
    * Invalid-value policy (QuantileDiscretizer's handleInvalid="skip"):
    * NULLs are dropped BEFORE the histogram — otherwise they'd bucket
    * into bin 0 and shift every real value's rank_below. NaN (a real
    * floating-point VALUE, not a missing one) is kept and sorts above
    * every finite double (Spark's ordering), so NaN rows land in the
    * top bin; callers wanting NaN skipped filter `!isnan(c)` first. */
  def equiDepthBins(df: DataFrame, value: Column, bins: Int): DataFrame = {
    require(bins >= 1, s"equiDepthBins needs bins >= 1, got $bins")
    val hist = df.where(value.isNotNull)
      .groupBy(value.as("v")).agg(count(lit(1)).as("c"))
    // both the running count and the grand total ride ONE window sort
    // over the vocabulary-sized histogram (same ordering ⇒ one Window
    // operator, one single-partition exchange) — no second aggregate
    // subtree, no crossJoin(broadcast(tot)) re-running the scan
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
    val cum = hist
      .withColumn("_cb", coalesce(sum(col("c"))
        .over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("_t", sum(col("c"))
        .over(w.rowsBetween(Long.MinValue, Long.MaxValue)))
    cum.withColumn("bin",
        least(lit(bins - 1L), floor(col("_cb") * bins / col("_t"))))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"))
  }

  /** EXACT per-group percentiles from a pre-aggregated distinct-value
    * histogram `(groupCol, _v, _c)` — the percentile_cont formula
    * (linear interpolation at rank p·(n−1)) evaluated with a window
    * over the VOCABULARY-sized histogram, never a buffer of every raw
    * value (the `percentile` aggregate collects each group's values
    * into one task's memory — the same anti-pattern equiDepthBins
    * avoids). The running count and grand total share one window sort;
    * the floor/ceil rank rows are picked with conditional aggregates.
    * Output: one row per group, columns `p0..p{k-1}` in `ps` order.
    *
    * Scale caveat: the win over the collect-all aggregate is the
    * map-side combine — heavy duplication (integral sensor readings,
    * prices, counts) compacts before the shuffle. NEAR-UNIQUE doubles
    * don't compact, and the per-group window sort then carries the
    * full column; when exactness isn't required at that cardinality,
    * `approxMedians`/percentile_approx (q12/q13's rank-certified
    * sketch) is the 100 TB path. */
  private[graft] def percentilesFromHist(hist: DataFrame, groupCol: String,
                                         ps: Seq[Double]): DataFrame =
    percentilesFromHist(hist, Seq(groupCol), ps)

  /** Composite-key core of [[percentilesFromHist]] — multi-column
    * business groups (the CDC-norm argument from mergeUpsert applied
    * to statistics). */
  private[graft] def percentilesFromHist(hist: DataFrame,
                                         groupCols: Seq[String],
                                         ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must lie in [0, 1], got $ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("_v"))
    val cum = hist
      .withColumn("_below", coalesce(sum(col("_c"))
        .over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c"))
        .over(w.rowsBetween(Long.MinValue, Long.MaxValue)))
    val picks = ps.zipWithIndex.flatMap { case (p, i) =>
      // rank r = p·(n−1) over the group's value positions [0, n); the
      // histogram row holding position q is the one with
      // _below <= q < _below + _c
      val r = lit(p) * (col("_n") - 1L).cast("double")
      def at(pos: Column) = max(when(col("_below") <= pos &&
        pos < col("_below") + col("_c"), col("_v")))
      Seq(at(floor(r)).as(s"_lo$i"), at(ceil(r)).as(s"_hi$i"),
        max(r - floor(r).cast("double")).as(s"_f$i"))
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(picks.head, picks.tail: _*)
      .select(groupCols.map(col) ++ ps.indices.map(i =>
        (col(s"_lo$i") + col(s"_f$i") * (col(s"_hi$i") - col(s"_lo$i")))
          .as(s"p$i")): _*)
  }

  /** [[percentilesFromHist]] over `df`'s own values (NULLs skipped —
    * the equiDepthBins contract: they must not shift real ranks). */
  def histPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                      ps: Seq[Double]): DataFrame =
    histPercentiles(df, Seq(groupCol), valueCol, ps)

  /** Composite-key form of [[histPercentiles]]. */
  def histPercentiles(df: DataFrame, groupCols: Seq[String],
                      valueCol: String, ps: Seq[Double]): DataFrame =
    percentilesFromHist(
      df.where(col(valueCol).isNotNull)
        .groupBy((groupCols.map(col) :+
          col(valueCol).cast("double").as("_v")): _*)
        .agg(count(lit(1)).as("_c")),
      groupCols, ps)

  /** WINSORIZE: clip `valueCol` into its per-group [pLo, pHi]
    * percentile band — the robust-statistics tail clamp (outliers
    * pulled to the fence, not dropped; the complement of
    * [[iqrOutlierFilter]]'s row removal). Two inherent passes: the
    * percentile histogram, then the clip; the G-row threshold table
    * broadcasts. NULL values stay NULL (never clamped to a fence). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double,
                outCol: String = "winsorized"): DataFrame = {
    require(pLo <= pHi, s"pLo must be <= pHi, got ($pLo, $pHi)")
    val th = histPercentiles(df, groupCol, valueCol, Seq(pLo, pHi))
      .select(col(groupCol), col("p0").as("_wlo"), col("p1").as("_whi"))
    df.join(broadcast(th), Seq(groupCol), "left")
      .withColumn(outCol, when(col(valueCol).isNotNull,
        least(greatest(col(valueCol).cast("double"), col("_wlo")),
          col("_whi"))))
      .drop("_wlo", "_whi")
  }

  /** MAD outlier report: per group, the median, the median absolute
    * deviation, and the count of rows whose |x − med| exceeds
    * k·1.4826·MAD (the modified z-score rule; 1.4826 rescales MAD to
    * σ under normality). The threshold is a MULTIPLICATION, never a
    * division — MAD = 0 (over half the group identical) then means
    * "any deviation is an outlier, zero deviation is not", with no
    * engine-specific 0/0 or x/0 semantics in the hash path.
    *
    * Scan economics: two raw-data passes are inherent (the median must
    * exist before deviations do). Both vocabulary-sized intermediates
    * — the median table and the DEVIATION histogram — are
    * localCheckpoint'ed because each has two consumers (the q106/q124
    * rule); without that, Catalyst would re-run the raw scans once per
    * consumer (4 scans instead of 2). The outlier count itself
    * aggregates the deviation HISTOGRAM (sum of `_c`), never re-reads
    * raw rows. */
  def madOutlierReport(df: DataFrame, groupCol: String, valueCol: String,
                       k: Double = 3.5): DataFrame = {
    val med = histPercentiles(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol), col("p0").as("_med"))
      .localCheckpoint()
    val devHist = df.where(col(valueCol).isNotNull)
      .join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol),
        abs(col(valueCol).cast("double") - col("_med")).as("_v"))
      .agg(count(lit(1)).as("_c"))
      .localCheckpoint()
    val mad = percentilesFromHist(devHist, groupCol, Seq(0.5))
      .select(col(groupCol), col("p0").as("_mad"))
    devHist
      .join(broadcast(mad), Seq(groupCol))
      .join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(col("_c")).as("n"),
        first(col("_med")).as("med"),
        first(col("_mad")).as("mad"),
        sum(when(col("_v") > lit(k) * lit(1.4826) * col("_mad"),
          col("_c")).otherwise(0L)).as("n_outliers"))
  }

  /** k-ANONYMITY SUPPRESSION (Sweeney's k-anonymity, the privacy gate
    * a training-data pipeline runs next to PII redaction): rows whose
    * quasi-identifier combination occurs in fewer than k records get
    * every QI column nulled (cell suppression), so no released row's
    * QI tuple isolates fewer than k individuals.
    *
    * SCALE: ONE map-side-combinable groupBy over the QI columns
    * produces the QI-DOMAIN-bounded frequency table, broadcast back
    * onto the rows — no window (a count-over-partition window would
    * shuffle-AND-sort the full table; the groupBy+broadcast shape
    * shuffles only the bounded counts). For an unbounded QI domain
    * drop the broadcast hint and let AQE pick the join side. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    val counts = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("_qi_n"))
    val suppressed = col("_qi_n") < k
    qiCols.foldLeft(df.join(broadcast(counts), qiCols)) { (d, c) =>
        d.withColumn(c, when(suppressed, lit(null)).otherwise(col(c)))
      }
      .withColumn("k_suppressed", suppressed)
      .drop("_qi_n")
  }

  /** ε-DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE (Dwork, McSherry,
    * Nissim & Smith 2006 — the fourth rung of the privacy ladder
    * after [[kAnonymize]]/[[lDiversityAudit]]/[[tClosenessAudit]]:
    * per-category counts plus Laplace(1/ε) noise; a disjoint
    * histogram has L1 sensitivity 1, so the scale is b = 1/ε).
    *
    * The noise draw is the SEEDED md5-uniform (the q105/q140 draw):
    * u = ((first 8 md5 hex digits of salt:key) + ½) / 2³², strictly
    * inside (0, 1) and never exactly ½, then the Laplace inverse CDF
    * noise = −b·sign(u−½)·ln(1−2|u−½|), fixed to integer micro
    * before release — every step runs on the same engine-portable
    * rational, so the whole mechanism hash-replays. A REAL deployment
    * swaps the seeded draw for a secure RNG; the seeded form is what
    * makes the release auditable end to end (the q20-vs-q76 trade).
    *
    * SCALE: ONE map-side-combinable count per category; the noise is
    * a projection over the category-domain-bounded histogram. Bound:
    * the release computes n·10⁶ in long, so cell counts must stay
    * < 9.2·10¹² (ANSI errors loudly beyond). Returns
    * (catCol, n, noise_micro, released_micro) — n is the
    * harness readout for the oracle; a production release drops it. */
  def dpHistogram(df: DataFrame, catCol: String, epsilon: Double,
                  salt: String): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val u = (conv(substring(md5(concat(lit(salt + ":"),
      col(catCol).cast("string"))), 1, 8), 16, 10).cast("double")
      + 0.5) / 4294967296.0
    val noise = lit(-1.0 / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noise_micro", round(noise * 1e6, 0).cast("long"))
      .withColumn("released_micro",
        col("n") * 1000000L + col("noise_micro"))
  }

  /** ε-DP CLIPPED SUM + MEAN RELEASE (Dwork et al. 2006 — the second
    * rung of the DP ladder next to [[dpHistogram]]: numeric
    * statistics need their sensitivity BOUNDED by clipping before
    * any noise scale means anything). Clip x to [lo, hi] per row,
    * ONE map-side-combinable aggregate for (n, Σ), then a bounded
    * noise projection releases both statistics: the sum with
    * Laplace scale max(|lo|, |hi|)/ε (add/remove-one neighbors) and
    * the mean with scale (hi − lo)/(ε·n) (known-n neighbors — the
    * classical clipped-mean mechanism). The two draws are the
    * [[dpHistogram]] seeded md5-Laplace on distinct tags
    * (salt:sum, salt:mean) — engine-portable rationals, so the whole
    * release hash-replays; a REAL deployment swaps in a secure RNG.
    *
    * Noise magnitudes are monotone DECREASING in ε (same u, smaller
    * scale) — the auditable privacy/utility dial. Bound: the release
    * computes Σ·10⁶ in long, so |Σ clipped| must stay < 9.2·10¹²
    * (ANSI errors loudly beyond). Output 1 row: (n, sum_clipped,
    * mean_micro, noise_sum_micro, released_sum_micro,
    * noise_mean_micro, released_mean_micro). */
  def dpClippedMean(df: DataFrame, xCol: String, lo: Long, hi: Long,
                    epsilon: Double, salt: String): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    def lap(tag: String): Column = {
      val u = (conv(substring(md5(lit(s"$salt:$tag")), 1, 8), 16, 10)
        .cast("double") + 0.5) / 4294967296.0
      lit(-1.0) * signum(u - 0.5) *
        log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    }
    val bSum = math.max(math.abs(lo), math.abs(hi)) / epsilon
    val bMeanNum = (hi - lo) / epsilon // divided by n at readout
    df.select(greatest(lit(lo), least(lit(hi), col(xCol)
        .cast("long"))).as("_x"))
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("sum_clipped"))
      .withColumn("mean_micro", when(col("n") > 0,
        round(col("sum_clipped").cast("double") * 1e6 /
          col("n").cast("double")).cast("long")))
      .withColumn("noise_sum_micro",
        round(lap("sum") * lit(bSum) * 1e6, 0).cast("long"))
      .withColumn("released_sum_micro",
        col("sum_clipped") * 1000000L + col("noise_sum_micro"))
      .withColumn("noise_mean_micro", when(col("n") > 0,
        round(lap("mean") * lit(bMeanNum) /
          col("n").cast("double") * 1e6, 0).cast("long")))
      .withColumn("released_mean_micro",
        col("mean_micro") + col("noise_mean_micro"))
  }

  /** ε-DP QUANTILE via the EXPONENTIAL MECHANISM (McSherry & Talwar
    * 2007 — the third rung of the DP ladder after [[dpHistogram]]
    * and [[dpClippedMean]]: a noisy-sum release cannot answer "what
    * value sits at rank q", selection mechanisms can): candidates
    * are the FULL data-independent integer grid [lo, hi]; the
    * utility of candidate v is u(v) = −|#{x ≤ v} − target| with
    * sensitivity 1, and the draw uses the seeded GUMBEL-MAX trick —
    * argmax over v of (ε/2)·u(v) + Gumbel(md5(salt:v)) selects with
    * exactly the exponential-mechanism probabilities while staying
    * hash-replayable ((ε/2)·10⁶ premultiplied to an exact integer
    * key; ties broken v ASC). A real deployment swaps the seeded
    * uniforms for a secure RNG — the [[dpHistogram]] trade.
    *
    * SCALE: ONE level aggregate over the data, then everything runs
    * on the (hi−lo+1)-row candidate grid (a bounded literal domain):
    * one prefix window for the cumulative ranks, one rank window for
    * the argmax. Output 1 row: (n, target_rank, released,
    * u_released, true_err). */
  def dpQuantile(df: DataFrame, xCol: String, lo: Long, hi: Long,
                 qPpm: Long, epsilon: Double,
                 salt: String): DataFrame = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(qPpm >= 0 && qPpm <= 1000000L, s"qPpm out of range: $qPpm")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val epsHalfMicro = math.round(epsilon / 2 * 1e6)
    val lv = df.select(greatest(lit(lo), least(lit(hi),
        col(xCol).cast("long"))).as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val tot = lv.agg(coalesce(sum(col("_c")), lit(0L)).as("_n"))
    val grid = lv.sparkSession.range(lo, hi + 1).toDF("_g")
      .join(lv, col("_g") === col("_v"), "left")
      .withColumn("_cum", sum(coalesce(col("_c"), lit(0L)))
        .over(Window.orderBy(col("_g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("_target", expr(s"(_n * ${qPpm}L) div 1000000L"))
      .withColumn("_u", -abs(col("_cum") - col("_target")))
    val u = (conv(substring(md5(concat(lit(salt + ":"),
      col("_g").cast("string"))), 1, 8), 16, 10).cast("double")
      + 0.5) / 4294967296.0
    val keyed = grid
      .withColumn("_gum", round(-log(-log(u)) * 1e6, 0).cast("long"))
      .withColumn("_key", col("_u") * lit(epsHalfMicro) + col("_gum"))
    keyed
      .withColumn("_rk", row_number().over(
        Window.orderBy(col("_key").desc, col("_g"))))
      .where(col("_rk") === 1)
      .select(col("_n").as("n"), col("_target").as("target_rank"),
        col("_g").as("released"), col("_u").as("u_released"),
        abs(col("_cum") - col("_target")).as("true_err"))
  }

  /** l-DIVERSITY AUDIT (Machanavajjhala et al. 2006 — the
    * k-anonymity refinement guarding against the homogeneity attack:
    * a QI group that is large enough can still leak when every member
    * shares one sensitive value). One map-side-combinable aggregate
    * per QI group over the QI-domain-bounded table — no window, no
    * sort; returns (qiCols..., n, n_sensitive, diverse) with diverse
    * = (distinct sensitive values ≥ l), the audit a publisher runs
    * next to [[kAnonymize]]. */
  def lDiversityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "l-diversity needs at least one QI column")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-CLOSENESS AUDIT (Li, Li & Venkatasubramanian 2007 — the third
    * rung of the k-anonymity / l-diversity ladder: a diverse QI group
    * can still leak when its sensitive-value DISTRIBUTION diverges
    * from the table's). For a categorical sensitive attribute under
    * the equal-ground-distance metric the earth-mover's distance
    * collapses to TOTAL VARIATION: t(g) = ½ Σ_s |p_g(s) − p(s)|.
    *
    * EXACT-INTEGER spelling (the q186 convention): over the common
    * denominator n_g·n, |c_gs/n_g − c_s/n| = |c_gs·n − c_s·n_g| /
    * (n_g·n) — the absolute deviations are exact longs, summed
    * order-free, and the ONE float step is the final divide by
    * 2·n_g·n (identical sequential ops in any engine; safe while
    * c_gs·n < 2^63, i.e. to ~3e9 rows per cell at 3e9 total).
    * Absent (group, value) cells contribute c_s·n_g exactly — the
    * QI-groups × sensitive-domain grid is built explicitly (G·S
    * rows, both domain-bounded) with missing cells coalesced to 0.
    *
    * SCALE: one (QI, s) hash aggregate over the rows, then
    * domain-bounded re-aggregates and broadcasts — the row stream
    * shuffles once; the grid never touches it. Returns (qiCols...,
    * n, t) with t rounded to 6 dp; `close` = (t ≤ threshold). */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: String,
                      threshold: Double): DataFrame = {
    require(qiCols.nonEmpty, "t-closeness needs at least one QI column")
    val cells = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("_c_gs"))
      .localCheckpoint() // three domain-bounded consumers below
    val groups = cells.groupBy(qiCols.map(col): _*)
      .agg(sum(col("_c_gs")).as("_n_g"))
    val sens = cells.groupBy(col(sensitiveCol))
      .agg(sum(col("_c_gs")).as("_c_s"))
    val tot = sens.agg(sum(col("_c_s")).as("_n"))
    // null-safe cell lookup (round-12 review): a NULL sensitive value
    // is a legitimate category — an equi-join key would drop its
    // per-group count (coalesced to 0) while c_s(null) still enters
    // every group's deviation, inflating t. The right side is renamed
    // so the <=> condition is unambiguous.
    val cellsR = cells.select(
      (qiCols :+ sensitiveCol).map(c => col(c).as(s"_r_$c")) :+
        col("_c_gs"): _*)
    val joinCond = (qiCols :+ sensitiveCol)
      .map(c => col(c) <=> col(s"_r_$c")).reduce(_ && _)
    groups.crossJoin(broadcast(sens)).crossJoin(broadcast(tot))
      .join(cellsR, joinCond, "left")
      .groupBy(qiCols.map(col): _*)
      .agg(first(col("_n_g")).as("n"),
        sum(abs(coalesce(col("_c_gs"), lit(0L)) * col("_n") -
          col("_c_s") * col("_n_g"))).as("_num"),
        first(col("_n")).as("_nn"))
      .select(qiCols.map(col) :+ col("n") :+
        round(col("_num").cast("double") /
          (lit(2.0) * col("n") * col("_nn")), 6).as("t"): _*)
      .withColumn("close", col("t") <= threshold)
  }
}
