package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-id assignment, stratified sampling, train/valid splits
  * (SURVEY.md §2.5, §2.8).
  *
  * The reference assigns row ids with `row_number()` over a
  * constant-`orderBy` global window (`/root/reference/src/modelling.py:82-84`)
  * — a single-partition shuffle that serializes the whole table through one
  * task. That is its biggest physical anti-pattern; at 100 TB it simply
  * does not run. We keep the window form for parity ([[rowNumberId]]) and
  * provide the scalable paths ([[uniqueId]], [[contiguousId]]).
  */
object SplitOps {

  /** Parity form: `row_number()` over a global window ordered by `order`.
    * Contiguous 1..N ids, but plans as a single-partition `WindowExec` when
    * `order` has low cardinality — use only when N is driver-scale. */
  def rowNumberId(df: DataFrame, order: Column,
                  idCol: String = "row_num"): DataFrame =
    df.withColumn(idCol, row_number().over(Window.orderBy(order)))

  /** Scale form: unique-but-non-contiguous ids, zero shuffle. The
    * reference only uses ids as a subtract key
    * (`src/modelling.py:91-93`), for which uniqueness suffices. */
  def uniqueId(df: DataFrame, idCol: String = "row_num"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** Scale form with contiguous 0..N-1 ids: zipWithIndex (one count job
    * over partition sizes + a narrow map; no data shuffle). */
  def contiguousId(df: DataFrame, idCol: String = "row_num"): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-stratum Bernoulli sample: 10%-of-every-class in the reference
    * (`src/modelling.py:85-89`). Map-side only — no shuffle, scales
    * linearly. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Uniform per-stratum fraction over all observed strata. Runs one
    * distinct job to discover strata (A6, `src/modelling.py:86-87`). */
  def stratifiedSampleUniform(df: DataFrame, stratumCol: String,
                              fraction: Double, seed: Long): DataFrame = {
    val strata = df.select(stratumCol).distinct().collect()
      .map(_.get(0).toString)
    df.stat.sampleBy(stratumCol, strata.map(_ -> fraction).toMap, seed)
  }

  /** EXACT-size stratified sample: precisely `n` rows per stratum
    * (ties to [[stratifiedSample]]'s Bernoulli draw, whose per-stratum
    * counts vary binomially — training pipelines often need fixed
    * counts). Seeded rand order + per-stratum rank; one exchange on the
    * stratum key. Strata smaller than `n` return whole. */
  def exactStratifiedSample(df: DataFrame, stratumCol: String, n: Int,
                            seed: Long): DataFrame =
    RelOps.topKPerGroup(df.withColumn("_r", rand(seed)),
        Seq(col(stratumCol)), Seq(col("_r")), n, rankCol = "_rank")
      .drop("_r", "_rank")

  /** Train/valid split by exclusion (reference R3,
    * `src/modelling.py:89-98`): valid = stratified sample, train = rest.
    * The reference collects sampled ids to the driver and filters with
    * `isin` — O(sample) driver memory. We do a left-anti join on the key:
    * Catalyst broadcasts the sampled side when small, falls back to
    * shuffle anti-join when not; both scale. */
  def antiJoinSplit(df: DataFrame, keyCol: String, stratumCol: String,
                    fraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val valid = stratifiedSampleUniform(df, stratumCol, fraction, seed)
    val train = df.join(valid.select(keyCol), Seq(keyCol), "left_anti")
    (train, valid)
  }

  /** Seeded random split (reference R2 — which forgets the seed,
    * `ISAA_Review_3.ipynb:900`; we always pin it for testability). */
  def seededSplit(df: DataFrame, weights: Array[Double],
                  seed: Long): Array[DataFrame] =
    df.randomSplit(weights, seed)

  /** Deterministic per-group mixture sampling: keep
    * ceil(fraction(g) × |g|) rows of each group, chosen by md5-of-key
    * order — the data-mixing step that reweights sources/languages to a
    * target composition. Hash order makes the draw pseudo-random but
    * exactly reproducible on ANY engine (no RNG state, no partition
    * order dependence) — unlike the seeded Bernoulli [[stratifiedSample]],
    * this one is DuckDB-oracle-checkable bit for bit. `salt` varies the
    * draw. One exchange on the group key; per-group size via a window
    * count, rank via row_number — same single-shuffle shape as
    * [[exactStratifiedSample]]. */
  def hashMixture(df: DataFrame, groupCol: String, keyCol: String,
                  fractions: Map[String, Double], salt: String = ""): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(f)).otherwise(acc)
    }
    val w = Window.partitionBy(col(groupCol))
    val order = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))),
        col(keyCol))
    df.withColumn("_n", count(lit(1)).over(w))
      .withColumn("_rk", row_number().over(order))
      .filter(col("_rk") <= ceil(frac * col("_n")))
      .drop("_n", "_rk")
  }

  /** Distributed exact-size mixture — [[hashMixture]]'s semantics
    * (keep exactly ceil(fraction(g)·|g|) rows per group, chosen by
    * md5-of-key order) WITHOUT its one-task-per-group rank window: the
    * md5 space is pre-split into 256 buckets by the hash's first byte,
    * a tiny (groups × 256) count matrix decides per bucket whether it
    * is kept whole, ranked within, or dropped, and the only data-sized
    * window partitions on (group, bucket) — 256-way parallel inside
    * every group, so a 1-group-dominant mixture no longer serializes.
    * Dropped buckets never join (the quota table is inner-broadcast),
    * so ~(1−f) of each group is eliminated without ranking at all.
    *
    * The count matrix is a driver action, but it is O(groups × 256)
    * rows REGARDLESS of corpus size (groups = sources/languages — a
    * bounded vocabulary), the same accepted O(K) class as the strata
    * discovery in [[stratifiedSampleUniform]]. Result is bit-identical
    * to [[hashMixture]] (same hash order, same ceil sizes; pinned by
    * spec), so the two share one oracle. */
  def hashMixtureDistributed(df: DataFrame, groupCol: String,
                             keyCol: String,
                             fractions: Map[String, Double],
                             salt: String = ""): DataFrame = {
    val h = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val withH = df.withColumn("_h", h)
      .withColumn("_mb",
        conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val counts = withH.groupBy(col(groupCol), col("_mb"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => (r.get(0) match {
        case null => null; case v => v.toString
      }, r.getInt(1), r.getLong(2)))
    // per group: walk buckets in hash order, keep whole buckets while
    // they fit under k = ceil(f·n), give the boundary bucket the rest
    val quotas = counts.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val n = rows.map(_._3).sum
      val f = Option(g).flatMap(fractions.get).getOrElse(0.0)
      val k = math.ceil(f * n).toLong
      var cum = 0L
      rows.sortBy(_._2).flatMap { case (_, mb, c) =>
        val take = math.min(c, math.max(0L, k - cum))
        cum += c
        if (take > 0) Some((g, mb, take)) else None
      }
    }
    if (quotas.isEmpty) return df.limit(0)
    val spark = df.sparkSession
    import spark.implicits._
    val quotaDf = quotas.toDF(groupCol, "_mb", "_q")
    val ranked = withH
      .join(broadcast(quotaDf), Seq(groupCol, "_mb"))
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col(groupCol), col("_mb"))
          .orderBy(col("_h"), col(keyCol))))
      .filter(col("_rk") <= col("_q"))
    ranked.drop("_h", "_mb", "_q", "_rk")
  }

  /** Scale sibling of [[hashMixture]]: deterministic hash-THRESHOLD
    * mixture — keep a row iff the first 8 md5 hex chars of its salted
    * key, read as a fraction of 2^32, fall below fraction(group).
    * ZERO shuffle (a pure scan-stage filter — [[hashMixture]]'s exact
    * ceil(f·n) sizes cost a per-group rank whose parallelism is one
    * task per group); sizes are Binomial(n, f) rather than exact — the
    * standard trade at 100 TB, and still bit-reproducible on any
    * engine (same md5, same threshold). */
  def hashSampleMixture(df: DataFrame, groupCol: String, keyCol: String,
                        fractions: Map[String, Double],
                        salt: String = ""): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, lit(f)).otherwise(acc)
    }
    val u = conv(substring(
        md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.filter(u < frac)
  }

  /** TOKEN-budget mixture: keep each group's documents, in deterministic
    * md5-of-key order, while the cumulative token count stays under the
    * group's budget (the doc that straddles the boundary is kept — the
    * "cut at N tokens per source" step of training-data mixing, where
    * [[hashMixture]] cuts at a ROW fraction). Member set is
    * bit-reproducible on any engine: same md5, same greedy prefix rule
    * `tokens_before < budget`.
    *
    * Scale shape = two-level prefix sum, NOT one rank window per group:
    * the md5 space is pre-split into 256 buckets by the hash's first
    * byte; a tiny (groups × 256) token-sum matrix gives each bucket its
    * group-cumulative START offset on the driver (O(groups·256) rows
    * regardless of corpus size — the same accepted class as
    * [[hashMixtureDistributed]]'s count matrix). Buckets starting past
    * the budget never join (inner broadcast ⇒ ~(1−f) of each group is
    * eliminated without ranking); the only data-sized window partitions
    * on (group, bucket) — 256-way parallel inside every group. A row is
    * kept iff bucketStart + within-bucket tokens-before < budget, which
    * equals the global per-group prefix rule because ordering by the
    * full hash already orders by (first byte, rest). */
  def tokenBudgetMixture(df: DataFrame, groupCol: String, keyCol: String,
                         tokensCol: Column, budgets: Map[String, Long],
                         defaultBudget: Long,
                         salt: String = ""): DataFrame = {
    // All grouping runs on an internal STRING key `_g` = cast(group) with
    // NULL coalesced to a sentinel: an inner join on the raw column would
    // silently drop null-group rows (SQL null keys never match), and a
    // non-string group column would otherwise meet a string offset table
    // with a mixed-type join key. Null groups and groups whose string
    // form has no `budgets` entry both fall to `defaultBudget`; `budgets`
    // is keyed by the group's STRING form.
    val nullKey = "\u0000<null-group>"
    val h = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val withH = df.withColumn("_tk", tokensCol.cast("long"))
      .withColumn("_h", h)
      .withColumn("_g",
        coalesce(col(groupCol).cast("string"), lit(nullKey)))
      .withColumn("_mb",
        conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val sums = withH.groupBy(col("_g"), col("_mb"))
      .agg(sum(col("_tk")).as("_s")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // per group: walk buckets in hash order accumulating token starts;
    // emit only buckets that BEGIN inside the budget (at most one of
    // them straddles it — cumulative starts are monotone)
    val starts = sums.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val budget =
        if (g == nullKey) defaultBudget
        else budgets.getOrElse(g, defaultBudget)
      var cum = 0L
      rows.sortBy(_._2).flatMap { case (_, mb, s) =>
        val start = cum
        cum += s
        if (start < budget) Some((g, mb, start, budget)) else None
      }
    }
    if (starts.isEmpty) return df.limit(0)
    val spark = df.sparkSession
    import spark.implicits._
    val startDf = starts.toDF("_g", "_mb", "_start", "_budget")
    val win = Window.partitionBy(col("_g"), col("_mb"))
      .orderBy(col("_h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withH.join(broadcast(startDf), Seq("_g", "_mb"))
      .withColumn("_before",
        col("_start") + coalesce(sum(col("_tk")).over(win), lit(0L)))
      .filter(col("_before") < col("_budget"))
      .drop("_tk", "_h", "_g", "_mb", "_start", "_budget", "_before")
  }

  /** Weighted Bernoulli (probability-proportional-to-size) sample:
    * keep each row independently with p = min(1, rate·weight) — the
    * weighted sibling of [[hashSampleMixture]], same md5-uniform draw
    * keyed on `keyCol`, so the member set is deterministic and
    * bit-reproducible on any engine. ZERO shuffle: the filter is pure
    * scan-stage arithmetic; expected sample size is Σ min(1, rate·wᵢ)
    * with no coordination across rows — the sampling shape that holds
    * at 100 TB where an exact weighted draw (A-ES top-k by u^(1/w))
    * needs a global ordering pass. */
  def weightedHashSample(df: DataFrame, keyCol: String, weight: Column,
                         rate: Double, salt: String = ""): DataFrame = {
    val u = conv(substring(
        md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.filter(u < least(lit(1.0), lit(rate) * weight))
  }

  /** EXACT-k-per-group sample, deterministic and engine-portable: rank
    * rows inside each group by the md5 of their key (+salt) and keep
    * the k smallest — a seeded reservoir draw whose member set any
    * engine reproduces bit-for-bit (the oracle-able twin of
    * [[exactStratifiedSample]], whose `rand(seed)` stream is
    * Spark-private). Uniformity comes from md5's avalanche on the key.
    *
    * Scale: `row_number() <= k` under a partitioned window triggers
    * Spark's `InferWindowGroupLimit`, which inserts a PARTIAL
    * WindowGroupLimit before the shuffle — each map task forwards at
    * most k rows per group, so the exchange moves O(groups·k·tasks)
    * rows instead of the whole table. No group ever materializes fully
    * in one task's sort buffer beyond its bounded heap. */
  def exactKPerGroupHash(df: DataFrame, groupCol: String, keyCol: String,
                         k: Int, salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(groupCol)).orderBy(u, col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k).drop("_rn")
  }

  /** NEYMAN-ALLOCATION STRATIFIED SAMPLE (optimal allocation: stratum
    * h of a total budget n gets n_h ∝ N_h·S_h — bigger AND more
    * variable strata get more draws; the survey-sampling optimum and
    * the right way to build an eval slice from heterogeneous sources):
    * N_h·S_h = sqrt(N_h·Σy² − (Σy)²) over integer y, fixed to integer
    * micro-units BEFORE the cross-strata total (q186 convention — the
    * strata sum never adds raw doubles), allocation = (n·w_h) div W
    * in exact integer arithmetic, then the q140 md5-rank draw with
    * the per-stratum quota broadcast back.
    *
    * SCALE: the stats pass is one map-side-combinable aggregate; the
    * allocation table is strata-bounded (broadcast); the draw is the
    * established md5-rank window per stratum. sqrt is IEEE
    * correctly-rounded, so the micro-unit weight is engine-portable.
    */
  def neymanSample(df: DataFrame, strataCol: String, keyCol: String,
                   y: Column, totalN: Long, salt: String = ""): DataFrame = {
    require(totalN >= 1, s"budget must be >= 1, got $totalN")
    val yl = y.cast("long")
    val stats = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_nh"), sum(yl).as("_sy"),
        sum(yl * yl).as("_syy"))
      .withColumn("_w_micro", round(sqrt(
        (col("_nh") * col("_syy") - col("_sy") * col("_sy"))
          .cast("double")) * 1e6, 0).cast("long"))
    val wtot = stats.agg(sum(col("_w_micro")).as("_wt"))
    val alloc = stats.crossJoin(broadcast(wtot))
      .withColumn("alloc_n",
        expr(s"(${totalN}L * _w_micro) div _wt"))
      .select(col(strataCol), col("alloc_n"))
    val u = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(strataCol)).orderBy(u, col(keyCol))
    df.join(broadcast(alloc), strataCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("alloc_n"))
      .drop("_rn")
  }

  /** EXACT-k WEIGHTED sample without replacement (Efraimidis–
    * Spirakis A-ES: keep the k largest u^(1/w) keys ⟺ the k largest
    * ln(u)/w) — the exact-size sibling of [[weightedHashSample]]'s
    * Bernoulli draw. The uniform u = (md5_32(key‖salt) + 1)/2^32 is
    * deterministic and engine-portable (the q79/q140 md5 convention);
    * the A-ES key is fixed to integer PICO units (ln(u)/w · 1e12 —
    * ln(u)/w itself is ≤ 1e-6-scale for cent weights, so micro units
    * would collapse ties) with (key desc, id) ordering, so the drawn
    * set is bit-reproducible anywhere.
    *
    * Scale: the draw is pure scan-stage arithmetic; the top-k is
    * orderBy+limit — Catalyst's TakeOrdered, a per-partition heap +
    * driver merge of k·partitions rows, never a global sort. Rows
    * with weight ≤ 0 or null cannot be drawn (ln(u)/w needs w > 0).
    * Returns the sampled rows + `aes_key_pico`.
    *
    * Contract: weights must be ≥ ~1e-5. ln(u) reaches ~−22.2 at the
    * smallest md5-derived u, so below w ≈ 2.4e-6 the pico-unit key
    * |ln(u)/w|·1e12 leaves Long — the double→long cast saturates
    * (no wraparound) and saturated keys collapse to (id) tie-break
    * order, which breaks the documented bit-reproducible WEIGHTED
    * draw. Rescale sub-1e-5 weights by a common factor first (the
    * A-ES key order is invariant under weight scaling). */
  def weightedExactKSample(df: DataFrame, keyCol: String,
                           weight: Column, k: Int,
                           salt: String = ""): DataFrame = {
    val u = (conv(substring(
        md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 8),
        16, 10).cast("double") + 1.0) / lit(4294967296.0)
    df.withColumn("_w", weight.cast("double"))
      .where(col("_w") > 0)
      .withColumn("aes_key_pico",
        round(log(u) / col("_w") * 1e12, 0).cast("long"))
      .orderBy(col("aes_key_pico").desc, col(keyCol))
      .limit(k)
      .drop("_w")
  }

  /** CLASS-BALANCED DOWNSAMPLE (undersample every class to the
    * minority class's size — the imbalance fix run before training
    * when upweighting is off the table): per label, keep the first
    * n_min rows in deterministic md5(key‖salt) order (the q79/q140
    * engine-portable draw). One (label) aggregate broadcasts the
    * per-class counts; the rank window partitions by label, so no
    * class serializes through one task beyond its own rows — and at
    * 100 TB the md5 order means the draw needs no global sort, just
    * the per-label window. Returns the kept rows. */
  def balancedDownsample(df: DataFrame, labelCol: String,
                         keyCol: String, salt: String = ""): DataFrame = {
    val nmin = df.groupBy(col(labelCol)).agg(count(lit(1)).as("_n"))
      .agg(min(col("_n")).as("_nmin"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))),
        col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .crossJoin(broadcast(nmin))
      .filter(col("_rk") <= col("_nmin"))
      .drop("_rk", "_nmin")
  }

  /** DETERMINISTIC EPOCH SHUFFLE (round-13 verdict task 6 — the
    * pretraining-pipeline stage between mixture (q181/q183) and
    * packing (q75)): the epoch's global training order is the total
    * order of `shuffle_key` = the first 60 bits of
    * md5(salt ‖ ':' ‖ id) — change the salt, get an independent
    * permutation; replay the salt, get the SAME order on any engine
    * (the q79/q140 md5 draw applied to ordering). `pos` (1..N) comes
    * from [[graft.ops.AggOps.valueRanks]]' two-level prefix sum over
    * the key space (bucketShift 52 keeps the driver-side bucket
    * directory at ≤ 2⁸ entries for the 60-bit keys) plus a
    * within-key tie window (md5-collision groups — tiny by
    * construction), so NO global sort ever runs; a consumer
    * range-partitions on `pos` (or just on `shuffle_key`) to
    * materialize the epoch. Returns (idCol, shuffle_key, pos). */
  def epochShuffle(df: DataFrame, idCol: String,
                   salt: String): DataFrame = {
    val h = df.select(col(idCol),
      conv(substring(md5(concat(lit(salt + ":"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
        .as("shuffle_key"))
    val ranks = AggOps.valueRanks(h.select(col("shuffle_key")),
      "shuffle_key", bucketShift = 52)
    h.join(ranks.select(col("value").as("shuffle_key"), col("below")),
        Seq("shuffle_key"))
      .withColumn("_t", row_number().over(
        Window.partitionBy(col("shuffle_key")).orderBy(col(idCol))))
      .select(col(idCol), col("shuffle_key"),
        (col("below") + col("_t")).as("pos"))
  }

  /** CURRICULUM INTERLEAVE (round-13 verdict task 6, second half):
    * round-robin over sources — round r emits one md5-ranked row
    * from every source that still has ≥ r rows, sources visited in
    * md5('src:' ‖ source) order (both draws salted + engine-
    * portable). The GLOBAL position needs no global sort: with the
    * per-source size table S (|sources| rows, broadcast),
    *   pos = Σ_{s'} min(size_{s'}, r−1)
    *       + #{s' : src_rank_{s'} ≤ src_rank, size_{s'} ≥ r}
    * — rows before round r, plus this round's sources up to ours —
    * exact integer arithmetic per row against the broadcast
    * directory. The within-source rank window partitions by source;
    * sources are few and comparable here — a heavily skewed source
    * set would rank within source via the [[epochShuffle]] prefix-sum
    * technique instead. Returns (idCol, srcCol, round, src_rank,
    * pos); ORDER BY pos IS the curriculum. */
  def curriculumInterleave(df: DataFrame, idCol: String,
                           srcCol: String, salt: String): DataFrame = {
    val h = df.select(col(idCol), col(srcCol),
      conv(substring(md5(concat(lit(salt + ":"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
        .as("_sk"))
    val sizes = h.groupBy(col(srcCol)).agg(count(lit(1)).as("_sz"))
      .withColumn("src_rank", row_number().over(
        Window.orderBy(md5(concat(lit("src:"),
          col(srcCol).cast("string"))), col(srcCol))).cast("long"))
      .localCheckpoint() // |sources| rows — domain-bounded
    val ranked = h.withColumn("round", row_number().over(
        Window.partitionBy(col(srcCol))
          .orderBy(col("_sk"), col(idCol))).cast("long"))
      .join(broadcast(sizes.select(col(srcCol), col("src_rank"))),
        Seq(srcCol))
    val dir = sizes.select(col("src_rank").as("_osr"),
      col("_sz").as("_osz"))
    ranked.crossJoin(broadcast(dir))
      .groupBy(col(idCol), col(srcCol), col("round"), col("src_rank"))
      .agg((sum(least(col("_osz"), col("round") - 1)) +
        sum(when(col("_osr") <= col("src_rank") &&
          col("_osz") >= col("round"), 1L).otherwise(0L))).as("pos"))
  }

  /** MULTIPLICATIVE-WEIGHTS DOMAIN REWEIGHTING (the DoReMi move —
    * Xie et al. 2023: upweight domains with EXCESS loss, fixed
    * exponentiated-gradient rounds — the mixture-OPTIMIZATION step
    * between per-domain quality scores and q183-style temperature
    * mixing). Input: one row per domain with an integer micro loss
    * (e.g. average token surprisal). Per domain: excess = loss −
    * min-loss (micro, ≥ 0), a CONSTANT per-round factor
    * fexp = round(exp(η·excess/10⁶)·10⁶), then `rounds` updates
    * w ← normalize(w·fexp) with the normalization an exact
    * integer-ppm division (w·fexp·10⁶ div Σ, non-negative operands —
    * truncating `div` == `//`). Every float fixes to micro BEFORE it
    * meets another row's value, so the whole trajectory hash-replays
    * as unrolled CTEs.
    *
    * SCALE: everything here is DOMAIN-bounded (the per-domain loss
    * table is the upstream corpus aggregate's output); each round is
    * a projection + one |domains|-row sum. Bound: the ppm
    * renormalization computes w·fexp·10⁶ in long with w ≤ 10⁶, so
    * fexp must stay < 9.2·10⁶ — i.e. η·max-excess ≲ 2.2 nats
    * (η = 0.2 covers 11 nats of loss spread); beyond that the
    * multiply overflows LOUDLY under ANSI, never silently. Returns
    * (round 0..rounds, groupCol, excess_micro, fexp_micro,
    * weight_ppm). */
  def mwMixtureWeights(losses: DataFrame, groupCol: String,
                       lossMicroCol: String, eta: Double,
                       rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val base = losses.select(col(groupCol),
      col(lossMicroCol).cast("long").as("_l"))
    val st = base.agg(min(col("_l")).as("_mn"),
      count(lit(1)).as("_k"))
    var cur = base.crossJoin(broadcast(st))
      .withColumn("excess_micro", col("_l") - col("_mn"))
      .withColumn("fexp_micro", round(
        exp(lit(eta) * col("excess_micro").cast("double") / 1e6)
          * 1e6, 0).cast("long"))
      .withColumn("weight_ppm", expr("1000000L div _k"))
      .select(col(groupCol), col("excess_micro"), col("fexp_micro"),
        col("weight_ppm"))
      .localCheckpoint() // domain-bounded; seeds every round
    var out = cur.withColumn("round", lit(0L))
    for (r <- 1 to rounds) {
      val raw = cur.withColumn("_raw",
        col("weight_ppm") * col("fexp_micro"))
      val tot = raw.agg(sum(col("_raw")).as("_tr"))
      cur = raw.crossJoin(broadcast(tot))
        .withColumn("weight_ppm", expr("_raw * 1000000L div _tr"))
        .select(col(groupCol), col("excess_micro"),
          col("fexp_micro"), col("weight_ppm"))
        .localCheckpoint() // keep the per-round plan flat
      out = out.unionByName(cur.withColumn("round", lit(r.toLong)))
    }
    out.select(col("round"), col(groupCol), col("excess_micro"),
      col("fexp_micro"), col("weight_ppm"))
  }
}
