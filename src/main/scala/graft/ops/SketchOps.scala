package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequency / moment / cardinality SKETCHES as RELATIONAL plans —
  * the md5-replayable complement of the imperative sketch aggregates
  * (`MisraGriesAgg`, `QuantileSketchAgg`): here the sketch state IS a
  * bounded-key hash aggregate, so Catalyst's map-side partial
  * aggregation is the mergeable summary (each task holds ≤ the
  * sketch's fixed cell count, shuffles ≤ cells rows) and no custom
  * buffer exists at all. Because every hash is the engine-portable
  * md5 rule (q79/q140 convention), the ENTIRE sketch — cells,
  * estimates, error — is a pure content function of the data:
  * partition-invariant, merge-order-invariant, and hash-oracle-able
  * in DuckDB, which turns the usual "approximate ⇒ property-test
  * only" tradeoff into exact cross-engine checks of the approximate
  * algorithm itself.
  *
  * Scale shape (the 100 TB design point): one pass over the item
  * stream per sketch, fixed-size state (d·w cells / j copies /
  * m buckets), estimates joined back through BROADCAST of the
  * cell table — nothing data-sized ever shuffles or sorts.
  */
object SketchOps {

  /** The engine-portable row hash: bucket of `item` under seed row
    * `r`, uniform over [0, width). Mirror in DuckDB:
    * `('0x' || substr(md5('cms<r>|' || item), 1, 8))::BIGINT % width`.
    */
  private[graft] def cmsBucket(item: Column, r: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$r|"), item)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** COUNT-MIN counter matrix (Cormode & Muthukrishnan 2005) over an
    * item column: d rows × w buckets of summed counts. Each input row
    * fans out to its d (row, bucket) cells via one generator, then ONE
    * groupBy whose key domain is d·w BY CONSTRUCTION — the partial
    * aggregate is the bounded-memory sketch (≤ d·w entries per map
    * task at any corpus size) and the shuffle moves ≤ d·w rows per
    * task; cell values are merge-order-free integer sums, so the
    * whole matrix is partition-invariant and hash-checkable.
    * Output: (row, bucket, cnt) — only nonempty cells appear. */
  def countMinCounters(df: DataFrame, itemCol: String,
                       depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape d=$depth w=$width")
    df.where(col(itemCol).isNotNull)
      .select(explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("row"),
          cmsBucket(col(itemCol), r, width).as("bucket"))
      }: _*)).as("_rb"))
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** CMS point estimates for a probe set: est(item) = min over the d
    * rows of the item's cell — the classic upward-biased estimate
    * (est ≥ true count ALWAYS; ≤ true + εN with prob 1−δ for
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). The d·w counter table BROADCASTS onto
    * the probe side (left join: an item whose cell is empty was never
    * seen — estimate 0), so probing any number of items is map-side.
    * Output: (item, cms_est). */
  def countMinEstimate(counters: DataFrame, probes: DataFrame,
                       itemCol: String, depth: Int,
                       width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad CMS shape d=$depth w=$width")
    probes
      .select(col(itemCol), explode(array((0 until depth).map { r =>
        struct(lit(r.toLong).as("row"),
          cmsBucket(col(itemCol), r, width).as("bucket"))
      }: _*)).as("_rb"))
      .select(col(itemCol), col("_rb.row").as("row"),
        col("_rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** AMS second-frequency-moment sketch (Alon, Matias & Szegedy
    * 1996): F₂ = Σᵢ fᵢ² (the self-join size) estimated by j
    * independent ±1-hash sums — copy c keeps Xc = Σ rows sc(item)
    * where sc is the md5-derived sign, and E[Xc²] = F₂ exactly. ONE
    * scan with j sum aggregates (all map-side combinable; the
    * "sketch" is j longs per task), estimate = (Σc Xc²) div j — kept
    * in EXACT integers end to end (`div`, never float division), so
    * the estimate hash-compares.
    * Output 1 row: (n_copies, f2_est, every Xc as x0..x{j-1}). */
  def amsF2Sketch(df: DataFrame, itemCol: String,
                  copies: Int): DataFrame = {
    require(copies >= 1, s"bad AMS copies=$copies")
    def sign(c: Int): Column =
      when(pmod(conv(substring(md5(concat(lit(s"ams$c|"),
        col(itemCol))), 1, 1), 16, 10).cast("long"), lit(2L)) === 0L,
        lit(1L)).otherwise(lit(-1L))
    val sums = df.where(col(itemCol).isNotNull)
      .agg(sum(sign(0)).as("x0"),
        (1 until copies).map(c => sum(sign(c)).as(s"x$c")): _*)
    // ΣXc² div j in INTEGER arithmetic (Column./ is IEEE double —
    // above 2^53 it would silently round; `div` truncates exactly and
    // agrees with DuckDB's `//` on the non-negative operands here)
    val sqStr = (0 until copies).map(c => s"x$c * x$c").mkString(" + ")
    sums.select(lit(copies.toLong).as("n_copies") +:
      expr(s"($sqStr) div ${copies}L").as("f2_est") +:
      (0 until copies).map(c => col(s"x$c")): _*)
  }

  /** Flajolet–Martin / LogLog cardinality sketch (Flajolet & Martin
    * 1985; Durand & Flajolet 2003's stochastic averaging): m buckets
    * keyed by the first md5 byte, each remembering R_b = max over its
    * items of ρ(h(item)) where ρ = position of the lowest set bit of
    * a 56-bit md5-derived value. R_b is a MAX of a pure content
    * function — partition- and duplicate-invariant (the whole point:
    * re-observing an item can't move the sketch), so the m-row sketch
    * hash-compares exactly. ρ is computed WITHOUT float logs:
    * `length(bin(v & -v))` — the lowest-set-bit isolate is a power of
    * two whose binary spelling's length IS the bit position, exact in
    * both engines. Estimate = α·m·2^(ΣR/m) fixed to micro-units.
    * Output: m rows (bucket, r_max) + the shared (sum_r, ll_est_micro)
    * pair riding every row via a 1-row broadcast cross join. */
  def fmCardinality(df: DataFrame, itemCol: String,
                    buckets: Int): DataFrame = {
    require(buckets >= 1, s"bad FM buckets=$buckets")
    val sk = df.where(col(itemCol).isNotNull)
      .select(fmBucket(col(itemCol), buckets).as("bucket"),
        fmRho(col(itemCol)).as("_r"))
      .groupBy(col("bucket"))
      .agg(max(col("_r")).as("r_max"))
    val est = sk.agg(sum(col("r_max")).as("sum_r"))
      .select(col("sum_r"), fmEstimateMicro(col("sum_r"), buckets)
        .as("ll_est_micro"))
    sk.crossJoin(broadcast(est))
  }

  /** Durand & Flajolet 2003's asymptotic stochastic-averaging
    * constant. */
  private val FmAlpha = 0.39701

  /** The FM bucket of `item`: first md5 byte mod m. Exposed so the
    * STREAMING windowed variant (q307) shares the exact hash rule
    * with [[fmCardinality]] and its oracle. */
  private[graft] def fmBucket(item: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("fm|"), item)), 1, 2), 16, 10)
      .cast("long"), lit(buckets.toLong))

  /** ρ(h(item)) for the FM sketch — position of the lowest set bit of
    * the 56-bit md5-derived value, computed WITHOUT float logs
    * (`length(bin(v & -v))`); v = 0 maps to the 57 sentinel (past the
    * 56-bit domain). */
  private[graft] def fmRho(item: Column): Column = {
    val v = conv(substring(md5(concat(lit("fm|"), item)), 3, 14),
      16, 10).cast("long")
    when(v === 0L, lit(57L))
      .otherwise(length(bin(v.bitwiseAND(-v))).cast("long"))
  }

  /** α·m·2^(ΣR/m) fixed to micro-units — the LogLog estimate from a
    * summed bucket-rank column. */
  private[graft] def fmEstimateMicro(sumR: Column, buckets: Int): Column =
    round(lit(FmAlpha) * lit(buckets.toDouble) *
      pow(lit(2.0), sumR.cast("double") / lit(buckets.toDouble)) *
      lit(1e6)).cast("long")

  /** PER-GROUP Flajolet–Martin / LogLog cardinality — the grouped
    * form a 100 TB "distinct users per segment" readout runs: one
    * (group, bucket) max aggregate (map-side partial state ≤
    * |groups|·m cells per task), then a group-level rollup to the
    * ΣR and the estimate. Nothing data-sized shuffles twice: the
    * second aggregate reads the m-bounded sketch table.
    * Output: one row per group (groupCol, sum_r, ll_est_micro). */
  def fmCardinalityBy(df: DataFrame, groupCol: String, itemCol: String,
                      buckets: Int): DataFrame = {
    require(buckets >= 1, s"bad FM buckets=$buckets")
    df.where(col(itemCol).isNotNull)
      .groupBy(col(groupCol), fmBucket(col(itemCol), buckets)
        .as("bucket"))
      .agg(max(fmRho(col(itemCol))).as("r_max"))
      .groupBy(col(groupCol))
      .agg(sum(col("r_max")).as("sum_r"))
      .select(col(groupCol), col("sum_r"),
        fmEstimateMicro(col("sum_r"), buckets).as("ll_est_micro"))
  }

  /** RELATIONAL BLOOM FILTER (Bloom 1970) under the md5 rule: the
    * filter IS a distinct (bit) table — k md5-derived positions per
    * member, `explode` + DISTINCT bound the table at m rows no matter
    * the member count — so unlike an opaque byte-array sketch
    * ([[graft.ops.RelOps.bloomPrunedJoin]]'s driver-built
    * `stat.bloomFilter`), the whole filter hash-compares cross-engine
    * and merges by UNION (the mergeable-summary property, free from
    * DISTINCT). Output: (bit) rows, bit ∈ [0, m). */
  def bloomBitTable(members: DataFrame, keyCol: String,
                    k: Int, bits: Int): DataFrame = {
    require(k >= 1 && bits >= 1, s"bad bloom shape k=$k m=$bits")
    members.where(col(keyCol).isNotNull)
      .select(explode(array((0 until k).map(bloomBit(col(keyCol),
        _, bits)): _*)).as("bit"))
      .distinct()
  }

  /** Bit position of `key` under hash copy `i`: the engine-portable
    * md5 rule (mirror: `('0x' || substr(md5('bl<i>|' || key), 1, 8))
    * ::BIGINT % m`). */
  private[graft] def bloomBit(key: Column, i: Int, bits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"bl$i|"), key)), 1, 8), 16, 10)
      .cast("long"), lit(bits.toLong))

  /** Probe a [[bloomBitTable]]: a probe is MAYBE-present iff all k of
    * its bit positions are set. The m-bounded bit table BROADCASTS
    * onto the probe fan-out (k rows per probe), one count-matches
    * aggregate closes the membership test — a probe whose key was
    * inserted can NEVER miss (every bit it needs was set by its own
    * insertion: no false negatives, spec-pinned); a non-member passes
    * only by collision (the measured false-positive rate).
    * Output: (keyCol, maybe: boolean). */
  def bloomProbe(bitTable: DataFrame, probes: DataFrame, keyCol: String,
                 k: Int, bits: Int): DataFrame = {
    require(k >= 1 && bits >= 1, s"bad bloom shape k=$k m=$bits")
    probes.where(col(keyCol).isNotNull)
      .select(col(keyCol), explode(array((0 until k).map(bloomBit(
        col(keyCol), _, bits)): _*)).as("bit"))
      .join(broadcast(bitTable.withColumn("_set", lit(1L))),
        Seq("bit"), "left")
      .groupBy(col(keyCol))
      .agg((sum(coalesce(col("_set"), lit(0L))) === lit(k.toLong))
        .as("maybe"))
  }

  /** K-MINIMUM-VALUES distinct sketch (Bar-Yossef et al. 2002;
    * Beyer et al. 2007's unbiased estimator): the k smallest
    * md5-derived 56-bit hash values of the key set. The k-th minimum
    * u_k (scaled to [0,1]) estimates n ≈ (k−1)/u_k, and because the
    * sketch is an ORDER STATISTIC of a pure content function it is
    * duplicate-/partition-invariant and hash-compares row for row —
    * the fourth leg of the sketch family (CMS frequency, AMS moment,
    * FM cardinality, KMV cardinality + SET OPERATIONS).
    *
    * Scale shape: distinct keys → hash → `orderBy(h).limit(k)`, which
    * Spark plans as TakeOrderedAndProject — per-partition top-k heaps
    * merged once, never a global sort. State = k longs.
    * Output: ≤ k rows (h). */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.where(col(keyCol).isNotNull)
      .select(kmvHash(col(keyCol)).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
  }

  /** The KMV hash: 56-bit value from the engine-portable md5 rule
    * (mirror: `('0x' || substr(md5('kmv|' || key), 1, 14))::BIGINT`).
    */
  private[graft] def kmvHash(key: Column): Column =
    conv(substring(md5(concat(lit("kmv|"), key)), 1, 14), 16, 10)
      .cast("long")

  private val Pow2_56 = math.pow(2.0, 56)

  /** Distinct-count estimate from a [[kmvSketch]]: a sketch holding
    * fewer than k values EXHAUSTED the key set, so the count is exact
    * (micro-scaled for a uniform column type); otherwise n̂ =
    * (k−1)·2⁵⁶/u_k with u_k = the k-th minimum, one float divide,
    * micro-fixed. Output 1 row: (n_sketch, est_micro). */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    sketch.agg(count(lit(1)).as("n_sketch"), max(col("h")).as("_vk"))
      .select(col("n_sketch"),
        when(col("n_sketch") < k, col("n_sketch") * lit(1000000L))
          .otherwise(round(lit((k - 1).toDouble) * lit(Pow2_56) /
            col("_vk").cast("double") * 1e6).cast("long"))
          .as("est_micro"))
  }

  /** KMV SET OPERATIONS (Beyer et al. 2007): from two key sketches,
    * the union sketch L = k smallest of skA ∪ skB (a KMV sketch of
    * A ∪ B by construction), K∩ = |{v ∈ L : v ∈ skA ∧ v ∈ skB}|,
    * Jaccard ≈ K∩/k_union, and |A∩B| ≈ Jaccard·n̂(L) — the join-size
    * estimate a 100 TB planner reads off two k-long summaries without
    * touching either table again. Every quantity is integer
    * arithmetic over order statistics (the intersect estimate is
    * K∩·n̂ div k_union — ONE integer rescale, no compounding float),
    * so the whole report hash-compares.
    * Output 1 row: (k_union, k_intersect, jaccard_ppm,
    * est_union_micro, est_intersect_micro). */
  def kmvSetEstimates(skA: DataFrame, skB: DataFrame,
                      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val a = skA.select(col("h")).localCheckpoint()
    val b = skB.select(col("h")).localCheckpoint()
    val lTable = a.unionAll(b).distinct().orderBy(col("h")).limit(k)
      .localCheckpoint() // feeds the union estimate AND the overlap
    val uEst = kmvEstimate(lTable, k)
      .select(col("n_sketch").as("k_union"),
        col("est_micro").as("est_union_micro"))
    val inter = lTable
      .join(a, Seq("h"), "left_semi")
      .join(b, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("k_intersect"))
    inter.crossJoin(broadcast(uEst))
      .select(col("k_union"), col("k_intersect"),
        expr("k_intersect * 1000000L div k_union").as("jaccard_ppm"),
        col("est_union_micro"),
        expr("k_intersect * est_union_micro div k_union")
          .as("est_intersect_micro"))
  }
}
