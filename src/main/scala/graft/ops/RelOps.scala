package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond raw built-ins (SURVEY.md §2.3, §2.5-2.7).
  *
  * Joins, projections, filters, unions, distinct are Catalyst built-ins
  * and used directly at query sites; this object holds only compositions
  * that add semantics — top-k per group, global top-k, sessionization.
  */
object RelOps {

  /** Top-k rows per group by `order` (ranking-window family the engine
    * exposes per SURVEY §2.5). Physical shape: one hash-partition
    * exchange on `part`, per-partition sort, early-stop rank filter —
    * no global sort, so it scales with the largest group, not the
    * table. A mega-group serializes through its one window task; when
    * that's the workload shape, use the bounded-heap
    * [[graft.functions.GraftFunctions.collect_top_k]] aggregate
    * instead (q89's form — partial buffers capped at k, so the
    * shuffle carries ≤ k rows per group per map task). */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol,
        row_number().over(Window.partitionBy(part: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)

  /** Global top-k: orderBy+limit plans as `TakeOrderedAndProject` —
    * per-partition heap of k, then a k-row driver merge. O(n) scan,
    * no global sort even at 100 TB. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** As-of join: attach to each left row the most recent right row with
    * `right.ts <= left.ts` per key (the classic point-in-time join Spark
    * lacks as a built-in). Merge-sort formulation per the composition
    * preference order: UNION both sides tagged, ONE window per key
    * ordered by (ts, side) carrying `last(payload, ignoreNulls)` forward
    * — a single hash-partition exchange + sort, no range cross-join and
    * no per-row probe. At 100 TB this is one shuffle of |L|+|R| rows.
    *
    * Right rows sort before left rows on timestamp ties, so an exact-ts
    * right row IS visible to the left row (matches `ON l.ts >= r.ts`).
    * `payloadCols` surface as `asof_<name>` (null when no right row
    * precedes the left row).
    *
    * `maxGapSeconds` is the production tolerance variant: a match only
    * counts if the right row is within `maxGap` seconds BEFORE the left
    * row — beyond it the payload is null, exactly as if no right row
    * preceded. (The most recent right row is the nearest one, so nulling
    * it never hides an older in-gap match.) Same single-exchange plan;
    * the gap test is one codegen'd comparison on the carried timestamp.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               maxGapSeconds: Option[Double] = None): DataFrame = {
    // the payload travels as ONE struct so `last(ignoreNulls)` picks the
    // most recent right ROW atomically — filling each column separately
    // would stitch fields from different right rows whenever a payload
    // value is null (null value ≠ no row). The struct carries the right
    // row's event time as an internal `_rts` field for the gap test.
    val payloadStructR = struct(payloadCols.map(col) :+
      col(tsCol).cast("double").as("_rts"): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)) :+
        org.apache.spark.sql.types.StructField("_rts",
          org.apache.spark.sql.types.DoubleType))
    val lU = left
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
      .select(left.columns.map(col) ++
        Seq(col("_side"), col("_payload")): _*)
    val rU0 = right
      .select(col(keyCol), col(tsCol), lit(0).as("_side"),
        payloadStructR.as("_payload"))
    val missing = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val rU = missing.foldLeft(rU0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val all = lU.unionByName(rU.select(lU.columns.map(col): _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val lastMatch = last(col("_payload"), ignoreNulls = true).over(w)
    val gated = maxGapSeconds match {
      case Some(g) =>
        val m = col("_m0")
        all.withColumn("_m0", lastMatch)
          .withColumn("_match",
            when(m.isNotNull &&
              col(tsCol).cast("double") - m.getField("_rts") <= g, m))
          .drop("_m0")
      case None => all.withColumn("_match", lastMatch)
    }
    payloadCols.foldLeft(
        gated.filter(col("_side") === 1)) { (d, c) =>
        d.withColumn(s"asof_$c", col("_match").getField(c))
      }
      .drop("_side", "_payload", "_match")
  }

  /** Skew-salted inner equi-join: each left row gets a deterministic
    * salt in [0, factor), the right side is replicated `factor` ways,
    * and the join keys on (key, salt) — a hot key's rows spread across
    * `factor` reducers instead of serializing through one. AQE's skew
    * join splits sort-merge partitions at runtime; this is the explicit
    * form for when the layout must be pre-committed (bucketed inputs,
    * broadcast-ineligible dimension joins, AQE disabled). Cost: the
    * right side shuffles `factor`× — size it to taste.
    *
    * The left salt hashes the full row CONTENT, not
    * `monotonically_increasing_id()`: an id-derived salt re-executes
    * differently across stage retries / lineage recomputation, making the
    * operator nondeterministic and skewing AQE statistics. Content
    * hashing is stable under recomputation; rows identical in every
    * column share a salt, which only matters if the hot key's rows are
    * also full-row duplicates. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(factor)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Bloom-filter pruned equi-join (long keys): one pass over the
    * build side constructs an approximate membership filter (a few
    * hundred KB to the driver, embedded as a binary literal), and the
    * PROBE side is filtered before its shuffle — at 100 TB the
    * probe rows that can't match never leave their scan tasks, the
    * classic runtime-filter / semi-join-reduction pattern (Spark's own
    * `spark.sql.optimizer.runtimeFilter.bloomFilter` applies it to
    * subquery filters; this is the explicit operator form). False
    * positives (rate `fpp`) pass the filter and are eliminated by the
    * actual join, so the result is IDENTICAL to the plain join — which
    * is exactly what the oracle checks.
    *
    * The probe uses Spark's native `BloomFilterMightContain` expression
    * (the one its runtime-filter rule plants), NOT a Scala UDF: a UDF
    * is opaque to Catalyst — it breaks whole-stage codegen at the
    * filter and can never participate in scan-adjacent optimization.
    * The native expression stays inside the codegen'd stage. */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame, key: String,
                      expectedItems: Long,
                      fpp: Double = 0.03): DataFrame = {
    val bf = build.stat.bloomFilter(key, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    probe.filter(graft.functions.GraftFunctions.bloom_might_contain(
        bos.toByteArray, col(key).cast("long")))
      .join(build, Seq(key))
  }

  /** Range-lookup join: match each point row to every range row with
    * `lo <= point <= hi` — the interval/range join Spark has no native
    * operator for (the brief's named gap next to as-of). A raw non-equi
    * join plans as `BroadcastNestedLoopJoin` — an O(|points|·|ranges|)
    * probe that is the first thing to die at 100 TB. This is the coarse
    * -bucket reformulation every production range join uses: pick a
    * `bucketWidth` on the order of the maximum range width, explode each
    * range to the buckets it overlaps (≤ width/bucketWidth + 1 rows,
    * bounded by construction), map each point to its single bucket, and
    * EQUI-join on the bucket id with the `between` test as a residual
    * filter. One hash exchange on a key whose cardinality is
    * domain/bucketWidth — co-partitioned, codegen'd, skew governed by
    * points-per-bucket (size `bucketWidth` so bucket count ≫ parallelism).
    * A point lives in exactly one bucket, so no post-join dedup is
    * needed; a range spanning b buckets replicates b× on the (small)
    * range side only. Result is IDENTICAL to the naive non-equi join —
    * which is exactly what the oracle checks. */
  def rangeLookupJoin(points: DataFrame, ranges: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bkt", floor(col(pointCol) / bucketWidth))
    val r = ranges.withColumn("_bkt", explode(sequence(
      floor(col(loCol) / bucketWidth), floor(col(hiCol) / bucketWidth))))
    p.join(r, Seq("_bkt"))
      .filter(col(pointCol).between(col(loCol), col(hiCol)))
      .drop("_bkt")
  }

  /** Interval-overlap join: every (left, right) pair whose [lo, hi]
    * intervals intersect — the range×range sibling of
    * [[rangeLookupJoin]]'s point-in-range. Same coarse-bucket
    * reformulation (explode each side to its overlapping buckets,
    * equi-join on bucket id, `overlaps` as a residual filter), with the
    * standard DEDUP-FREE trick: a pair whose intervals span several
    * common buckets would match once per shared bucket, so the join
    * keeps only the match in the FIRST bucket both intervals occupy —
    * `_bkt == floor(max(lo_l, lo_r) / width)` — making the output
    * exactly the distinct overlap pairs with no post-join `distinct()`
    * (no second exchange, no wide-row hash). Each side replicates
    * ≤ width/bucketWidth + 1 rows; one hash exchange each on the
    * bucket id. Column name collisions are the caller's to avoid
    * (suffix the sides before calling). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          loL: String, hiL: String, loR: String,
                          hiR: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def exploded(df: DataFrame, lo: String, hi: String) =
      df.withColumn("_bkt", explode(sequence(
        floor(col(lo) / bucketWidth), floor(col(hi) / bucketWidth))))
    exploded(left, loL, hiL)
      .join(exploded(right, loR, hiR), Seq("_bkt"))
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("_bkt") === floor(greatest(col(loL), col(loR)) / bucketWidth))
      .drop("_bkt")
  }

  /** Exponential time-decay trailing features — the leakage-free ML
    * feature-engineering shape: for every event, aggregate the SAME
    * key's STRICTLY-EARLIER events inside the trailing window
    * `[t - windowSeconds, t)`, weighting each by
    * `exp(-(t - t') / tauSeconds)` (recency-weighted count and value
    * sum). Strictly-earlier keeps the feature causal — the event never
    * sees itself or its future.
    *
    * Execution is the [[rangeLookupJoin]] reformulation with the key
    * folded in: each event's trailing window explodes to its
    * time buckets (≤ window/bucket + 1 rows, bounded), each candidate
    * prior event is a POINT in exactly one bucket, and the join is an
    * EQUI-join on (key, bucket) with the window bound as a residual
    * inside the join condition — no nested loop, no dedup (a point
    * occupies one bucket), shuffle keyed on (key, bucket) so a hot
    * key's history still spreads across its time range. LEFT OUTER
    * with the residual in the ON clause keeps zero-history events in
    * the output with zero features (a post-join filter would silently
    * drop an event whose only candidates fell outside the window); a
    * NULL-timestamp event survives too (`explode_outer` — a plain
    * explode of the null bucket sequence would drop the row), with
    * zero features, and a NULL-timestamp candidate never matches —
    * both exactly the SQL LEFT JOIN semantics the oracle runs. */
  def trailingDecayFeatures(df: DataFrame, keyCol: String, tsCol: String,
                            idCol: String, valueCol: String,
                            windowSeconds: Long, tauSeconds: Double,
                            bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val sec = col(tsCol).cast("double")
    val cur = df.select(col(keyCol), col(idCol), sec.as("_t"))
      .withColumn("_bkt", explode_outer(sequence(
        floor((col("_t") - windowSeconds) / bucketSeconds),
        floor(col("_t") / bucketSeconds))))
    val prior = df.select(col(keyCol).as("_pk"), sec.as("_pt"),
        col(valueCol).cast("double").as("_pv"))
      .withColumn("_pbkt", floor(col("_pt") / bucketSeconds))
    val w = exp((col("_pt") - col("_t")) / tauSeconds)
    cur.join(prior,
        col(keyCol) === col("_pk") && col("_bkt") === col("_pbkt") &&
          col("_pt") >= col("_t") - windowSeconds && col("_pt") < col("_t"),
        "left_outer")
      .groupBy(col(keyCol), col(idCol))
      .agg(count(col("_pt")).as("n_prior"),
        coalesce(round(sum(w), 6), lit(0.0)).as("decay_count"),
        coalesce(round(sum(col("_pv") * w), 6), lit(0.0))
          .as("decay_value"))
  }

  /** MERGE-apply (the warehouse upsert sink): `base` and `changes` are
    * one-row-per-key frames with identical schemas; a change row wins
    * over the base row WHOLESALE — the winning side's entire payload
    * struct is selected, so a NULL field in a change row stays NULL in
    * the output (standard MERGE semantics; a per-field coalesce would
    * silently resurrect the base value). A change row matching
    * `isDelete` (a predicate over the change-side struct) removes the
    * key, and every surviving row carries a provenance `action` —
    * 'kept' (base only), 'inserted' (change only, new key),
    * 'updated' (both).
    *
    * Scale: ONE full-outer equi-join on the key — both inputs are
    * expected pre-compacted (e.g. a max_by latest-row aggregate, which
    * is map-side combinable), so the join carries one row per key per
    * side and AQE is free to broadcast a small change batch. This is
    * how MERGE INTO executes at 100 TB: never row-at-a-time, always
    * compact-then-join. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
                  isDelete: Column => Column): DataFrame =
    mergeUpsert(base, changes, Seq(keyCol), isDelete)

  /** Composite-key MERGE: the multi-column business key (the CDC norm —
    * (tenant, entity), (order, line), …) joins as a Seq the same way a
    * warehouse MERGE ON a AND b does; the full-outer join keys the
    * shuffle on ALL key columns, so hot single-column prefixes still
    * spread across reducers. Side-presence tests stay on the payload
    * STRUCTS (`_chg`/`_base` null ⇔ that side absent) — key columns
    * can't carry that signal once coalesced by the USING join. */
  def mergeUpsert(base: DataFrame, changes: DataFrame,
                  keyCols: Seq[String],
                  isDelete: Column => Column): DataFrame = {
    require(keyCols.nonEmpty, "mergeUpsert needs at least one key column")
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    require(payload.toSet ==
        changes.columns.filterNot(keyCols.contains).toSet,
      "base and changes must share the payload schema")
    val b = base.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("_base"): _*)
    val c = changes.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("_chg"): _*)
    b.join(c, keyCols, "full_outer")
      .filter(col("_chg").isNull || !isDelete(col("_chg")))
      // the WINNING STRUCT is chosen once, then unpacked — field-level
      // coalesce would mix fields from both sides on NULL-bearing
      // change rows
      .withColumn("_win",
        when(col("_chg").isNotNull, col("_chg")).otherwise(col("_base")))
      .select(keyCols.map(col) ++:
        payload.map(f => col(s"_win.$f").as(f)) :+
        when(col("_chg").isNull, "kept")
          .when(col("_base").isNull, "inserted")
          .otherwise("updated").as("action"): _*)
  }

  /** Snapshot DIFF (the reconciliation report next to [[mergeUpsert]]'s
    * apply): given two one-row-per-key snapshots with identical
    * schemas, classify every key as 'added' (new only), 'removed'
    * (old only), 'changed' (both, payload differs) or 'unchanged'.
    * This is how a 100 TB pipeline validates a CDC feed or compares
    * a rebuilt table against production: ONE full-outer equi-join on
    * the key, payloads compared as whole structs with null-safe
    * equality (`<=>` — a NULL field equals a NULL field, so nullable
    * payloads don't misreport as changed). Output: key, `status`, and
    * both payloads as `old_<f>` / `new_<f>` columns. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCol: String): DataFrame =
    snapshotDiff(oldSnap, newSnap, Seq(keyCol))

  /** Composite-key snapshot diff — same one-full-outer-join shape with
    * the business key as a column Seq (see [[mergeUpsert]]'s
    * composite-key notes; presence tests live on the payload structs). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val payload = oldSnap.columns.filterNot(keyCols.contains).toSeq
    require(payload.toSet ==
        newSnap.columns.filterNot(keyCols.contains).toSet,
      "snapshots must share the payload schema")
    val o = oldSnap.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("_old"): _*)
    val n = newSnap.select(keyCols.map(col) :+
      struct(payload.map(col): _*).as("_new"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) ++:
        payload.map(f => col(s"_old.$f").as(s"old_$f")) ++:
        payload.map(f => col(s"_new.$f").as(s"new_$f")) :+
        when(col("_old").isNull, "added")
          .when(col("_new").isNull, "removed")
          .when(col("_old") <=> col("_new"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** Gap-based sessionization over an event stream (batch form): a new
    * session starts when the gap to the previous event of the same key
    * exceeds `gapSeconds`. One exchange on `keyCol` + one sort — the
    * standard lag/cumsum formulation. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // fractional epoch seconds: unix_timestamp() truncates to whole
    // seconds, silently shifting any gap that straddles the boundary by
    // up to 1 s (a real divergence — the fixture's timestamps all carry
    // sub-second parts)
    val tsSec = col(tsCol).cast("double")
    df.withColumn("_prev", lag(tsSec, 1).over(byKey))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
             tsSec - col("_prev") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new_session")
  }

  /** Wide→long reshape (melt / SQL UNPIVOT): each input row fans out
    * to one row per entry of `valueCols`, carrying `idCols` plus the
    * column name in `varName` and its value in `valName`. Wraps
    * `Dataset.unpivot`, which plans as a Catalyst `Expand` — the
    * fan-out happens inside the scan stage with ZERO shuffle and stays
    * in whole-stage codegen, so at 100 TB a k-column melt costs one
    * pass over k·n rows, never a join or union of k scans. All
    * `valueCols` must share (or be cast to) one common type — that is
    * `unpivot`'s contract, surfaced here unchanged. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "metric", valName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)

  /** Fellegi–Sunter record-linkage scoring (the 1969 probabilistic
    * linkage model behind Splink/dedupe.io): each candidate pair gets
    * a per-field agreement/disagreement weight (in practice
    * log2(m/u), here caller-fixed INTEGER micro-unit literals so the
    * total is an order-free integer sum — the q186 convention), the
    * total log-odds score classifies match / possible / non_match
    * against the caller's thresholds. Takes ALREADY-BLOCKED candidate
    * pairs: blocking is the linear candidate generator (q174's
    * head-noun block, LSH buckets, SymSpell deletions…) — this
    * operator adds only per-row codegen'd projections, no shuffle.
    * Each field is (name, agreement predicate, agree-weight,
    * disagree-weight); a per-field `agr_<name>` boolean lands in the
    * output so a reviewer sees WHY a pair scored. */
  def fellegiSunter(pairs: DataFrame,
      fields: Seq[(String, Column, Long, Long)],
      matchAtLeast: Long, nonMatchAtMost: Long): DataFrame = {
    require(fields.nonEmpty, "linkage needs at least one field")
    require(nonMatchAtMost < matchAtLeast,
      "thresholds must leave room for 'possible'")
    val withAgr = fields.foldLeft(pairs) { case (d, (n, pred, _, _)) =>
      d.withColumn(s"agr_$n", pred)
    }
    val score = fields.map { case (n, _, a, dz) =>
      when(col(s"agr_$n"), lit(a)).otherwise(lit(dz))
    }.reduce(_ + _)
    withAgr.withColumn("score_micro", score)
      .withColumn("decision",
        when(col("score_micro") >= matchAtLeast, lit("match"))
          .when(col("score_micro") <= nonMatchAtMost, lit("non_match"))
          .otherwise(lit("possible")))
  }

  /** SCD TYPE-2 HISTORY BUILD (the slowly-changing-dimension
    * effective-dating pass every warehouse runs on entity change
    * logs; the library generalization of q107's inline compaction —
    * adds version ranks, is_current, epoch-micro bounds, and the
    * positional null-run guard): per key, order the log by
    * (ts, tie), SUPPRESS no-op
    * changes (a new version opens only when the tracked attribute
    * actually changes — null-safe comparison), then close each
    * version with the next change's timestamp: valid_from = its ts,
    * valid_to = lead(ts) (null ⇒ is_current), version = the change's
    * rank. Validity bounds are returned as integer epoch
    * MICROSECONDS (`unix_micros`) so the history is engine-portable
    * with zero timestamp-format risk.
    *
    * SCALE: both windows share the (key) partitioning and the
    * (ts, tie) sort, so the whole build is ONE hash exchange + one
    * sort reused by the lag screen and the lead/rank pass — never a
    * global sort; per-key history lengths bound the window frames.
    * The as-of lookup against the built history is [[asofJoin]]. */
  def scd2Build(changes: DataFrame, keyCol: String, attrCol: String,
                tsCol: String, tieCol: String): DataFrame =
    scd2Build(changes, keyCol, Seq(attrCol), tsCol, tieCol)

  /** Multi-attribute [[scd2Build]] — real dimension builds track MANY
    * columns, and a version must open when ANY of them changes. The
    * change screen compares the WHOLE tracked-attribute STRUCT with
    * the null-safe `<=>` (q126's whole-struct trick): struct equality
    * treats per-field null==null as equal, so the composite rule is
    * exactly `OR` over per-field `IS DISTINCT FROM` — one comparison,
    * no per-column lag columns. Same positional first-row guard, same
    * single (key) exchange + (ts, tie) sort shared by both windows. */
  def scd2Build(changes: DataFrame, keyCol: String,
                attrCols: Seq[String], tsCol: String,
                tieCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2Build needs >= 1 tracked attribute")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    changes
      // first-row detection must be positional, NOT `_prev IS NULL`:
      // a null previous ATTRIBUTE would then re-open a version on
      // every consecutive null (the null-safe <=> handles the rest)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> attrs))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us",
        unix_micros(lead(col(tsCol), 1).over(w)))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+
        col("valid_from_us") :+ col("valid_to_us") :+
        col("version") :+ col("is_current"): _*)
  }

  /** [[scd2Build]] over a CDC change log WITH TOMBSTONES (round-12
    * extension — real change streams carry deletes, and an SCD2 build
    * that ignores them leaves a deleted entity "current" forever): a
    * row whose `deletedCol` is true CLOSES the key's open version at
    * its ts and opens nothing; a later change row re-opens the key.
    * After a terminal tombstone the key has NO current row — the
    * soft-delete a warehouse dimension actually wants.
    *
    * Pinned semantics (the oracle replays them field for field):
    *  - the change screen compares (attrs..., deleted) — consecutive
    *    identical live rows suppress as in [[scd2Build]]; repeated
    *    tombstones collapse to one; delete → re-add of the SAME value
    *    re-opens (the deleted flag differs on both transitions);
    *  - `valid_to_us` = lead(ts) over the SCREENED rows, so a live
    *    version followed by a tombstone closes at the tombstone's ts;
    *  - tombstone rows emit no version; `version` numbers LIVE
    *    versions only (row_number over the filtered set);
    *  - a leading tombstone (delete before any add) emits nothing;
    *  - null `deletedCol` reads as false.
    *
    * Same scale shape as [[scd2Build]]: one (key) hash exchange +
    * one (ts, tie) sort shared by every window. */
  def scd2BuildWithDeletes(changes: DataFrame, keyCol: String,
                           attrCols: Seq[String], tsCol: String,
                           tieCol: String,
                           deletedCol: String): DataFrame = {
    require(attrCols.nonEmpty, "scd2 build needs >= 1 tracked attribute")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val del = coalesce(col(deletedCol).cast("boolean"), lit(false))
    val screen = struct(attrCols.map(col) :+ del.as("_del"): _*)
    changes
      .withColumn("_del", del)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_prev", lag(screen, 1).over(w))
      .filter(col("_rn") === 1 || !(col("_prev") <=> screen))
      .withColumn("valid_from_us", unix_micros(col(tsCol)))
      .withColumn("valid_to_us",
        unix_micros(lead(col(tsCol), 1).over(w)))
      .filter(!col("_del"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_us").isNull)
      .select(col(keyCol) +: attrCols.map(col) :+
        col("valid_from_us") :+ col("valid_to_us") :+
        col("version") :+ col("is_current"): _*)
  }

  /** [[scd2Apply]] for a TOMBSTONE-carrying delta against a
    * [[scd2BuildWithDeletes]] history — the nightly-delta form of the
    * soft-delete build (round-12): semantics = full-rebuild identity,
    * `scd2ApplyWithDeletes(buildD(base), delta) == buildD(base ∪
    * delta)`, which IS the q286 oracle.
    *
    * The extra state vs [[scd2Apply]]: a key whose history ENDED
    * DELETED has no current row, but its tombstone still matters —
    * the first live delta row must open a NEW version numbered after
    * the key's live count, and a repeated delta tombstone must
    * no-op. The history encodes this recoverably: such a key's last
    * close instant (`max(valid_to_us)`) is the tombstone's ts and
    * `max(version)` is its live count, so the rebuild seed for it is
    * a TOMBSTONE pseudo-row at (that ts, tie −1) with null attrs —
    * the deleted flag alone drives the screen, so the attr payload
    * is immaterial (a live row always differs from it; a delta
    * tombstone row is dropped by the build either way). Open keys
    * seed as in [[scd2Apply]]; version offsets are `open.version − 1`
    * (the seed rebuilds as live version 1) vs `max(version)` (a
    * tombstone seed emits no version). Same raise_error guards, with
    * the straggler horizon = the open version's valid_from OR the
    * tombstone instant. As with [[scd2Apply]], the guard is
    * NECESSARY, NOT SUFFICIENT: base rows the build suppressed
    * (no-op changes, REPEATED tombstones collapsed by the screen)
    * are unrecoverable from the history, so a delta landing behind
    * one of them passes the guard yet diverges from the full
    * rebuild — the append-only feed ordering is the real contract.
    * Same touched-keys-only scale shape. */
  def scd2ApplyWithDeletes(hist: DataFrame, changes: DataFrame,
                           keyCol: String, attrCols: Seq[String],
                           tsCol: String, tieCol: String,
                           deletedCol: String): DataFrame = {
    val keys = changes.select(col(keyCol)).distinct()
      .localCheckpoint() // splits hist twice
    val untouched = hist.join(keys, Seq(keyCol), "left_anti")
    val affected = hist.join(keys, Seq(keyCol), "left_semi")
      .localCheckpoint() // closed pass-through + seeds + offsets
    val closed = affected.filter(!col("is_current"))
      .drop("is_current")
    val open = affected.filter(col("is_current"))
    val ended = affected.groupBy(col(keyCol)).agg(
        max(col("valid_to_us")).as("_tomb_us"),
        max(col("version")).as("_maxv"),
        max(when(col("is_current"), 1).otherwise(0)).as("_o"))
      .filter(col("_o") === 0)
    val seedOpen = open.select(col(keyCol) +: attrCols.map(col) :+
      timestamp_micros(col("valid_from_us")).as(tsCol) :+
      lit(-1L).as(tieCol) :+ lit(false).as(deletedCol): _*)
    val seedTomb = ended.select(col(keyCol) +:
      attrCols.map(c => lit(null).cast(hist.schema(c).dataType)
        .as(c)) :+
      timestamp_micros(col("_tomb_us")).as(tsCol) :+
      lit(-1L).as(tieCol) :+ lit(true).as(deletedCol): _*)
    val horizon = open.select(col(keyCol),
        col("valid_from_us").as("_h"))
      .unionByName(ended.select(col(keyCol), col("_tomb_us").as("_h")))
    val delta = changes.select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol) :+ col(tieCol).cast("long").as(tieCol) :+
        coalesce(col(deletedCol).cast("boolean"), lit(false))
          .as(deletedCol): _*)
      .join(horizon, Seq(keyCol), "left")
      .withColumn(tieCol,
        when(col(tieCol) < 0, raise_error(concat(
            lit(s"scd2ApplyWithDeletes: delta $tieCol must be >= 0 " +
              "(-1 is the seed sentinel), got "),
            col(tieCol).cast("string"))))
          .when(unix_micros(col(tsCol)) < col("_h"),
            raise_error(concat(
              lit(s"scd2ApplyWithDeletes: delta ($tsCol, $tieCol) " +
                s"precedes the key's horizon for $keyCol="),
              col(keyCol).cast("string"),
              lit(" - stragglers need the rebuild repair path"))))
          .otherwise(col(tieCol)))
      .drop("_h")
    val voff = open.select(col(keyCol), (col("version") - 1).as("_voff"))
      .unionByName(ended.select(col(keyCol), col("_maxv").as("_voff")))
    val rebuilt = scd2BuildWithDeletes(
        seedOpen.unionByName(seedTomb).unionByName(delta),
        keyCol, attrCols, tsCol, tieCol, deletedCol)
      .join(voff, Seq(keyCol), "left")
      .withColumn("version",
        col("version") + coalesce(col("_voff"), lit(0L)))
      .drop("_voff", "is_current")
    untouched.drop("is_current")
      .unionByName(closed)
      .unionByName(rebuilt)
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** INCREMENTAL SCD2 MAINTENANCE — apply a new batch of change rows
    * to an existing [[scd2Build]] history without rebuilding it: the
    * real warehouse operation (a 100 TB dimension is maintained by
    * nightly deltas; a full rebuild re-shuffles the entire change log
    * every night, this touches ONLY the keys present in the delta).
    *
    * Semantics = full-rebuild equivalence: `scd2Apply(scd2Build(base),
    * delta) == scd2Build(base ∪ delta)` — the q273 oracle IS that
    * identity, and Round11OpsSpec asserts it on a split fixture.
    * Mechanism: untouched keys (anti-join on the delta's key set)
    * pass through byte-identical; for touched keys the CLOSED
    * versions pass through and the OPEN version is re-seeded as a
    * pseudo-change (its own valid_from, tie sentinel −1 so it sorts
    * before any real change) into a [[scd2Build]] over (seed ∪
    * delta); rebuilt versions shift by the seed's version − 1. A key
    * new in the delta has no seed and builds from version 1.
    *
    * PRECONDITIONS (the standard append-only CDC contract; violations
    * need a rebuild, they cannot be patched in place): every delta
    * row's (ts, tie) is strictly AFTER EVERY base change row for its
    * key — the CDC feed delivers in order — and `tieCol` is numeric
    * and >= 0 (the −1 seed sentinel must sort first). Both are
    * GUARDED at execution (round-12 ADVICE): a negative tie or a
    * delta ts behind the key's open valid_from raises a
    * `raise_error` inside the rebuilt branch's plan instead of
    * silently corrupting the dimension. The ts guard is NECESSARY,
    * NOT SUFFICIENT (round-12 review): the history cannot see base
    * rows the build SUPPRESSED (no-op changes after the open
    * version's valid_from), so a delta landing between a suppressed
    * base row and the feed head passes the guard yet breaks the
    * rebuild identity — only the feed's ordering discipline rules
    * that out; the guard catches the common violation class.
    *
    * Scale shape: one distinct on the delta's keys, two
    * semi/anti-joins on the key, then [[scd2Build]]'s single (key)
    * exchange + sort over O(touched keys' open rows + delta) — the
    * closed history (the dominant mass) is never re-sorted. */
  def scd2Apply(hist: DataFrame, changes: DataFrame, keyCol: String,
                attrCols: Seq[String], tsCol: String,
                tieCol: String): DataFrame = {
    val keys = changes.select(col(keyCol)).distinct()
      .localCheckpoint() // splits hist twice
    val untouched = hist.join(keys, Seq(keyCol), "left_anti")
    val affected = hist.join(keys, Seq(keyCol), "left_semi")
      .localCheckpoint() // closed pass-through + seed + version offset
    val closed = affected.filter(!col("is_current"))
      .drop("is_current")
    val open = affected.filter(col("is_current"))
    val seed = open.select(col(keyCol) +: attrCols.map(col) :+
      timestamp_micros(col("valid_from_us")).as(tsCol) :+
      lit(-1L).as(tieCol): _*)
    // PRECONDITION GUARDS (round-12 ADVICE): a violating delta
    // previously produced a silently wrong history; now it fails the
    // job at execution. The guards ride INSIDE the tie expression (a
    // dropped side column would be pruned out of the plan and never
    // evaluated): tie must be >= 0 (−1 is the seed sentinel — a
    // negative delta tie could sort before the seed), and a delta
    // row's ts must not precede the key's open-version valid_from
    // (the append-only CDC contract; ts == valid_from is legal, the
    // tie breaks it after the seed). The ts screen is one equi-join
    // against the O(touched keys) open rows — never the closed
    // history; a key new in the delta joins null and passes.
    val openFrom = open.select(col(keyCol),
      col("valid_from_us").as("_seed_from_us"))
    val delta = changes.select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol) :+ col(tieCol).cast("long").as(tieCol): _*)
      .join(openFrom, Seq(keyCol), "left")
      .withColumn(tieCol,
        when(col(tieCol) < 0, raise_error(concat(
            lit(s"scd2Apply: delta $tieCol must be >= 0 " +
              "(-1 is the seed sentinel), got "),
            col(tieCol).cast("string"))))
          .when(unix_micros(col(tsCol)) < col("_seed_from_us"),
            raise_error(concat(
              lit(s"scd2Apply: delta ($tsCol, $tieCol) precedes the " +
                s"open version's valid_from for $keyCol="),
              col(keyCol).cast("string"),
              lit(" - stragglers need the scd2Build repair path"))))
          .otherwise(col(tieCol)))
      .drop("_seed_from_us")
    val voff = open.select(col(keyCol),
      (col("version") - 1).as("_voff"))
    val rebuilt = scd2Build(seed.unionByName(delta), keyCol, attrCols,
        tsCol, tieCol)
      .join(voff, Seq(keyCol), "left")
      .withColumn("version",
        col("version") + coalesce(col("_voff"), lit(0L)))
      .drop("_voff", "is_current")
    untouched.drop("is_current")
      .unionByName(closed)
      .unionByName(rebuilt)
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
