package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{Bridge, CosineSim, GramAgg, HilbertIndex, JaroWinkler, MinHashAgg, MisraGriesAgg, QuantileSketchAgg, ReplaceInf, SimHashAgg}

/** Column-API entry points for the custom Catalyst expressions
  * (implementations in org.apache.spark.sql.graft — they need
  * package-private Catalyst types like AbstractDataType).
  */
object GraftFunctions {
  def replace_inf(c: Column, replacement: Column): Column =
    Bridge.column(ReplaceInf(Bridge.expression(c), Bridge.expression(replacement)))

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  /** DuckDB-parity Jaro-Winkler similarity (codegen'd static-call
    * expression; see [[org.apache.spark.sql.graft.JaroWinklerAlgo]] for
    * the pinned semantics). */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Hilbert curve index of two `bits`-bit dimensions (codegen'd
    * static-call expression — the 2-D layout key next to the Morton
    * z-value; see [[org.apache.spark.sql.graft.HilbertAlgo]]). */
  def hilbert_index(a: Column, b: Column, bits: Int): Column =
    Bridge.column(HilbertIndex(Bridge.expression(a),
      Bridge.expression(b), bits))

  /** All-k MinHash minima as one array-buffer aggregate (vs k separate
    * `min(...)` buffer slots). Input: a long token hash per row. */
  def minhash_agg(c: Column, k: Int, seed: Long = 12345L): Column =
    Bridge.column(
      MinHashAgg(Bridge.expression(c), k, seed).toAggregateExpression())

  /** Misra–Gries heavy-hitters summary: a bounded-memory frequent-items
    * sketch whose partial buffers never exceed `capacity` entries (the
    * during-the-pass sibling of [[collect_top_k]]'s post-aggregate
    * heap). Estimates are underestimates within n/(capacity+1); size
    * capacity ≥ distinct items for the exact (hash-comparable) regime.
    * Input: a string item per row; output: array<struct<item, est>>
    * sorted (est DESC, item ASC). */
  def misra_gries(c: Column, capacity: Int): Column =
    Bridge.column(
      MisraGriesAgg(Bridge.expression(c), capacity).toAggregateExpression())

  /** Exact Gram-matrix (Xᵀ X) upper triangle as ONE buffer aggregate
    * (vs a d(d+1)/2-struct explode per row): per-row products fixed to
    * integer micro-units inside the update loop, merge = elementwise
    * add. Output array<struct<i, j, g_micro>> in row-major triangle
    * order. Input: an array<double> vector per row. */
  def gram_agg(c: Column, dim: Int): Column =
    Bridge.column(
      GramAgg(Bridge.expression(c), dim).toAggregateExpression())

  /** 64-bit SimHash fingerprint as one array-buffer aggregate. Input:
    * a long token hash (xxhash64) per row. */
  def simhash_agg(c: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(c)).toAggregateExpression())

  /** Spark's own bounded-heap top-k aggregate (`CollectTopK` — private
    * to Catalyst, surfaced through the same Bridge as the rest of this
    * file): every partial buffer holds at most k elements, so a
    * grouped top-k shuffles ≤ k rows per group per map task — the
    * scalable replacement for the rank-window form, which serializes
    * each group through one task (a mega-group bottlenecks). With
    * `reverse = false` keeps the k LARGEST under the child's natural
    * ordering (lexicographic for structs), output sorted descending;
    * `reverse = true` keeps the k smallest, ascending. */
  def collect_top_k(c: Column, k: Int, reverse: Boolean = false): Column =
    Bridge.column(Bridge.collectTopK(Bridge.expression(c), k, reverse))

  /** Deterministic mergeable quantile sketch (MRL multi-level summary,
    * the quantile sibling of [[misra_gries]]): bounded per-level runs,
    * weight-conserving compaction, rank error ≤ #levels·n/capacity.
    * capacity ≥ n (even) ⇒ exact sorted value/count table,
    * hash-comparable. Input: a long per row; output:
    * array<struct<value, weight>> sorted by value, equal values
    * merged. */
  def quantile_sketch(c: Column, capacity: Int): Column =
    Bridge.column(
      QuantileSketchAgg(Bridge.expression(c), capacity)
        .toAggregateExpression())

  /** Native bloom-membership probe over a driver-built
    * `org.apache.spark.util.sketch.BloomFilter` (serialized form):
    * plants Spark's own codegen-capable `BloomFilterMightContain`
    * instead of a codegen-breaking Scala UDF. `value` must be LongType. */
  def bloom_might_contain(serialized: Array[Byte], value: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(serialized, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(value)))
}
