package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted FIT ARTIFACTS (round-12 verdict task 3): the 100 TB
  * pattern is "fit once, ship the artifact" — a quantizer's centroid
  * table, a tokenizer's merge list, a discretizer's cut dictionary are
  * fitted on one (often sampled) pass, PERSISTED, and reloaded by
  * every downstream run, cluster, and engine. The in-JVM memo
  * (`SparkEntry.microCents`) amortizes a fit within one session; this
  * is its durable twin across sessions.
  *
  * Format: plain parquet, one file (`coalesce(1)` — every artifact
  * here is driver-bounded by construction: O(k·d) centroid longs,
  * O(rounds) merges, O(bins) cuts; the S6 bounded-collect convention
  * applies to the LOAD side for the same reason). Plain parquet keeps
  * the artifact engine-portable — DuckDB reads the same file the
  * oracle side of q276 could, and a Python training job reads it with
  * pyarrow unchanged.
  *
  * Round-trip exactness: centroids are the integer micro-unit longs of
  * [[SimilarityOps.kMeansMicro]] and merges are strings — both
  * lossless in parquet, so `load(save(x)) == x` bit for bit and a
  * loaded fit replays IDENTICAL query results (q276 hash-matches
  * q48's memo-fit chain through a save/load cycle).
  */
object FitArtifacts {

  /** Persist a [[SimilarityOps.kMeansMicro]] centroid table as
    * `(cell int, centroid_micro array<long>)` parquet. */
  def saveCentroids(spark: SparkSession, path: String,
                    cents: Array[Array[Long]]): Unit = {
    import spark.implicits._
    require(cents.nonEmpty, "refusing to persist an empty centroid table")
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid_micro")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCentroids]] table back into the injectable
    * `Array[Array[Long]]` form ([[SimilarityOps.ivfTopKMicro]]'s
    * `cents` parameter). Cells must be contiguous 0..k−1 — a partial
    * or reordered artifact fails loudly instead of assigning rows to
    * silently shifted cells. */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Long]] = {
    val rows = spark.read.parquet(path).orderBy(col("cell")).collect()
    require(rows.nonEmpty, s"no centroid rows at $path")
    rows.zipWithIndex.foreach { case (r, i) =>
      require(r.getInt(0) == i,
        s"centroid cells at $path are not contiguous: " +
          s"expected cell $i, found ${r.getInt(0)}") }
    rows.map(_.getSeq[Long](1).toArray)
  }

  /** Persist a small fitted dictionary table (quantile/equi-depth cut
    * tables, vocabularies, encoders) as single-file parquet. The
    * caller owns the guarantee that `df` is artifact-sized (O(bins),
    * not O(rows)) — that is what makes `coalesce(1)` safe. */
  def saveTable(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a [[saveTable]] artifact (schema as written). */
  def loadTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a [[TextOps.bpeMerges]] merge table (round, sym_a,
    * sym_b, pair_count) — training order is the artifact's semantics,
    * carried by the `round` column. */
  def saveMerges(merges: DataFrame, path: String): Unit =
    saveTable(merges.orderBy(col("round")), path)

  /** Load a merge table into [[TextOps.bpeEncode]]'s `merges`
    * parameter — the (a, b) list in training order. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("round")).collect()
      .map(r => (r.getAs[String]("sym_a"), r.getAs[String]("sym_b")))
      .toSeq
}
