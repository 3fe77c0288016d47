package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SimilarityOps

/** SemDeDup-class semantic dedup: decision-table consistency, the
  * removed-set-is-justified subset property vs exact brute force, a
  * recall floor for both cluster assignments, and determinism. The
  * oracled q189 carries the DuckDB hash check for the bucket variant;
  * these specs cover what the oracle can't — that clustering only ever
  * MISSES true duplicate pairs (never invents one) and that the
  * adaptive IVF assignment recovers more of them than sign buckets. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val tau = 0.2

  private lazy val emb = Tables.load(spark, dir, "embeddings")

  /** ids removed by the exact global sequential rule: i is removed iff
    * SOME earlier j (any cluster) has cos(i,j) >= tau. */
  private lazy val globalRemoved: Set[Long] = {
    val v = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("_v"))
    val a = v.select(col("vec_id").as("_ida"), col("_v").as("_va"))
    val b = v.select(col("vec_id").as("_idb"), col("_v").as("_vb"))
    a.crossJoin(b).filter(col("_idb") < col("_ida"))
      .withColumn("_sim", graft.functions.GraftFunctions
        .cosine_sim(col("_va"), col("_vb")))
      .filter(col("_sim") >= tau)
      .select(col("_ida")).distinct().as[Long].collect().toSet
  }

  private def removedOf(decisions: org.apache.spark.sql.DataFrame) =
    decisions.filter(!col("kept")).select(col("vec_id"))
      .as[Long].collect().toSet

  test("decision table: every removal carries the evicting similarity, " +
       "every kept row none above threshold; rows partition the corpus") {
    val d = SimilarityOps.semanticDedup(emb, "vec_id", "embedding",
      threshold = tau, planes = 6, seed = 42L)
    assert(d.count() === emb.count())
    val removed = d.filter(!col("kept"))
    assert(removed.filter(col("max_prior_sim") < tau - 1e-6).count() === 0)
    val kept = d.filter(col("kept"))
    assert(kept.filter(col("max_prior_sim") >= tau + 1e-6).count() === 0)
  }

  test("clustering never invents a duplicate: removed set is a subset " +
       "of the exact global sequential rule's removals (both variants)") {
    val bucket = removedOf(SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", threshold = tau, planes = 6, seed = 42L))
    val ivf = removedOf(SimilarityOps.semanticDedupIvf(emb, "vec_id",
      "embedding", threshold = tau, nlist = 16, seed = 42L))
    assert((bucket -- globalRemoved).isEmpty,
      s"bucket variant removed non-duplicates: ${bucket -- globalRemoved}")
    assert((ivf -- globalRemoved).isEmpty,
      s"IVF variant removed non-duplicates: ${ivf -- globalRemoved}")
    info(s"global=${globalRemoved.size} bucket=${bucket.size} " +
      s"ivf=${ivf.size}")
    assert(bucket.nonEmpty && ivf.nonEmpty)
  }

  test("recall vs brute force: IVF cells recover most true duplicates " +
       "and beat sign buckets (the reason the production path is IVF)") {
    val bucket = removedOf(SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", threshold = tau, planes = 6, seed = 42L))
    val ivf = removedOf(SimilarityOps.semanticDedupIvf(emb, "vec_id",
      "embedding", threshold = tau, nlist = 16, seed = 42L))
    val n = globalRemoved.size.toDouble
    // measured on the fixture: bucket ~0.40, ivf ~0.86 — floors leave
    // headroom for fixture regeneration, not for a broken assignment
    assert(bucket.size / n >= 0.25, s"bucket recall ${bucket.size / n}")
    assert(ivf.size / n >= 0.70, s"IVF recall ${ivf.size / n}")
    assert(ivf.size > bucket.size)
  }

  test("a leading null embedding neither crashes the dimension probe " +
       "nor evicts anyone: null rows pass through as kept") {
    val withNull = Seq(
      (0L, null.asInstanceOf[Array[Double]]),
      (1L, Array(1.0, 0.0)),
      (2L, Array(1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val d = SimilarityOps.semanticDedup(withNull, "vec_id", "embedding",
      threshold = 0.5, planes = 2, seed = 7L)
    assert(d.count() === 3)
    val kept = d.filter(col("kept")).select(col("vec_id"))
      .as[Long].collect().toSet
    // identical vectors 1,2 dedup (keep 1); the null row is kept — a
    // null cosine can never reach the threshold
    assert(kept === Set(0L, 1L))
  }

  test("determinism: same seed reproduces the identical kept set") {
    val a = removedOf(SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", threshold = tau, planes = 6, seed = 42L))
    val b = removedOf(SimilarityOps.semanticDedup(emb, "vec_id",
      "embedding", threshold = tau, planes = 6, seed = 42L))
    assert(a === b)
  }
}
