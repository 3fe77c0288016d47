package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** PMI+PCA embedding capstone (round 15 batch C): output invariants
  * of the composed q363 pipeline plus a from-scratch scalar replay of
  * the PPMI cell and cosine arithmetic — the DuckDB oracle replays
  * the whole chain; this pins the algebra against an independent
  * Scala spelling. */
class Round15EmbedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** From-scratch scalar PPMI + cosine over the same corpus: top-24
    * vocabulary, symmetrized adjacency, Laplace-smoothed micro-nats. */
  private def refEmbeddings(): (Seq[String], Map[String, Array[Long]]) = {
    val docs = Tables.load(spark, dir, "documents")
      .select(lower(col("text"))).collect().map(_.getString(0))
    val toks = docs.map(_.split("\\s+").filter(_.nonEmpty).toSeq)
    val freq = toks.flatten.groupBy(identity).view.mapValues(_.size)
    val vocab = freq.toSeq.sortBy { case (w, f) => (-f, w) }
      .take(24).map(_._1).sorted
    val wi = vocab.zipWithIndex.toMap
    val k = 24
    val c = Array.ofDim[Long](k, k)
    toks.foreach { t =>
      t.sliding(2).foreach {
        case Seq(a, b) if wi.contains(a) && wi.contains(b) =>
          c(wi(a))(wi(b)) += 1; c(wi(b))(wi(a)) += 1
        case _ =>
      }
    }
    val r = c.map(_.sum)
    val tt = r.sum
    val p = Array.tabulate(k, k) { (i, j) =>
      math.max(0L, math.round(math.log(
        ((c(i)(j) + 1).toDouble * (tt + 576)) /
          ((r(i) + 24).toDouble * (r(j) + 24))) * 1e6))
    }
    (vocab, vocab.zipWithIndex.map { case (w, i) => w -> p(i) }.toMap)
  }

  private lazy val q363 =
    SparkEntry.queries("q363_pmi_pca_embed")(spark, dir).collect()

  test("capstone output shape: 3 ranked neighbors per surviving " +
       "vocabulary word, sims in [-1, 1] and non-increasing") {
    val byW = q363.groupBy(_.getString(0))
    assert(byW.nonEmpty)
    byW.foreach { case (w, rows) =>
      val ranked = rows.sortBy(_.getInt(2))
      assert(ranked.map(_.getInt(2)).toSeq === Seq(1, 2, 3), s"word $w")
      val sims = ranked.map(_.getDouble(4))
      assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
      assert(sims.sliding(2).forall { case Array(a, b) => a >= b },
        s"word $w sims must be ranked: ${sims.toSeq}")
      assert(rows.forall(_.getString(3) != w), s"word $w self-neighbor")
    }
  }

  test("the engine's PPMI rows and top-1 neighbors match the scalar " +
       "replay (cosine over identical integer vectors)") {
    val (vocab, ref) = refEmbeddings()
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val x = a.map(_.toDouble / 1e6); val y = b.map(_.toDouble / 1e6)
      val dot = x.zip(y).map { case (u, v) => u * v }.sum
      dot / (math.sqrt(x.map(u => u * u).sum) *
        math.sqrt(y.map(u => u * u).sum))
    }
    val live = vocab.filter(w => ref(w).exists(_ > 0))
    q363.filter(_.getInt(2) == 1).foreach { row =>
      val w = row.getString(0)
      val want = live.filter(_ != w)
        .map(n => n -> BigDecimal(cos(ref(w), ref(n)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sortBy { case (n, s) => (-s, n) }.head
      assert(row.getString(3) === want._1, s"word $w top-1 neighbor")
    }
  }

  test("pc1 is the exact integer projection onto the trained " +
       "component: not degenerate, and identical across words with " +
       "identical PPMI rows") {
    val (_, ref) = refEmbeddings()
    val pc1 = q363.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pc1.values.exists(_ != 0L), "component collapsed to zero")
    // words with equal rows must project equally (pure function of
    // the row — catches any per-word nondeterminism in the bridge)
    pc1.keys.toSeq.combinations(2).foreach { case Seq(a, b) =>
      if (ref(a).toSeq == ref(b).toSeq)
        assert(pc1(a) === pc1(b), s"$a vs $b")
    }
  }
}
