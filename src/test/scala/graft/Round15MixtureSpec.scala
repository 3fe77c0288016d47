package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SplitOps

/** Multiplicative-weights domain reweighting (round 15 batch F): the
  * update rule against a from-scratch scalar replay, normalization
  * bookkeeping, and the DoReMi direction property (excess loss ⇒
  * rising weight). */
class Round15MixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** From-scratch replay of the exact integer update chain. */
  private def refWeights(losses: Seq[(String, Long)], eta: Double,
                         rounds: Int): Map[(Long, String), Long] = {
    val mn = losses.map(_._2).min
    val k = losses.size
    val fexp = losses.map { case (g, l) =>
      g -> BigDecimal(math.exp(eta * (l - mn).toDouble / 1e6) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    var w = losses.map { case (g, _) => g -> 1000000L / k }.toMap
    val out = scala.collection.mutable.Map[(Long, String), Long]()
    losses.foreach { case (g, _) => out((0L, g)) = w(g) }
    for (r <- 1 to rounds) {
      val raw = losses.map { case (g, _) => g -> w(g) * fexp(g) }.toMap
      val tr = raw.values.sum
      w = raw.map { case (g, v) => g -> v * 1000000L / tr }
      losses.foreach { case (g, _) => out((r.toLong, g)) = w(g) }
    }
    out.toMap
  }

  private val losses = Seq(("web", 1000000L), ("code", 1693147L),
    ("forum", 1200000L))

  test("the update chain matches the scalar replay round by round") {
    val got = SplitOps.mwMixtureWeights(losses.toDF("src", "loss"),
        "src", "loss", eta = 0.2, rounds = 5)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    assert(got === refWeights(losses, 0.2, 5))
  }

  test("round 0 is uniform; every round's weights sum to 1e6 within " +
       "the k-truncation slack") {
    val rows = SplitOps.mwMixtureWeights(losses.toDF("src", "loss"),
      "src", "loss", eta = 0.2, rounds = 5).collect()
    val byRound = rows.groupBy(_.getLong(0))
    assert(byRound(0L).map(_.getLong(4)).toSet === Set(333333L))
    byRound.foreach { case (r, rs) =>
      val s = rs.map(_.getLong(4)).sum
      assert(s <= 1000000L && s > 1000000L - 3, s"round $r sum $s")
    }
  }

  test("DoReMi direction: the highest-excess domain's weight rises " +
       "every round, the zero-excess domain's falls") {
    val rows = SplitOps.mwMixtureWeights(losses.toDF("src", "loss"),
      "src", "loss", eta = 0.2, rounds = 5).collect()
    def traj(g: String) = rows.filter(_.getString(1) == g)
      .sortBy(_.getLong(0)).map(_.getLong(4)).toSeq
    assert(traj("code").sliding(2).forall { case Seq(a, b) => b > a })
    assert(traj("web").sliding(2).forall { case Seq(a, b) => b < a })
  }
}
