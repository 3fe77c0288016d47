package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EvalOps

/** Cox proportional hazards + group-sequential monitor (round 15
  * batches B/C): from-scratch integer replay, hazard-ratio recovery,
  * log-rank sign agreement, boundary-crossing behavior, partition
  * invariance. */
class Round15SurvSeqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------- Cox PH

  /** From-scratch replay of the integer Newton chain (nano φ,
    * level cells, suffix-sum risk moments, micro level terms). */
  private def refCox(rows: Seq[(Long, Boolean, Long)],
                     iters: Int): (Long, Long, Long) = {
    var b = 0L
    def pass(b: Long): (Long, Long) = {
      val lev = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (t, rs) =>
          val phis = rs.map { case (_, _, x) =>
            (x, math.round(1e9 * math.exp((x * b).toDouble / 1e6)))
          }
          (t, phis.map(_._2).sum,
            phis.map(p => p._1 * p._2).sum,
            phis.map(p => p._1 * p._1 * p._2).sum,
            rs.count(_._2).toLong,
            rs.filter(_._2).map(_._3).sum)
      }
      var (su, si) = (0L, 0L)
      lev.indices.foreach { i =>
        val s0 = lev.drop(i).map(_._2).sum
        val s1 = lev.drop(i).map(_._3).sum
        val s2 = lev.drop(i).map(_._4).sum
        val d = lev(i)._5
        val sx = lev(i)._6
        if (d > 0 && s0 > 0) {
          su += math.round((sx.toDouble - d.toDouble *
            (s1.toDouble / s0.toDouble)) * 1e6)
          si += math.round(d.toDouble * (s2.toDouble / s0.toDouble -
            (s1.toDouble / s0.toDouble) * (s1.toDouble / s0.toDouble))
            * 1e6)
        }
      }
      (su, si)
    }
    for (_ <- 1 to iters) {
      val (su, si) = pass(b)
      if (si > 0) b += math.round(1e6 * su.toDouble / si.toDouble)
    }
    val (su, si) = pass(b)
    (b, su, si)
  }

  test("coxPh matches the from-scratch integer Newton replay on a " +
       "hand-built duration table") {
    val rows = Seq[(Long, Boolean, Long)](
      (1L, true, 1L), (1L, false, 0L), (2L, true, 1L), (2L, true, 0L),
      (3L, false, 1L), (4L, true, 0L), (5L, true, 1L), (5L, false, 0L),
      (6L, true, 0L), (7L, false, 1L))
    val df = rows.toDF("dur", "death", "x")
    val got = EvalOps.coxPh(df, "dur", "death", "x", iters = 4)
      .collect().head
    val (b, su, si) = refCox(rows, 4)
    assert(got.getAs[Long]("n") === 10L)
    assert(got.getAs[Long]("events") === 6L)
    assert(got.getAs[Long]("b_micro") === b)
    assert(got.getAs[Long]("u_final_micro") === su)
    assert(got.getAs[Long]("i_micro") === si)
    assert(got.getAs[Long]("hr_micro") ===
      math.round(1e6 * math.exp(b.toDouble / 1e6)))
  }

  test("coxPh recovers a known hazard ratio on a deterministic " +
       "exponential grid (HR = 2 => beta near ln 2)") {
    // inverse-CDF grid per arm: arm 1 hazard 0.2, arm 0 hazard 0.1;
    // durations discretized to days, all events observed
    val rows = (0 until 800).flatMap { i =>
      val u = (i + 0.5) / 800.0
      Seq((math.max(1L, math.round(-math.log(u) / 0.1)), true, 0L),
        (math.max(1L, math.round(-math.log(u) / 0.2)), true, 1L))
    }
    val got = EvalOps.coxPh(rows.toDF("dur", "death", "x"),
      "dur", "death", "x", iters = 5).collect().head
    val beta = got.getAs[Long]("b_micro") / 1e6
    assert(math.abs(beta - math.log(2.0)) < 0.1, s"beta=$beta")
    val hr = got.getAs[Long]("hr_micro") / 1e6
    assert(math.abs(hr - 2.0) < 0.25, s"hr=$hr")
    // converged: score at the final beta is near zero relative to info
    val u = got.getAs[Long]("u_final_micro").toDouble
    val inf = got.getAs[Long]("i_micro").toDouble
    assert(math.abs(u / inf) < 0.01, s"u/i=${u / inf}")
    // se > 0 present
    assert(got.getAs[Long]("se_micro") > 0L)
  }

  test("coxPh beta sign agrees with logRank O-E direction") {
    // arm x=1 dies faster => more observed events than expected in
    // arm a (o_minus_e > 0 with arm as the 'a' side) and beta > 0
    val rows = (0 until 400).flatMap { i =>
      val u = (i + 0.5) / 400.0
      Seq((math.max(1L, math.round(-math.log(u) / 0.05)),
          i % 5 != 0, 0L),
        (math.max(1L, math.round(-math.log(u) / 0.15)),
          i % 5 != 0, 1L))
    }
    val df = rows.toDF("dur", "death", "x")
    val cox = EvalOps.coxPh(df, "dur", "death", "x", 4)
      .collect().head
    val lr = EvalOps.logRank(
      df.select(col("dur"), col("death"), (col("x") === 1L).as("arm")),
      "dur", "death", "arm").collect().head
    val oMinusE = lr.getAs[Long]("o_minus_e_micro")
    val beta = cox.getAs[Long]("b_micro")
    assert(oMinusE > 0L, s"o_minus_e=$oMinusE")
    assert(beta > 0L, s"beta=$beta")
    assert(math.signum(oMinusE.toDouble) ===
      math.signum(beta.toDouble))
  }

  test("coxPh is partition-invariant and freezes on a degenerate " +
       "(single-arm-constant) covariate") {
    val rows = (0 until 300).map { i =>
      ((i % 9 + 1).toLong, i % 3 != 0, (i % 2).toLong)
    }
    val df = rows.toDF("dur", "death", "x")
    val a = EvalOps.coxPh(df, "dur", "death", "x", 4)
      .collect().head.toSeq
    val b = EvalOps.coxPh(df.repartition(7), "dur", "death", "x", 4)
      .collect().head.toSeq
    assert(a === b)
    // constant covariate: S2/S0 - (S1/S0)^2 = 0 per level, so the
    // information is 0 and beta stays exactly 0
    val const = rows.map { case (d, e, _) => (d, e, 1L) }
      .toDF("dur", "death", "x")
    val frozen = EvalOps.coxPh(const, "dur", "death", "x", 4)
      .collect().head
    assert(frozen.getAs[Long]("b_micro") === 0L)
    assert(frozen.isNullAt(frozen.fieldIndex("se_micro")))
  }

  // ------------------------------------- group-sequential monitor

  private def seqFixture(pA: Double, pB: Double,
                         days: Int, perArmDay: Int)
      : Seq[(String, Boolean, Boolean)] =
    (0 until days).flatMap { d =>
      val day = f"2026-07-${d + 1}%02d"
      (0 until perArmDay).flatMap { i =>
        val frac = (i + 0.5) / perArmDay
        Seq((day, true, frac < pA), (day, false, frac < pB))
      }
    }

  test("groupSequential crosses on a strong drift, and the OBF " +
       "stop_look is the earliest crossed look") {
    val df = seqFixture(0.30, 0.10, 10, 200)
      .toDF("day", "arm", "conv")
    val got = EvalOps.groupSequential(df, "day", "arm", "conv",
        EvalOps.obfBoundariesMicro(5, 2.0401))
      .orderBy("look").collect()
    assert(got.length === 5)
    assert(got.map(_.getAs[Long]("days")).sum === 10L)
    val stop = got.head.getAs[Long]("stop_look")
    val crossedLooks = got.filter(_.getAs[Boolean]("crossed"))
      .map(_.getAs[Long]("look"))
    assert(crossedLooks.nonEmpty)
    assert(stop === crossedLooks.min)
    // the z at the stop look exceeds its boundary
    val atStop = got.find(_.getAs[Long]("look") == stop).get
    assert(math.abs(atStop.getAs[Long]("z_micro")) >=
      atStop.getAs[Long]("bound_micro"))
    // OBF boundaries decrease monotonically across looks
    val bounds = got.map(_.getAs[Long]("bound_micro"))
    assert(bounds.zip(bounds.tail).forall { case (a, b) => a > b })
  }

  test("groupSequential does not cross on a null effect, and Pocock " +
       "crosses no later than OBF on a moderate drift") {
    val nullDf = seqFixture(0.20, 0.20, 10, 150)
      .toDF("day", "arm", "conv")
    val nul = EvalOps.groupSequential(nullDf, "day", "arm", "conv",
      EvalOps.obfBoundariesMicro(5, 2.0401)).collect()
    assert(nul.forall(r => !r.getAs[Boolean]("crossed")))
    assert(nul.forall(_.isNullAt(nul.head.fieldIndex("stop_look"))))
    // moderate drift: early looks sit under the big early OBF bound
    val drift = seqFixture(0.24, 0.18, 10, 150)
      .toDF("day", "arm", "conv")
    val obf = EvalOps.groupSequential(drift, "day", "arm", "conv",
      EvalOps.obfBoundariesMicro(5, 2.0401)).collect()
    val poc = EvalOps.groupSequential(drift, "day", "arm", "conv",
      EvalOps.pocockBoundariesMicro(5, 2.413)).collect()
    def stopOf(rows: Array[org.apache.spark.sql.Row]): Option[Long] =
      if (rows.head.isNullAt(rows.head.fieldIndex("stop_look"))) None
      else Some(rows.head.getAs[Long]("stop_look"))
    (stopOf(poc), stopOf(obf)) match {
      case (Some(p), Some(o)) => assert(p <= o, s"pocock=$p obf=$o")
      case (None, Some(o)) =>
        fail(s"pocock missed a crossing OBF found at look $o")
      case _ => // neither or only pocock crossed: acceptable shapes
    }
  }

  test("groupSequential z at a look matches the twoProportionZ " +
       "readout over the same prefix, and is partition-invariant") {
    val df = seqFixture(0.25, 0.15, 10, 120)
      .toDF("day", "arm", "conv")
    val got = EvalOps.groupSequential(df, "day", "arm", "conv",
        EvalOps.obfBoundariesMicro(5, 2.0401))
      .orderBy("look").collect()
    // look 2 covers days 1..4 of 10 (div rule): replay with a filter
    val look2Days = got.take(2).map(_.getAs[Long]("days")).sum
    val prefix = df.select(col("day"), col("arm"), col("conv"))
      .where(col("day") <= f"2026-07-$look2Days%02d")
    val z = EvalOps.twoProportionZ(prefix, "arm", "conv")
      .collect().head.getAs[Long]("z_micro")
    assert(got(1).getAs[Long]("z_micro") === z)
    val again = EvalOps.groupSequential(df.repartition(7), "day",
        "arm", "conv", EvalOps.obfBoundariesMicro(5, 2.0401))
      .orderBy("look").collect()
    assert(got.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }
}
