package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, CleanOps}

/** Autocorrelation and the DP histogram release (round 15 batch E):
  * hand-computed ACF tables, degenerate-series nulls, partition
  * invariance, and a from-scratch replay of the seeded Laplace
  * mechanism. */
class Round15SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("acf reproduces the hand-computed alternating-series table") {
    // x = 1,2,1,2,1,2: c = n*x - S = [-3,3,-3,3,-3,3], den = 54
    // lag1: -45/54, lag2: 36/54, lag3: -27/54
    val s = Seq((1L, 1L), (2L, 2L), (3L, 1L), (4L, 2L), (5L, 1L),
      (6L, 2L)).toDF("t", "x")
    val got = AggOps.acf(s, "t", "x", maxLag = 3)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 5L, -0.833333), (2L, 4L, 0.666667),
      (3L, 3L, -0.5)))
  }

  test("acf of a constant series is null (zero denominator), never " +
       "a divide-by-zero error") {
    val s = (1 to 10).map(i => (i.toLong, 7L)).toDF("t", "x")
    val got = AggOps.acf(s, "t", "x", maxLag = 2).collect()
    assert(got.length === 2 && got.forall(_.isNullAt(2)))
  }

  test("acf is partition-invariant (exact integer sums)") {
    val daily = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("d")))
        .cast("long"))
    def run(df: org.apache.spark.sql.DataFrame) =
      AggOps.acf(df, "t", "x", maxLag = 7).orderBy("lag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(daily) === run(daily.repartition(13)))
  }

  test("dp histogram matches a from-scratch replay of the seeded " +
       "Laplace mechanism, and released = n*1e6 + noise") {
    def refNoiseMicro(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp15:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val noise = -2.0 * math.signum(u - 0.5) *
        math.log(1.0 - 2.0 * math.abs(u - 0.5))
      BigDecimal(noise * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val got = CleanOps.dpHistogram(ev, "event_type", epsilon = 0.5,
      salt = "dp15").collect()
    val truth = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val (k, n, nm, rel) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(n === truth(k), s"true count for $k")
      assert(nm === refNoiseMicro(k), s"noise for $k")
      assert(rel === n * 1000000L + nm, s"release for $k")
    }
  }

  test("seasonal decomposition recovers a pure weekly pattern " +
       "exactly: constant trend, the pattern as seasonal, zero " +
       "residual") {
    // x_t = 10 + (t mod 7): any centered 7-row MA sums one full
    // period -> trend = 13e6 everywhere; seasonal = (p-3)e6 (already
    // zero-mean); residual = 0 exactly
    val days = (0 until 21).map { i =>
      (java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString,
        10L + (i % 7))
    }.toDF("d", "x").withColumn("d", to_date(col("d")))
    val got = AggOps.seasonalDecompose(days, "d", "x")
      .orderBy("day").collect()
    assert(got.length === 15) // 21 minus 3 edge rows each side
    got.foreach { r =>
      assert(r.getLong(2) === 13000000L, s"trend on ${r.getString(0)}")
      val p = (java.time.LocalDate.parse(r.getString(0)).toEpochDay -
        java.time.LocalDate.of(2024, 1, 1).toEpochDay) % 7
      assert(r.getLong(3) === (p - 3) * 1000000L,
        s"seasonal on ${r.getString(0)}")
      assert(r.getLong(4) === 0L, s"residual on ${r.getString(0)}")
    }
  }

  test("seasonal decomposition reconstructs exactly on real data: " +
       "trend + seasonal + residual == x * 1e6 per row") {
    val daily = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val got = AggOps.seasonalDecompose(daily, "d", "x").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) ===
        r.getLong(1) * 1000000L, s"identity on ${r.getString(0)}")
    }
  }

  test("dp noise is scale-correct: doubling epsilon halves the draw " +
       "for the same seed (pure b scaling)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val half = CleanOps.dpHistogram(ev, "event_type", 0.5, "dp15")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val one = CleanOps.dpHistogram(ev, "event_type", 1.0, "dp15")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    half.keys.foreach { k =>
      assert(math.abs(half(k) - 2 * one(k)) <= 1, s"scaling for $k")
    }
  }
}
