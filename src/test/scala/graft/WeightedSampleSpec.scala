package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SplitOps

/** A-ES exact-k weighted sampling: reference equality, determinism
  * under partitioning, weight-proportional pull, and the w ≤ 0
  * exclusion contract. */
class WeightedSampleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def refKeys(ids: Seq[Long], w: Long => Long,
                      salt: String): Map[Long, Long] =
    ids.filter(w(_) > 0).map { id =>
      val u = (java.lang.Long.parseLong(
        md5Hex(id.toString + salt).substring(0, 8), 16) + 1.0) /
        4294967296.0
      id -> math.round(math.log(u) / w(id) * 1e12)
    }.toMap

  test("weightedExactKSample equals the reference A-ES draw and is " +
       "partition-invariant") {
    val ids = (1L to 100L).toSeq
    def w(id: Long): Long = 100 + (id % 7) * 50
    val df = ids.map(i => (i, w(i))).toDF("id", "wt")
    val ref = refKeys(ids, w, "s1").toSeq.sortBy { case (id, k) =>
      (-k, id)
    }.take(10).map(_._1).toSet
    for (parts <- Seq(1, 8)) {
      val got = SplitOps.weightedExactKSample(df.repartition(parts),
          "id", col("wt"), k = 10, salt = "s1")
        .collect().map(_.getLong(0)).toSet
      assert(got === ref, s"parts=$parts")
    }
  }

  test("heavier items dominate the draw; zero/negative/null weights " +
       "are never drawn") {
    val rows = (0L until 100L).map(i => (i, Some(1L))) ++
      (100L until 200L).map(i => (i, Some(1000L))) ++
      Seq((900L, Some(0L)), (901L, Some(-5L)),
        (902L, Option.empty[Long]))
    val df = rows.toDF("id", "wt")
    val got = SplitOps.weightedExactKSample(df, "id", col("wt"),
        k = 50, salt = "s2")
      .collect().map(_.getLong(0))
    assert(got.length === 50)
    assert(!got.exists(_ >= 900L))
    // 1000:1 odds — the light stratum can contribute at most a few
    assert(got.count(_ >= 100L) > 40)
  }
}
