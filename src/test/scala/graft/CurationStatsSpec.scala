package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, TextOps}

/** DSIR importance weights, winnowing fingerprints, and the
  * chi-square independence test — each checked against a from-scratch
  * Scala reference on hand-built corpora. */
class CurationStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Same md5 derivations as the operators (hex prefix of the digest). */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(w: String): Int =
    Integer.parseInt(md5Hex(w).substring(0, 2), 16)

  private def hash36(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 9), 16)

  // ------------------------------------------------------------ DSIR

  test("dsirWeights matches the from-scratch bucket-LM computation " +
       "and ranks target-like docs above off-target docs") {
    val raw = Seq((1L, "x x x x"), (2L, "y y y y"), (3L, "x y x y"))
      .toDF("id", "text")
    val target = Seq(Tuple1("x x x")).toDF("text")
    val got = TextOps.dsirWeights(raw, target, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: bucket counts with add-one smoothing over 256 buckets
    val rawToks = Seq.fill(4)("x") ++ Seq.fill(4)("y") ++
      Seq("x", "y", "x", "y")
    val tgtToks = Seq.fill(3)("x")
    val rb = rawToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val tb = tgtToks.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (rawToks.size.toLong, tgtToks.size.toLong)
    def lam(b: Int): Long = math.round(math.log(
      ((tb.getOrElse(b, 0L) + 1) * (nr + 256)).toDouble /
      ((rb.getOrElse(b, 0L) + 1) * (nt + 256)).toDouble) * 1e6)
    def weight(toks: Seq[String]): Long =
      toks.groupBy(bucket).map { case (b, g) => g.size * lam(b) }.sum
    assert(got(0) === ((1L, 4L, weight(Seq.fill(4)("x")))))
    assert(got(1) === ((2L, 4L, weight(Seq.fill(4)("y")))))
    assert(got(2) === ((3L, 4L, weight(Seq("x", "y", "x", "y")))))
    // the all-target-token doc must outscore the off-target doc,
    // with the mixed doc in between
    assert(got(0)._3 > got(2)._3 && got(2)._3 > got(1)._3)
  }

  // ------------------------------------------------- winnowing (MOSS)

  /** Reference robust winnowing: min over each complete window of
    * packed (hash36·2^24 + (2^24−1−pos)) — rightmost on hash ties. */
  private def refFingerprints(tokens: Seq[String], k: Int,
                              w: Int): Set[(Long, Long)] = {
    val packed = tokens.sliding(k).zipWithIndex.map { case (sh, pos) =>
      hash36(sh.mkString(" ")) * 16777216L + (16777215L - pos)
    }.toVector
    packed.sliding(w).filter(_.size == w).map(_.min).toSet
      .map((p: Long) => (p / 16777216L, 16777215L - (p % 16777216L)))
  }

  test("winnowFingerprintRows equals the reference selection, " +
       "including rightmost tie-breaks on repeated shingles") {
    // 'a b' repeats → identical shingle hashes inside one window; the
    // packed encoding must pick the RIGHTMOST occurrence
    val text = "a b a b a b a b c d"
    val rows = TextOps.winnowFingerprintRows(
        Seq((1L, text)).toDF("id", "text"), "id", "text", k = 2, w = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows === refFingerprints(text.split(" ").toSeq, 2, 3))
  }

  test("winnowing guarantee: docs sharing a w+k−1 token run share a " +
       "fingerprint hash; disjoint docs share none") {
    val docs = Seq(
      (1L, "p1 p2 a b c d e f g q1 q2"),
      (2L, "r1 r2 r3 a b c d e f g"),   // shares the 7-token run
      (3L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10")
    ).toDF("id", "text")
    val fp = TextOps.winnowFingerprintRows(docs, "id", "text",
      k = 4, w = 4)
    val pairs = fp.as("a").join(fp.as("b"),
        col("a.fp_hash") === col("b.fp_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("winnowing density: every complete window contributes, " +
       "fingerprint count stays within the 2/(w+1) expectation band") {
    val text = (1 to 200).map(i => s"t${(i * 7919) % 97}").mkString(" ")
    val row = TextOps.winnowFingerprints(
        Seq((1L, text)).toDF("id", "text"), "id", "text", k = 4, w = 4)
      .collect()(0)
    val nGrams = row.getAs[Long]("n_grams")
    val nFp = row.getAs[Long]("n_fingerprints")
    assert(nGrams === 197)
    // hard bounds: ≥ windows/w (min one per w consecutive windows),
    // ≤ windows (one per window)
    val windows = nGrams - 4 + 1
    assert(nFp >= windows / 4 && nFp <= windows)
  }

  test("winnowing edge: a doc with shingles but no complete window " +
       "reports zero fingerprints; too-short docs drop out") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b")).toDF("id", "text")
    // k=4 → doc1 has 2 shingles < w=4 windows; doc2 has none
    val got = TextOps.winnowFingerprints(docs, "id", "text", k = 4, w = 4)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L))
    assert(got(0).getAs[Long]("n_fingerprints") === 0L)
    assert(got(0).getAs[String]("fp_digest") === md5Hex(""))
  }

  // ------------------------------------------------------ chi-square

  test("chiSquareIndependence: proportional table gives chi2 = 0, " +
       "hand-computed 2x2 matches exactly") {
    // proportional: O = [[10,20],[20,40]] — expected == observed
    val prop = (Seq.fill(10)(("a", 0L)) ++ Seq.fill(20)(("a", 1L)) ++
      Seq.fill(20)(("b", 0L)) ++ Seq.fill(40)(("b", 1L)))
      .toDF("r", "c")
    val p = AggOps.chiSquareIndependence(prop, "r", "c").collect()(0)
    assert(p.getAs[Long]("n") === 90L)
    assert(p.getAs[Double]("chi2") === 0.0)
    // skewed: O = [[30,10],[10,30]] → E = 20 per cell,
    // chi2 = 4·(10²/20) = 20, dof = 1, V = sqrt(20/80) = 0.5
    val skew = (Seq.fill(30)(("a", 0L)) ++ Seq.fill(10)(("a", 1L)) ++
      Seq.fill(10)(("b", 0L)) ++ Seq.fill(30)(("b", 1L)))
      .toDF("r", "c")
    val s = AggOps.chiSquareIndependence(skew, "r", "c").collect()(0)
    assert(s.getAs[Long]("n_cells") === 4L)
    assert(s.getAs[Long]("dof") === 1L)
    assert(s.getAs[Double]("chi2") === 20.0)
    assert(s.getAs[Double]("cramers_v") === 0.5)
  }
}
