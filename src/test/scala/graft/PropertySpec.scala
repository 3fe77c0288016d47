package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.{DedupOps, SplitOps, TextOps}

/** Generator-driven invariants (SURVEY §5 item 3): the properties that
  * must hold for ALL inputs, not just the examples the unit specs pin.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // seeded ScalaCheck sampling (the scalatest bridge isn't on the
  // offline classpath; generators + a fixed seed give the same
  // deterministic coverage)
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSeeded[A](g: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    samples(g, n).foreach(f)

  private val anyDouble: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e12, 1e12),
    Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity,
      Double.NaN, 0.0, -0.0))

  test("replace_inf: output is never infinite, and is idempotent") {
    forAllSeeded(Gen.listOfN(40, anyDouble)) { xs: List[Double] =>
      {
        val df = xs.toDF("x")
        val once = df.select(
          GraftFunctions.replace_inf(col("x"), lit(-1.0)).as("y"))
        val onceVals = once.collect().map(_.getDouble(0))
        assert(onceVals.forall(v => !v.isInfinite))
        val twiceVals = once.select(
          GraftFunctions.replace_inf(col("y"), lit(-1.0)).as("z"))
          .collect().map(_.getDouble(0))
        // NaN != NaN, so compare bitwise
        assert(onceVals.map(java.lang.Double.doubleToLongBits).toSeq ===
          twiceVals.map(java.lang.Double.doubleToLongBits).toSeq)
      }
    }
  }

  test("antiJoinSplit: partition invariants hold for arbitrary fractions") {
    forAllSeeded(Gen.zip(Gen.choose(0.05, 0.95), Gen.choose(0L, 1000L)),
        n = 6) { case (frac: Double, seed: Long) =>
        val df = (0 until 300).map(i => (i.toLong, s"s${i % 4}"))
          .toDF("id", "s")
        val (train, valid) = SplitOps.antiJoinSplit(df, "id", "s", frac, seed)
        assert(train.count() + valid.count() === 300)
        assert(train.select("id").intersect(valid.select("id"))
          .count() === 0)
    }
  }

  test("jaccardVerify: values always in [0,1]; 1 iff identical token sets") {
    val word = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    forAllSeeded(Gen.zip(doc, doc), n = 10) { case (t1: String, t2: String) =>
      val docs = Seq((0L, t1), (1L, t2)).toDF("doc_id", "text")
      val cands = Seq((0L, 1L)).toDF("id_a", "id_b")
      val j = DedupOps.jaccardVerify(docs, "doc_id", "text", cands)
        .head.getDouble(2)
      assert(j >= 0.0 && j <= 1.0)
      val set1 = t1.split("\\s+").filter(_.nonEmpty).toSet
      val set2 = t2.split("\\s+").filter(_.nonEmpty).toSet
      if (set1 == set2) assert(j === 1.0)
      if ((set1 & set2).isEmpty) assert(j === 0.0)
    }
  }

  test("setFingerprint: permutation-invariant for any token multiset") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    forAllSeeded(Gen.zip(Gen.listOfN(8, word), Gen.choose(0L, 99L)),
        n = 10) { case (ws: List[String], seed: Long) =>
        val shuffled = new scala.util.Random(seed).shuffle(ws)
        val df = Seq((ws.mkString(" "), shuffled.mkString(" ")))
          .toDF("x", "y")
          .select(TextOps.setFingerprint(col("x")).as("fx"),
            TextOps.setFingerprint(col("y")).as("fy"))
        val r = df.head()
        assert(r.getString(0) === r.getString(1))
    }
  }

  test("simhash: permuting tokens never changes the fingerprint") {
    val word = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7")
    forAllSeeded(Gen.zip(Gen.listOfN(10, word), Gen.choose(0L, 99L)),
        n = 8) { case (ws: List[String], seed: Long) =>
        val shuffled = new scala.util.Random(seed).shuffle(ws)
        val docs = Seq((0L, ws.mkString(" ")), (1L, shuffled.mkString(" ")))
          .toDF("doc_id", "text")
        val fp = DedupOps.simhash64(docs, "doc_id", "text")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(fp(0L) === fp(1L))
    }
  }

  test("packSequences: offsets stay below budget, bins are non-decreasing " +
       "in order, and bin boundaries respect the cumulative token count") {
    val word = Gen.oneOf("a", "b", "cc", "ddd")
    val doc = Gen.choose(1, 9).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" ")))
    forAllSeeded(Gen.zip(Gen.listOfN(8, doc), Gen.choose(3, 12)),
        n = 8) { case (docs: List[String], budget: Int) =>
        val df = docs.zipWithIndex.map { case (t, i) => ("g", i.toLong, t) }
          .toDF("g", "id", "text")
        val out = TextOps.packSequences(df, "g", "id", "text", budget)
          .orderBy("id").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        var cum = 0L
        out.foreach { case (_, n, bin, off) =>
          assert(off >= 0 && off < budget)
          assert(bin === cum / budget)
          assert(off === cum % budget)
          cum += n
        }
        assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
    }
  }

  test("hashMixture: exact ceil(f*n) per group for arbitrary fractions; " +
       "output is always a subset of the input") {
    forAllSeeded(Gen.zip(Gen.choose(0.05, 0.95), Gen.choose(0.05, 0.95)),
        n = 6) { case (fa: Double, fb: Double) =>
        val df = (0 until 120).map(i =>
          (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
        val out = SplitOps.hashMixture(df, "g", "id",
          Map("a" -> fa, "b" -> fb))
        val sizes = out.groupBy("g").count().collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap
        assert(sizes.getOrElse("a", 0L) === math.ceil(fa * 40).toLong)
        assert(sizes.getOrElse("b", 0L) === math.ceil(fb * 80).toLong)
        assert(out.join(df, Seq("id"), "left_anti").count() === 0)
    }
  }

  test("hashMixtureDistributed is bit-identical to hashMixture for " +
       "arbitrary fractions (same rows, not just same sizes)") {
    forAllSeeded(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)),
        n = 6) { case (fa: Double, fb: Double) =>
        val df = (0 until 150).map(i =>
          (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "g")
        val mix = Map("a" -> fa, "b" -> fb)
        val exact = SplitOps.hashMixture(df, "g", "id", mix)
          .select("id").as[Long].collect().sorted.toSeq
        val dist = SplitOps.hashMixtureDistributed(df, "g", "id", mix)
          .select("id").as[Long].collect().sorted.toSeq
        assert(dist === exact)
    }
  }

  test("tokenBudgetMixture: kept set grows monotonically with budget " +
       "(prefix property) and never exceeds budget before the straddler") {
    forAllSeeded(Gen.zip(Gen.choose(5L, 200L), Gen.choose(5L, 200L)),
        n = 6) { case (b1: Long, b2: Long) =>
        val df = (0 until 90).map(i =>
          (i.toLong, if (i % 2 == 0) "a" else "b", (i % 7 + 1).toLong))
          .toDF("id", "g", "tok")
        def kept(b: Long) = SplitOps.tokenBudgetMixture(df, "g", "id",
          col("tok"), Map.empty, defaultBudget = b)
          .select("id").as[Long].collect().toSet
        val (lo, hi) = (math.min(b1, b2), math.max(b1, b2))
        val (kl, kh) = (kept(lo), kept(hi))
        assert(kl.subsetOf(kh),
          s"budget $lo kept ${kl -- kh} that budget $hi dropped")
        // greedy rule: total-before-last-doc < budget per group
        val rows = SplitOps.tokenBudgetMixture(df, "g", "id", col("tok"),
            Map.empty, defaultBudget = lo)
          .groupBy("g").agg(sum(col("tok")).as("t"), max(col("tok")).as("m"))
          .collect()
        rows.foreach { r =>
          assert(r.getLong(1) - r.getLong(2) < lo,
            s"group ${r.getString(0)}: kept past the straddler")
        }
    }
  }

  test("canonicalPerCluster: keeper is a member with the cluster-max " +
       "score, and cluster sizes are preserved") {
    forAllSeeded(Gen.choose(2, 9), n = 6) { mod: Int =>
      val df = (0 until 80).map(i =>
        (i.toLong, (i % mod).toLong, ((i * 31) % 13).toLong))
        .toDF("id", "comp", "score")
      val out = DedupOps.canonicalPerCluster(df, "id", "comp", "score")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val members = df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._2)
      assert(out.keySet === members.keySet)
      members.foreach { case (comp, ms) =>
        val (keepId, best, n) = out(comp)
        assert(n === ms.length)
        assert(best === ms.map(_._3).max)
        val ties = ms.filter(_._3 == best).map(_._1)
        assert(keepId === ties.min, s"comp $comp tie-break")
      }
    }
  }

  test("removeDupSpans: n_after tokens reconstruct clean exactly; " +
       "never grows; untouched docs round-trip verbatim") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 120)
    val out = TextOps.removeDupSpans(docs, "doc_id", "text", n = 8)
    val rows = out.collect()
    rows.foreach { r =>
      val (nb, na, clean) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(na <= nb)
      val cleanToks =
        if (clean.isEmpty) 0 else clean.split("\\s+").count(_.nonEmpty)
      assert(cleanToks === na, s"doc ${r.getLong(0)}")
    }
    val untouched = out.filter(col("n_after") === col("n_before"))
      .join(docs, Seq("doc_id"))
      .filter(concat_ws(" ",
        graft.ops.TextOps.tokens(col("text"))) =!= col("clean"))
    assert(untouched.isEmpty)
  }

  test("countMinSketch never under-counts and respects the eps bound") {
    val df = (0 until 3000).map(i => (i % 37).toLong).toDF("k")
    val cms = df.stat.countMinSketch(col("k"), eps = 0.01,
      confidence = 0.99, seed = 42)
    val exact = df.groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      assert(est >= n, s"CMS under-counted $k: $est < $n")
      assert(est <= n + math.ceil(0.01 * 3000).toLong,
        s"CMS over-counted $k beyond eps*N: $est vs $n")
    }
  }
}
