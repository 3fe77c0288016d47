package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EvalOps, TextOps}

/** SymSpell edit-distance join, Heaps'-law fit, and the F1-optimal
  * threshold sweep (round 15 batch D): blocking completeness against
  * a brute-force n² replay, exact-slope fixtures for the growth fit,
  * and hand-computed confusion tables for the sweep. */
class Round15FuzzyFitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Classic scalar Levenshtein — the independent verify the blocking
    * must never lose a pair against. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("symspell join finds exactly the hand-checked <=2 pairs on a " +
       "crafted vocabulary") {
    val words = Seq(("cat", 5L), ("cut", 3L), ("cart", 2L),
      ("dog", 7L), ("dodge", 1L), ("at", 4L)).toDF("w", "f")
    val got = TextOps.symspellPairs(words, "w", "f")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    assert(got === Set(
      ("at", "cat", 1L), ("at", "cut", 2L), ("at", "cart", 2L),
      ("cat", "cut", 1L), ("cart", "cat", 1L), ("cart", "cut", 2L),
      ("dodge", "dog", 2L)))
  }

  test("blocking completeness: the delete-neighborhood join equals " +
       "the brute-force n-squared scan on the real vocabulary") {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .where(col("w").rlike("^[a-z]{2,10}$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val words = vocab.select("w").collect().map(_.getString(0))
    val want = (for {
      a <- words; b <- words if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    val got = TextOps.symspellPairs(vocab, "w", "f")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    assert(got === want)
  }

  test("heaps fit is exactly 1 when every document mints only new " +
       "types, exactly 0 when none do") {
    // 64 docs, each one UNIQUE token -> V = T at every bin cut
    val fresh = (0 until 64).map(i => (i.toLong, s"tok$i"))
      .toDF("doc_id", "text")
    val f = TextOps.heapsLaw(fresh, "doc_id", "text", bins = 8).head()
    assert(f.getDouble(3) === 1.0)
    // 64 identical docs -> V constant -> zero slope
    val flat = (0 until 64).map(i => (i.toLong, "same same"))
      .toDF("doc_id", "text")
    val g = TextOps.heapsLaw(flat, "doc_id", "text", bins = 8).head()
    assert(g.getDouble(3) === 0.0)
    assert(g.getLong(2) === 1L) // one type
  }

  test("heaps fit on the real corpus: vocab equals the distinct type " +
       "count, beta lands in the saturating-corpus band [0, 1)") {
    val docs = Tables.load(spark, dir, "documents")
    val h = TextOps.heapsLaw(docs, "doc_id", "text", bins = 64).head()
    val types = docs.select(explode(TextOps.tokens(lower(col("text"))))
      .as("w")).distinct().count()
    val toks = docs.agg(sum(TextOps.tokenCount(lower(col("text")))))
      .head().getLong(0)
    assert(h.getLong(2) === types)
    assert(h.getLong(1) === toks)
    assert(h.getDouble(3) >= 0.0 && h.getDouble(3) < 1.0)
  }

  test("f1 sweep reproduces a hand-computed confusion table and pins " +
       "the best row by (f1 DESC, thr ASC)") {
    // scores: 3,3,2,2,1 labels: +,+,+,-,-  P=3
    // thr=3: tp2 fp0 fn1 -> f1 = 4/5 = 800000
    // thr=2: tp3 fp1 fn0 -> f1 = 6/7 = 857142
    // thr=1: tp3 fp2 fn0 -> f1 = 6/8 = 750000
    val df = Seq((3L, true), (3L, true), (2L, true), (2L, false),
      (1L, false)).toDF("s", "y")
    val got = EvalOps.f1Threshold(df, "s", "y")
      .orderBy(col("thr"))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(8), r.getBoolean(9)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 0L, 750000L, false),
      (2L, 3L, 1L, 0L, 857142L, true),
      (3L, 2L, 0L, 1L, 800000L, false)))
  }

  test("f1 sweep invariants on the real events table: recall 1.0 at " +
       "the lowest cut, monotone tp, exactly one best row") {
    val sweep = SparkEntry.queries("q367_f1_threshold")(spark, dir)
      .collect()
    assert(sweep.count(_.getBoolean(9)) === 1)
    val byThr = sweep.sortBy(_.getLong(0))
    assert(byThr.head.getLong(7) === 1000000L) // rec_ppm at min thr
    // suffix tp non-increasing as thr rises
    assert(byThr.map(_.getLong(3)).sliding(2)
      .forall { case Array(a, b) => a >= b })
  }
}
