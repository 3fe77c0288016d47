package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, GraphOps, RelOps}

/** Round-5 operators: range-lookup join (bucket-edge soundness), fuzzy
  * join (deletion-neighborhood completeness vs brute force), PageRank
  * (hand-computed fixture + invariants). The registered queries q95-q99
  * carry the oracle checks; these specs pin the properties an oracle on
  * one fixture can't — edge cases constructed to sit exactly on the
  * decision boundaries.
  */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- //
  // rangeLookupJoin
  // ---------------------------------------------------------------- //

  test("rangeLookupJoin matches the naive non-equi join exactly, " +
       "including points ON the lo/hi boundaries and ranges spanning " +
       "several buckets") {
    val points = Seq(0L, 7L, 8L, 15L, 16L, 17L, 31L, 32L, 100L)
      .toDF("p")
    // widths 0 (degenerate single-point range), exactly one bucket,
    // spanning two and four buckets; boundaries on multiples of the
    // bucket width
    val ranges = Seq((0L, 0L, "a"), (7L, 8L, "b"), (15L, 16L, "c"),
      (8L, 31L, "d"), (0L, 63L, "e"), (33L, 40L, "f"))
      .toDF("lo", "hi", "tag")
    val got = RelOps.rangeLookupJoin(points, ranges, "p", "lo", "hi",
        bucketWidth = 8L)
      .select("p", "tag").as[(Long, String)].collect().toSet
    val want = points.crossJoin(ranges)
      .filter(col("p").between(col("lo"), col("hi")))
      .select("p", "tag").as[(Long, String)].collect().toSet
    assert(got === want)
    assert(want.contains((0L, "a")) && want.contains((16L, "c")),
      "fixture must exercise boundary hits")
  }

  test("rangeLookupJoin emits each (point, range) match once even when " +
       "the range spans many buckets (a point lives in one bucket)") {
    val points = Seq(50L).toDF("p")
    val ranges = Seq((0L, 100L, "wide")).toDF("lo", "hi", "tag")
    val got = RelOps.rangeLookupJoin(points, ranges, "p", "lo", "hi", 4L)
    assert(got.count() === 1L)
  }

  // ---------------------------------------------------------------- //
  // editDistancePairs
  // ---------------------------------------------------------------- //

  test("editDistancePairs equals brute-force levenshtein<=1 over a " +
       "vocabulary covering substitution, insertion, deletion, " +
       "transposition (excluded, distance 2) and unrelated strings") {
    val vocab = Seq("cat", "bat", "cart", "ca", "act", "dog", "dogs",
      "", "a").toDF("s")
    val got = DedupOps.editDistancePairs(vocab, "s")
      .select("s_a", "s_b").as[(String, String)].collect().toSet
    val want = vocab.select(col("s").as("s_a"))
      .crossJoin(vocab.select(col("s").as("s_b")))
      .filter(col("s_a") < col("s_b") &&
        levenshtein(col("s_a"), col("s_b")) <= 1)
      .as[(String, String)].collect().toSet
    assert(got === want)
    // the boundary cases actually bind: sub, del, ins present;
    // transposition (act/cat, distance 2) absent
    assert(want.contains(("bat", "cat")) && want.contains(("ca", "cat")) &&
      want.contains(("dog", "dogs")) && want.contains(("", "a")))
    assert(!want.contains(("act", "cat")),
      "transpositions are distance 2 and must be verified away")
  }

  test("editDistancePairs scores a pair once even when it shares " +
       "several deletion variants") {
    // "aa" and "ab": variants of "aa" = {aa, a}; of "ab" = {ab, b, a} —
    // they share only "a"... use "aab"/"ab" which share "ab" and "a"+…
    val vocab = Seq("aab", "ab").toDF("s")
    val got = DedupOps.editDistancePairs(vocab, "s")
    assert(got.count() === 1L)
  }

  test("editDistancePairs maxDist=2 equals brute-force levenshtein<=2 " +
       "— transpositions and double edits now in, distance 3 out, " +
       "short strings safe, maxDist 3 rejected") {
    val vocab = Seq("cat", "act", "bar", "bat", "cart", "carts", "ca",
      "c", "", "dog", "xylo").toDF("s")
    val got = DedupOps.editDistancePairs(vocab, "s", maxDist = 2)
      .select("s_a", "s_b").as[(String, String)].collect().toSet
    val want = vocab.select(col("s").as("s_a"))
      .crossJoin(vocab.select(col("s").as("s_b")))
      .filter(col("s_a") < col("s_b") &&
        levenshtein(col("s_a"), col("s_b")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got === want)
    // the radius-2 cases bind: transposition (act/cat), double-ins
    // (carts/cat), len<2 strings survive the delete-two guard
    // ("" and "ca"); dog/cat (three substitutions) must be out
    assert(want.contains(("act", "cat")) && want.contains(("carts", "cat"))
      && want.contains(("", "ca")) && !want.contains(("cat", "dog"))
      && !want.contains(("dog", "cat")))
    intercept[IllegalArgumentException] {
      DedupOps.editDistancePairs(vocab, "s", maxDist = 3)
    }
  }

  // ---------------------------------------------------------------- //
  // pageRank
  // ---------------------------------------------------------------- //

  test("pageRank on a hand-computed 3-node chain matches the closed " +
       "form (dangling mass not redistributed)") {
    // graph: 1 -> 2, 2 -> 3.  N = 3, d = 0.85, base = 0.15/3 = 0.05
    // r0 = 1/3 each
    // r1: n1 = 0.05; n2 = 0.05 + .85*(1/3); n3 = 0.05 + .85*(1/3)
    // r2: n1 = 0.05; n2 = 0.05 + .85*0.05;  n3 = 0.05 + .85*(0.05+.85/3)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, iterations = 2, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val third = 1.0 / 3.0
    assert(math.abs(r(1L) - 0.05) < 1e-12)
    assert(math.abs(r(2L) - (0.05 + 0.85 * 0.05)) < 1e-12)
    assert(math.abs(r(3L) - (0.05 + 0.85 * (0.05 + 0.85 * third))) < 1e-12)
  }

  test("pageRank invariants on the q97 graph: every node surfaces, " +
       "ranks positive, total mass <= 1 (dangling leakage only)") {
    val dir = "/root/testdata/sf0.001"
    val edges = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("src"), (col("event_id") % 150).as("dst"))
    val nNodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst"))).distinct().count()
    val r = GraphOps.pageRank(edges, iterations = 3, damping = 0.85)
    assert(r.count() === nNodes)
    val (mn, total) = r.agg(min("rank"), sum("rank"))
      .as[(Double, Double)].head()
    assert(mn > 0.0, "every node keeps at least the teleport mass")
    assert(total <= 1.0 + 1e-9, "mass is only ever lost to dangling nodes")
  }
}
