package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{SearchOps, TextOps}

/** Round-9 operator units: BPE merge-pair training statistics. The
  * oracled q190 carries the DuckDB replay; these pin the hand-checkable
  * semantics — frequency weighting, the lexicographic tie-break,
  * merged symbols feeding later rounds, leftmost-greedy run handling,
  * and early exhaustion. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def merges(vocab: Seq[(String, Long)], k: Int) =
    TextOps.bpeMerges(vocab.toDF("w", "f"), "w", "f", k)
      .orderBy(col("round"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))

  test("bpeMerges: weighting, lexicographic tie-break, merged symbols " +
       "in later rounds, early exhaustion before k") {
    // round 1: (a,a)=2·2=4 vs (a,b)=2·1+3·1=5 → (a,b)
    // round 2: aaab→[a,a,ab]: (a,a)=2, (a,ab)=2 — tie → (a,a) (lex)
    // round 3: aaab→[aa,ab]: (aa,ab)=2
    // round 4: all words single-symbol → exhausted (3 rows, not 6)
    val got = merges(Seq(("aaab", 2L), ("ab", 3L)), k = 6)
    assert(got === Array(
      (1L, "a", "b", 5L),
      (2L, "a", "a", 2L),
      (3L, "aa", "ab", 2L)))
  }

  test("bpeMerges: run counts include overlaps, application is " +
       "leftmost-greedy non-overlapping") {
    // 'aaaa': round 1 counts (a,a) at every adjacency (3 — the
    // standard BPE count), but the merge applies non-overlapping
    // leftmost → [aa, aa], so round 2 sees exactly one (aa,aa) pair
    val got = merges(Seq(("aaaa", 1L)), k = 3)
    assert(got === Array(
      (1L, "a", "a", 3L),
      (2L, "aa", "aa", 1L)))
  }

  test("bpeMerges: odd run leaves the tail symbol unmerged") {
    // 'aaa' → [aa, a]; round 2 merges (aa, a) — order of the pair
    // preserves sequence position, not lexicographic symbol order
    val got = merges(Seq(("aaa", 1L)), k = 2)
    assert(got === Array(
      (1L, "a", "a", 2L),
      (2L, "aa", "a", 1L)))
  }

  test("bpeEncode applies merges in training order; symbols " +
       "concatenate back to the word") {
    val words = Seq("servers", "verse", "x").toDF("w")
    val got = TextOps.bpeEncode(words, "w",
        Seq(("e", "r"), ("er", "s")))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // servers: s,e,r,v,e,r,s → (e,r) → s,er,v,er,s → (er,s) → s,er,v,ers
    assert(got("servers") === (("s er v ers", 4L)))
    // verse: v,e,r,s,e → (e,r) → v,er,s,e → (er,s) → v,ers,e
    assert(got("verse") === (("v ers e", 3L)))
    assert(got("x") === (("x", 1L)))
    // reconstruction: symbols concatenate back to the original word
    got.foreach { case (w, (enc, _)) =>
      assert(enc.replace(" ", "") === w)
    }
  }

  test("rrfFuse: integer micro-unit contributions, absent-list items " +
       "score from present lists only") {
    val l1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val l2 = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    val got = SearchOps.rrfFuse(Seq(l1, l2), "id", "rank", k0 = 60)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    def c(rank: Int) = math.round(1e9 / (60 + rank))
    assert(got === Map(
      10L -> ((2L, c(1) + c(2))),
      20L -> ((2L, c(2) + c(1))),
      30L -> ((1L, c(3)))))
    // symmetric ranks fuse identically — order-free by construction
    assert(got(10L)._2 === got(20L)._2)
  }

  test("q191 composition invariants: components partition the corpus, " +
       "kept member is a member, best_score is its group's max") {
    val got = SparkEntry.queries("q191_semdedup_canonical")(
      spark, "/root/testdata/sf0.001")
    val rows = got.collect()
    // groups partition the 500 vectors
    assert(rows.map(_.getLong(3)).sum === 500L)
    // the kept member leads its own component label ordering: comp is
    // the group's minimum id, so keep_id >= comp, and a singleton
    // keeps itself
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0))
      if (r.getLong(3) == 1L) assert(r.getLong(1) === r.getLong(0))
    }
  }

  test("bpeMerges: multi-char symbols never merge mid-symbol") {
    // after (l,o)→lo, word 'lol' = [lo, l]; a naive string scan could
    // find 'o l' inside 'lo l' — the boundary encoding must not
    val got = merges(Seq(("lol", 4L), ("lo", 1L), ("ol", 1L)), k = 2)
    // round 1: (l,o)=4+1=5, (o,l)=4+1=5 — tie → (l,o)
    assert(got(0) === ((1L, "l", "o", 5L)))
    // round 2 candidates: 'lol'→[lo,l] gives (lo,l)=4; 'ol' gives
    // (o,l)=1 — the 'o l' inside [lo, l] must NOT count
    assert(got(1) === ((2L, "lo", "l", 4L)))
  }
}
