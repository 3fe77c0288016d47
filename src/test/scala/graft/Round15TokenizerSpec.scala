package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Unigram-LM (SentencePiece) tokenizer (round 15 batch B): the
  * Viterbi fold against hand-computed DP tables and a from-scratch
  * Scala replay over the real corpus vocabulary, the pinned
  * longest-piece tie rule, coverage/reconstruction invariants, and
  * the EM training loop's count bookkeeping. */
class Round15TokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** From-scratch scalar Viterbi with the operator's pinned
    * semantics: dp[j] = min over l of dp[j-l] + cost, ties to the
    * LONGEST piece; backward walk reconstructs the split. */
  private def refViterbi(w: String, costs: Map[String, Long],
                         maxL: Int): (Seq[String], Long) = {
    val n = w.length
    val inf = Long.MaxValue / 4
    val dp = Array.fill(n + 1)(inf)
    val bl = Array.fill(n + 1)(0)
    dp(0) = 0L
    for (j <- 1 to n) {
      for (l <- maxL to 1 by -1 if l <= j) {
        costs.get(w.substring(j - l, j)).foreach { c =>
          if (dp(j - l) != inf && dp(j - l) + c < dp(j)) {
            dp(j) = dp(j - l) + c
            bl(j) = l
          }
        }
      }
    }
    var pos = n
    val ps = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) {
      ps.prepend(w.substring(pos - bl(pos), pos))
      pos -= bl(pos)
    }
    (ps.toSeq, dp(n))
  }

  private def viterbiOf(words: Seq[String], costs: Seq[(String, Long)],
                        maxL: Int): Map[String, (Seq[String], Long)] =
    TextOps.unigramViterbi(words.toDF("w"), "w", costs, maxL)
      .select(col("w"), col("pieces"), col("score_micro"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](1).toSeq, r.getLong(2)))
      .toMap

  test("viterbi reproduces a hand-computed DP table") {
    // abab: dp = a(100) -> ab(250) -> ab+a(350) -> ab+ab(500); the
    // greedy leftmost 'aba'(500)+b path and the char path both lose
    val costs = Seq("a" -> 100L, "b" -> 200L, "ab" -> 250L,
      "ba" -> 400L, "aba" -> 500L)
    val got = viterbiOf(Seq("abab"), costs, maxL = 3)("abab")
    assert(got === (Seq("ab", "ab"), 500L))
  }

  test("equal-score candidates pin to the LONGEST piece (the tie rule " +
       "the oracle mirrors with ORDER BY s, bl DESC)") {
    // 'aa' as one piece (200) ties 'a'+'a' (100+100): bl=2 must win
    val costs = Seq("a" -> 100L, "aa" -> 200L)
    val got = viterbiOf(Seq("aa", "aaa"), costs, maxL = 4)
    assert(got("aa") === (Seq("aa"), 200L))
    // aaa: dp[3] via 'aa' from dp[1] (300) ties 'a' from dp[2] (300):
    // longest-last-piece wins -> a + aa
    assert(got("aaa") === (Seq("a", "aa"), 300L))
  }

  test("unseen substrings never enter a split; single-char coverage " +
       "keeps every word segmentable") {
    val costs = Seq("x" -> 900L, "y" -> 900L, "z" -> 900L)
    val got = viterbiOf(Seq("xyzzy"), costs, maxL = 4)("xyzzy")
    assert(got === (Seq("x", "y", "z", "z", "y"), 4500L))
  }

  test("the column fold agrees with the scalar replay on every real " +
       "corpus vocabulary word under the trained costs") {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .where(col("w").rlike("^[a-z]{2,10}$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val costs = TextOps.unigramTrainCosts(vocab, "w", "f",
      rounds = 2, maxPieceLen = 4, topMulti = 64)
    val cm = costs.toMap
    val words = vocab.select("w").collect().map(_.getString(0)).toSeq
    val got = viterbiOf(words, costs, maxL = 4)
    words.foreach { w =>
      val (refPs, refS) = refViterbi(w, cm, 4)
      assert(got(w) === ((refPs, refS)), s"word $w")
      // reconstruction: the split concatenates back to the word
      assert(got(w)._1.mkString("") === w, s"word $w")
    }
  }

  test("seed inventory: all single characters kept, multi pieces cut " +
       "at topMulti by (count DESC, piece ASC)") {
    val words = Seq(("banana", 3L), ("bandana", 2L)).toDF("w", "f")
    val seed = TextOps.unigramSeedPieces(words, "w", "f",
        maxPieceLen = 3, topMulti = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // singles: every char, occurrence-weighted (banana: 3 a's x3 ...)
    assert(seed("a") === 3 * 3 + 3 * 2)  // 3 in banana, 3 in bandana
    assert(seed("b") === 3 + 2)
    assert(seed("n") === 2 * 3 + 2 * 2)
    assert(seed("d") === 2)
    // multis: top-4 of the length-2..3 substrings — an(10), then the
    // 8-count tie ana/na (both fit), then the 5-count tie ba/ban cut
    // at one slot: piece ASC keeps "ba"
    val multis = seed.keySet.filter(_.length >= 2)
    assert(multis === Set("an", "ana", "na", "ba"))
    assert(seed("an") === 10L && seed("ana") === 8L)
  }

  test("EM bookkeeping: every round reports the full inventory, " +
       "usage counts conserve the corpus piece mass, costs positive") {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .where(col("w").rlike("^[a-z]{2,10}$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val train = TextOps.unigramTrain(vocab, "w", "f", rounds = 2,
      maxPieceLen = 4, topMulti = 64).collect()
    val inv = train.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val r2 = train.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    assert(inv === r2, "inventory is fixed across rounds")
    assert(train.forall(_.getLong(3) > 0L), "add-one costs stay positive")
    // the round-2 usage mass equals sum over words of f * n_pieces
    // under the round-1 costs (the E-step the M-step counted)
    val costs1 = train.filter(_.getLong(0) == 1L)
      .map(r => r.getString(1) -> r.getLong(3)).toSeq
    val mass = TextOps.unigramViterbi(vocab, "w", costs1, 4)
      .agg(sum(col("f") * col("n_pieces"))).head().getLong(0)
    val r2mass = train.filter(_.getLong(0) == 2L).map(_.getLong(2)).sum
    assert(r2mass === mass)
  }

  test("training compresses: frequent multi-char pieces beat the " +
       "all-single-chars segmentation on the real vocabulary") {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(TextOps.tokens(lower(col("text")))).as("w"))
      .where(col("w").rlike("^[a-z]{2,10}$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val costs = TextOps.unigramTrainCosts(vocab, "w", "f",
      rounds = 2, maxPieceLen = 4, topMulti = 64)
    val enc = TextOps.unigramViterbi(vocab, "w", costs, 4)
    val (pieces, chars) = enc
      .agg(sum(col("f") * col("n_pieces")),
        sum(col("f") * length(col("w"))))
      .head() match { case r => (r.getLong(0), r.getLong(1)) }
    assert(pieces < chars,
      s"multi-char pieces must compress: $pieces pieces vs $chars chars")
  }
}
