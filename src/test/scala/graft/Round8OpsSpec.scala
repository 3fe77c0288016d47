package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, SplitOps, TextOps}

/** Round-8 operator units: canonical keep-best selection per duplicate
  * cluster and the token-budget mixture. The oracled q180/q181 carry
  * the DuckDB hash checks; these pin the argmax tie-break, the
  * distributed-equals-naive prefix-sum equivalence, and the plan shape
  * (one aggregate / no per-group serialization). */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("canonicalPerCluster keeps highest score, ties break to min id") {
    val labeled = Seq(
      (1L, 10L, 5L), (2L, 10L, 9L), (3L, 10L, 9L), // tie at 9 → id 2
      (4L, 40L, 7L),                                // singleton
      (5L, 50L, 1L), (6L, 50L, 2L)
    ).toDF("doc_id", "comp", "score")
    val got = DedupOps.canonicalPerCluster(labeled, "doc_id", "comp",
        "score")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      10L -> ((2L, 9L, 3L)),
      40L -> ((4L, 7L, 1L)),
      50L -> ((6L, 2L, 2L))))
  }

  test("canonicalPerCluster is ONE hash aggregate — no window, no join") {
    val labeled = Seq((1L, 1L, 1L)).toDF("doc_id", "comp", "score")
    val plan = DedupOps.canonicalPerCluster(labeled, "doc_id", "comp",
      "score").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("tokenBudgetMixture == naive per-group prefix window, bit-exact") {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    val budgets = Map("src0" -> 1000L, "src1" -> 600L)
    val got = SplitOps.tokenBudgetMixture(docs, "source", "doc_id",
        col("n_tokens"), budgets, defaultBudget = 300L, salt = "mix8")
      .select(col("doc_id")).as[Long].collect().toSet
    // naive single-window formulation (the oracle's shape)
    val h = md5(concat(col("doc_id").cast("string"), lit("mix8")))
    val budget = when(col("source") === "src0", 1000L)
      .when(col("source") === "src1", 600L).otherwise(300L)
    val naive = docs.withColumn("_h", h)
      .withColumn("_before", coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col("source")).orderBy(col("_h"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("_before") < budget)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("tokenBudgetMixture keeps null-group rows under defaultBudget " +
       "and accepts a non-string group column") {
    // null groups: inner-joining on the raw column would silently drop
    // them; the internal coalesced string key must route them through
    // defaultBudget exactly like a named group with no budgets entry
    val docs = Seq(
      (1L, Option("a"), 10L), (2L, Option("a"), 10L),
      (3L, None: Option[String], 10L), (4L, None: Option[String], 10L),
      (5L, None: Option[String], 10L)
    ).toDF("id", "g", "tok")
    val kept = SplitOps.tokenBudgetMixture(docs, "g", "id", col("tok"),
        Map("a" -> 100L), defaultBudget = 25L, salt = "nulls")
      .select(col("id")).as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(kept), s"named group lost rows: $kept")
    val nullKept = kept.intersect(Set(3L, 4L, 5L))
    // 25-token budget over 10-token docs: greedy prefix keeps 3 (the
    // straddler rule — tokens_before < budget admits 0,10,20)
    assert(nullKept.size === 3, s"null-group rows mishandled: $kept")
    // integer group column: budgets keyed by the group's string form
    val intG = Seq((1L, 7, 10L), (2L, 7, 10L), (3L, 8, 10L))
      .toDF("id", "g", "tok")
    val keptInt = SplitOps.tokenBudgetMixture(intG, "g", "id", col("tok"),
        Map("7" -> 100L), defaultBudget = 5L, salt = "ints")
      .select(col("id")).as[Long].collect().toSet
    assert(keptInt.intersect(Set(1L, 2L)) === Set(1L, 2L))
    assert(keptInt.intersect(Set(3L)).size === 1) // straddler under 5
  }

  test("tokenBudgetMixture greedy-prefix invariants per source") {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    val kept = SplitOps.tokenBudgetMixture(docs, "source", "doc_id",
        col("n_tokens"), Map.empty, defaultBudget = 300L, salt = "mix8")
    // every source is cut: kept tokens land in [budget, budget + maxdoc)
    val perSrc = kept.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(perSrc.size == 20)
    perSrc.foreach { case (src, tok) =>
      assert(tok >= 300L, s"$src under budget: $tok — greedy prefix " +
        "must cover the budget (straddler kept)")
    }
    val maxDoc = docs.agg(max(col("n_tokens"))).as[Long].head()
    perSrc.foreach { case (src, tok) =>
      assert(tok < 300L + maxDoc, s"$src overshot by a full doc: $tok")
    }
  }

  test("dupSpanStats flags only cross-doc repeated n-grams") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),   // shares the 8-gram a..h with doc 2
      (2L, "a b c d e f g h z"),
      (3L, "p q r s t u v w x y"), // unique spans only
      (4L, "x x x x x x x x")      // self-repetition but single doc
    ).toDF("doc_id", "text")
    val got = TextOps.dupSpanStats(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2)))).toMap
    // docs 1 and 2 each have 2 spans, 1 duplicated (the shared prefix);
    // docs 3 and 4 have no cross-doc span and drop out of the report
    assert(got === Map(1L -> ((2L, 1L)), 2L -> ((2L, 1L))))
  }

  test("dupSpanStats ignores docs shorter than the span") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    assert(TextOps.dupSpanStats(docs, "doc_id", "text", n = 8).isEmpty)
  }

  test("minhashSigExpr (per-row, stream-safe) == minhashSignatureArr " +
       "(aggregate index path), bit-for-bit") {
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 100)
    val agg = DedupOps.minhashSignatureArr(docs, "doc_id", "text", k = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expr = docs.select(col("doc_id"),
        DedupOps.minhashSigExpr(col("text"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(agg.keySet === expr.keySet)
    agg.foreach { case (id, sig) => assert(sig === expr(id), s"doc $id") }
  }

  test("removeDupSpans drops exactly the covered tokens, in-order rebuild") {
    val docs = Seq(
      (1L, "a b c d e f g h tail1 unique1"),
      (2L, "head2 a b c d e f g h tail2"),
      (3L, "solo text with no repeats at all ok")
    ).toDF("doc_id", "text")
    val got = TextOps.removeDupSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the shared 8-gram a..h covers those tokens in docs 1 and 2; the
    // surrounding tokens survive in order; doc 3 is untouched
    assert(got(1L) === ((10L, 2L, "tail1 unique1")))
    assert(got(2L) === ((10L, 2L, "head2 tail2")))
    assert(got(3L) === ((8L, 8L,
      "solo text with no repeats at all ok")))
  }

  test("removeDupSpans: overlapping dup spans cover their union; a " +
       "fully-covered doc rebuilds to empty") {
    val docs = Seq(
      (1L, "a b c d e f g h i"), // both 8-gram spans dup'd → all covered
      (2L, "a b c d e f g h i"),
      (3L, "z")
    ).toDF("doc_id", "text")
    val got = TextOps.removeDupSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((9L, 0L, "")))
    assert(got(2L) === ((9L, 0L, "")))
    assert(got(3L) === ((1L, 1L, "z")))
  }

  test("temperature budgets: floor(20*sqrt(tokens)) cuts every source " +
       "below its full mass") {
    val got = SparkEntry.queries("q183_temperature_mix")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 20)
    got.foreach { case (src, (budget, _, kept)) =>
      assert(kept >= budget, s"$src: kept $kept under budget $budget")
      // sqrt flattening: budget ~ 20*sqrt(~1400) ~ 750 < source mass
      assert(budget < 1700L && budget > 600L, s"$src budget $budget")
    }
  }

  test("q182/q184 plans: shingle-keyed equi-joins only — no cartesian, " +
       "no broadcast nested loop") {
    Seq("q182_dup_spans", "q184_span_removal").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q: $plan")
    }
  }

  test("tokenBudgetMixture start-offset table joins broadcast; windows " +
       "partition on (group, bucket)") {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("n_tokens", TextOps.tokenCount(col("text")).cast("long"))
    val plan = SplitOps.tokenBudgetMixture(docs, "source", "doc_id",
        col("n_tokens"), Map.empty, defaultBudget = 300L, salt = "mix8")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the rank window must include the bucket column — a window keyed
    // on the group alone is the one-task-per-group shape this op exists
    // to avoid (the group key is the internal null-coalesced `_g`)
    assert("windowspecdefinition\\(_g#\\d+, _mb#\\d+".r
      .findFirstIn(plan).isDefined, plan)
  }
}
