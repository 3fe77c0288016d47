package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EvalOps, SketchOps, TextOps}

/** The md5-replayable sketch family (SketchOps), interpolated
  * Kneser–Ney (TextOps), and the resampling/conformal evaluators
  * (EvalOps) added late in round 13: hand-computed fixtures,
  * partition/duplicate invariance, and the algebraic identities the
  * operators rely on. */
class Round13SketchSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------- Count-Min ----------------

  test("countMin: estimates are partition-invariant and NEVER " +
       "under-count (the CMS one-sided guarantee)") {
    val items = (1 to 40).flatMap(i => Seq.fill(i % 5 + 1)(s"w$i"))
      .toDF("item")
    val probes = items.select(col("item")).distinct()
    def run(df: org.apache.spark.sql.DataFrame) = {
      val c = SketchOps.countMinCounters(df, "item", 3, 16)
      SketchOps.countMinEstimate(c, probes, "item", 3, 16)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(1)))
    }
    val a = run(items.repartition(1))
    val b = run(items.repartition(7))
    assert(a.toSeq === b.toSeq)
    val truth = items.groupBy("item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { case (item, est) => assert(est >= truth(item),
      s"CMS under-counted $item: $est < ${truth(item)}") }
  }

  test("countMin: the counter matrix equals the independently " +
       "computed cell sums, and an unseen probe with empty cells " +
       "estimates 0") {
    val items = Seq("a", "a", "b").toDF("item")
    val counters = SketchOps.countMinCounters(items, "item", 2, 8)
    // independent replay of the cell grid from the same md5 rule
    val manual = items
      .select(explode(array((0 until 2).map { r =>
        struct(lit(r.toLong).as("row"),
          pmod(conv(substring(md5(concat(lit(s"cms$r|"), col("item"))),
            1, 8), 16, 10).cast("long"), lit(8L)).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("row", "bucket").collect().toSeq
    assert(counters.orderBy("row", "bucket").collect().toSeq === manual)
    // a probe whose cells happen to be empty must coalesce to 0, not
    // drop or null (8 buckets, 3 distinct items: find one)
    val unseen = (1 to 50).map(i => s"zz$i").toDF("item")
    val ests = SketchOps.countMinEstimate(counters, unseen, "item", 2, 8)
      .collect().map(_.getLong(1))
    assert(ests.length === 50 && ests.forall(_ >= 0L) &&
      ests.contains(0L))
  }

  // ---------------- AMS F2 ----------------

  test("amsF2: a single repeated item estimates F2 EXACTLY for any " +
       "copy count (X_c = ±n ⇒ X_c² = n²), and sums are " +
       "partition-invariant") {
    val df = Seq.fill(13)("only").toDF("item")
    val r1 = SketchOps.amsF2Sketch(df.repartition(1), "item", 4)
      .collect().head
    val r7 = SketchOps.amsF2Sketch(df.repartition(5), "item", 4)
      .collect().head
    assert(r1.getLong(1) === 169L && r7.getLong(1) === 169L)
    assert((0 until 4).forall(c => math.abs(
      r1.getLong(r1.fieldIndex(s"x$c"))) === 13L))
  }

  // ---------------- Flajolet–Martin ----------------

  test("fmCardinality: duplicate- and partition-invariant (max of a " +
       "content hash), ρ = binary length of the lowest-set-bit " +
       "isolate") {
    val distinctItems = (1 to 200).map(i => s"item$i")
    val dups = (distinctItems ++ distinctItems ++ distinctItems)
      .toDF("item")
    def sk(df: org.apache.spark.sql.DataFrame) =
      SketchOps.fmCardinality(df, "item", 16)
        .select("bucket", "r_max", "sum_r", "ll_est_micro")
        .orderBy("bucket").collect().toSeq
    val a = sk(dups.repartition(1))
    assert(a === sk(dups.repartition(9)))
    assert(a === sk(distinctItems.toDF("item")))
    // hand check ρ on one item: recompute v and the expected rank
    val row = spark.range(1).select(
      conv(substring(md5(lit("fm|item1")), 3, 14), 16, 10)
        .cast("long").as("v"))
      .select(col("v"), length(bin(col("v").bitwiseAND(-col("v"))))
        .as("r")).collect().head
    val v = row.getLong(0)
    assert(row.getInt(1) === java.lang.Long.numberOfTrailingZeros(v) + 1)
  }

  // ---------------- Kneser–Ney ----------------

  test("knBigramLmScore: interpolated KN probabilities sum to " +
       "EXACTLY 1 over the vocabulary for seen and unseen contexts " +
       "(the +1-smoothed continuation closes the telescoping mass)") {
    val train = Seq((0L, "a b a b a c b c"), (1L, "c a c a b"))
      .toDF("doc_id", "text")
    // score a held doc that is every (context, vocab-word) bigram so
    // the per-context rows enumerate the full conditional
    val vocab = Seq("a", "b", "c")
    val heldText = (vocab :+ "zz").flatMap(a => vocab.map(b => s"$a $b"))
    // one doc per context: "x v1 x v2 x v3" would create spurious
    // (v, x) bigrams — instead each (a,b) pair becomes its own doc
    val held = heldText.zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val scored = TextOps.knBigramLmScore(train, held, "doc_id", "text")
      .collect()
    // reconstruct P from the micro-nat log and sum per context
    val byContext = scored.map { r =>
      val i = (r.getLong(0) - 100L).toInt
      val ctx = heldText(i).split(" ").head
      ctx -> math.exp(r.getLong(2).toDouble / 1e6)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    (vocab :+ "zz").foreach { ctx =>
      assert(math.abs(byContext(ctx) - 1.0) < 1e-4,
        s"sum P(.|$ctx) = ${byContext(ctx)}") }
  }

  test("knBigramLmScore: a frequent word seen in ONE context gets a " +
       "smaller continuation probability than a rarer word seen in " +
       "many (the Francisco effect)") {
    // 'francisco' occurs 6x, always after 'san'; 'day' occurs 3x
    // after 3 different words
    val train = Seq((0L,
      "san francisco san francisco san francisco san francisco " +
        "san francisco san francisco good day nice day every day"))
      .toDF("doc_id", "text")
    val held = Seq((10L, "the francisco"), (11L, "the day"))
      .toDF("doc_id", "text") // 'the' is an unseen context → pure Pcont
    val s2 = TextOps.knBigramLmScore(train, held, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s2(10L) < s2(11L),
      "P_cont(francisco) should be below P_cont(day)")
  }

  // ---------------- Conformal ----------------

  test("splitConformal: q̂ is the exact ⌈(n+1)(1−α)⌉-th smallest " +
       "calibration score (hand-computed toy) and test coverage " +
       "reports the integer ratio") {
    // one group; train fixes mean 2 (sum 8, n 4) ⇒ scores |y·4 − 8|
    val train = Seq(("g", 2L), ("g", 2L), ("g", 2L), ("g", 2L))
      .toDF("g", "y")
    // calibration y: 1..9 ⇒ scores |4y−8|: 4,0,4,8,12,16,20,24,28
    val cal = (1L to 9L).map(("g", _)).toDF("g", "y")
    // α=2/10 ⇒ target = ceil(10·0.8) = 8 ⇒ 8th smallest of
    // sorted(0,4,4,8,12,16,20,24,28) = 24
    val test9 = Seq(("g", 4L), ("g", 9L)).toDF("g", "y")
    // test scores: |16−8|=8 ≤ 24 covered; |36−8|=28 > 24 not
    val out = EvalOps.splitConformal(train, cal, test9, "g", "y", 2, 10)
      .collect().head
    assert(out.getLong(out.fieldIndex("n_cal")) === 9L)
    assert(out.getLong(out.fieldIndex("qhat_scaled")) === 24L)
    assert(out.getLong(out.fieldIndex("n_test")) === 2L)
    assert(out.getLong(out.fieldIndex("n_covered")) === 1L)
  }

  test("splitConformal: a group too small for a finite guarantee " +
       "(⌈(n+1)(1−α)⌉ > n) drops from the report instead of " +
       "emitting a fake quantile") {
    val train = Seq(("g", 2L)).toDF("g", "y")
    val cal = Seq(("g", 1L), ("g", 2L)).toDF("g", "y") // n=2, α=1/10
    val test2 = Seq(("g", 3L)).toDF("g", "y") // target=ceil(2.7)=3 > 2
    assert(EvalOps.splitConformal(train, cal, test2, "g", "y", 1, 10)
      .count() === 0L)
  }

  test("splitConformal: empirical coverage on an md5-split sample " +
       "meets the 1−α guarantee within sampling slack") {
    val df = spark.range(3000).select(
      (col("id") % 3).cast("string").as("g"),
      (pmod(conv(substring(md5(concat(lit("cnf|"),
        col("id").cast("string"))), 1, 4), 16, 10).cast("long"),
        lit(41L)) + 1L).as("y"),
      pmod(conv(substring(md5(concat(lit("spl|"),
        col("id").cast("string"))), 1, 2), 16, 10).cast("long"),
        lit(10L)).as("h"))
    val out = EvalOps.splitConformal(
      df.where(col("h") <= 5), df.where(col("h").isin(6L, 7L)),
      df.where(col("h") >= 8), "g", "y", 1, 10)
    val cov = out.collect().map(r =>
      r.getDouble(r.fieldIndex("coverage")))
    assert(cov.nonEmpty && cov.forall(_ >= 0.85),
      s"coverage fell past guarantee−slack: ${cov.mkString(",")}")
  }

  // ---------------- Jackknife ----------------

  test("jackknifeRatio: bias matches the brute-force leave-one-out " +
       "loop and the mean SE matches the closed form") {
    val xs = Seq(5L, 3L, 8L, 2L, 6L)
    val ys = Seq(50L, 36L, 71L, 25L, 58L)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }
      .toDF("g", "x", "y")
    val r = EvalOps.jackknifeRatio(df, "g", "x", "y").collect().head
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    // brute force replicates THROUGH THE SAME micro rounding the
    // operator applies before its sum (exactness convention)
    val reps = xs.indices.map(i => math.round(
      (sy - ys(i)).toDouble / (sx - xs(i)) * 1e6))
    val ratioMicro = math.round(sy.toDouble / sx * 1e6)
    val bias = math.round((n - 1).toDouble *
      (reps.sum.toDouble / n / 1e6 - ratioMicro.toDouble / 1e6) * 1e6)
    assert(r.getLong(r.fieldIndex("ratio_micro")) === ratioMicro)
    assert(r.getLong(r.fieldIndex("jack_bias_micro")) === bias)
    val mean = sx.toDouble / n
    val s2 = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val se = math.sqrt(s2 / n)
    assert(r.getLong(r.fieldIndex("jack_se_mean_x_micro")) ===
      math.round(se * 1e6))
  }
}
