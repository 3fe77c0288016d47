package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AggOps, DedupOps, SimilarityOps, SplitOps, TextOps}

/** Round-3 operators: PII redaction, exact heavy hitters, md5 SimHash +
  * Hamming-bucketed near-dup, int8 embedding quantization, skew-salted
  * aggregation, and the `bind` let-encoding they build on. */
class Round3OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------ bind

  test("bind evaluates the bound expression once with identical result") {
    val df = Seq("a b c d e").toDF("t")
    val direct = df.select(
      TextOps.dupShingleRatio(col("t"), 2).as("r")).head.getDouble(0)
    // 5 tokens, 4 distinct bigrams, no dups
    assert(direct === 0.0)
    // null input propagates to null, not a crash
    val n = Seq[Option[String]](None).toDF("t")
      .select(TextOps.shingles(col("t"), 2).as("s")).head
    assert(n.isNullAt(0))
  }

  // -------------------------------------------------------- redaction

  test("redactPii masks URLs, e-mails, and long digit runs only") {
    val df = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "see https://a.example.com/path?q=1#frag for details",
      "card 12345678901234 expires 2026",   // 14-digit run + a year
      "short 12345678 stays"                // 8 digits: below threshold
    ).toDF("t").select(TextOps.redactPii(col("t")).as("r"))
    val rs = df.as[String].collect()
    assert(rs(0) === "mail me at <EMAIL> today")
    assert(rs(1) === "see <URL> for details")
    assert(rs(2) === "card <NUM> expires 2026")
    assert(rs(3) === "short 12345678 stays")
  }

  test("redactPii handles an email-shaped userinfo inside a URL as URL") {
    val r = Seq("go https://user@host.example.com/p now").toDF("t")
      .select(TextOps.redactPii(col("t"))).as[String].head()
    assert(r === "go <URL> now")
  }

  // ----------------------------------------------------- heavy hitters

  test("topTerms counts exactly and breaks count ties on the term") {
    val docs = Seq("b a a", "b c a", "c b d").toDF("text")
    val top = TextOps.topTerms(docs, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top === Array(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  // ----------------------------------------------------- md5 SimHash

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark engines")
  ).toDF("doc_id", "text")

  test("simhashMd5: identical docs identical, fingerprint fits in 60 bits") {
    val fps = DedupOps.simhashMd5(docs, "doc_id", "text")
      .orderBy("doc_id").select("simhash").as[Long].collect()
    assert(fps(0) === fps(1))
    assert(fps.forall(f => f >= 0 && f < (1L << 60)))
    // locality: one-token edit is closer than an unrelated doc
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(0), fps(2)) < ham(fps(0), fps(3)))
  }

  test("simhashRepPairs finds identical docs at hamming 0; pigeonhole " +
      "recalls all pairs within chunks-1 of a bucket representative") {
    val fp = DedupOps.simhashMd5(docs, "doc_id", "text")
    val pairs = DedupOps.simhashRepPairs(fp, "doc_id", "simhash",
        bits = 60, chunks = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((0L, 1L, 0L)))
    // no pair reported above the distance ceiling
    assert(pairs.forall(_._3 <= 3))
    // synthetic: fingerprints differing in exactly 2 bits must be found
    val synth = Seq((10L, 0L), (11L, 3L)).toDF("id", "f") // ham(0,3)=2
    val sp = DedupOps.simhashRepPairs(synth, "id", "f",
        bits = 60, chunks = 4, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sp.contains((10L, 11L)))
  }

  // ----------------------------------------------------- quantization

  test("quantizeInt8 output is within [-127, 127] and recovers cosine") {
    val emb = Seq(
      (0L, Array(3.0, 4.0, 0.0)),
      (1L, Array(-1.0, 2.0, -2.0))
    ).toDF("id", "v")
      .withColumn("norm", SimilarityOps.l2Norm(col("v")))
      .withColumn("q", SimilarityOps.quantizeInt8(col("v"), col("norm")))
    val rows = emb.select("q").as[Array[Int]].collect()
    assert(rows.flatten.forall(q => q >= -127 && q <= 127))
    // unit direction survives: q/127 ~ v/norm within quantization step
    val v0 = rows(0).map(_ / 127.0)
    assert(math.abs(v0(0) - 0.6) < 0.01 && math.abs(v0(1) - 0.8) < 0.01)
  }

  // -------------------------------------------------- salted aggregate

  test("saltedAgg equals the direct groupBy on a 90%-hot-key frame") {
    val df = (1 to 1000).map { i =>
      (if (i <= 900) "hot" else s"k${i % 7}", i.toDouble)
    }.toDF("k", "v")
    val salted = AggOps.saltedAgg(df, "k", "v", factor = 8)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted === direct)
  }

  // ------------------------------------- incremental dedup + contamination

  test("dedupAgainst drops exactly the rows whose content exists in ref") {
    val ref = Seq((0L, "seen before"), (1L, "also seen")).toDF("doc_id", "text")
    val batch = Seq((10L, "seen before"), (11L, "brand new"),
      (12L, "also seen"), (13L, "brand new")).toDF("doc_id", "text")
    val kept = DedupOps.dedupAgainst(batch, ref, Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    // within-batch duplicates are NOT collapsed (that's exactDedup's
    // job) — only matches against the reference are dropped
    assert(kept === Array(11L, 13L))
  }

  test("contamination reports eval docs sharing an n-gram with train") {
    val train = Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "prefix alpha beta gamma delta suffix"), // shares 3-grams
      (11L, "nothing in common at all here")
    ).toDF("doc_id", "text")
    val hits = DedupOps.contamination(eval_, train, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // shared distinct trigrams: "alpha beta gamma", "beta gamma delta"
    assert(hits === Map(10L -> 2L))
  }

  // --------------------------------------------- packing + mixture

  test("packSequences assigns bins by exclusive cumulative tokens") {
    val docs = Seq(
      ("g", 1L, "a b c"),          // 3 tokens, cum 0 → bin 0 off 0
      ("g", 2L, "d e f g"),        // 4 tokens, cum 3 → bin 0 off 3
      ("g", 3L, "h i"),            // cum 7 → bin 1 off 2 (budget 5)
      ("h", 9L, "x y z")           // separate group restarts at 0
    ).toDF("lang", "doc_id", "text")
    val out = TextOps.packSequences(docs, "lang", "doc_id", "text", 5)
      .orderBy("lang", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out === Array(
      ("g", 1L, 3L, 0L, 0L), ("g", 2L, 4L, 0L, 3L),
      ("g", 3L, 2L, 1L, 2L), ("h", 9L, 3L, 0L, 0L)))
  }

  test("hashMixture keeps ceil(f*n) rows per group, deterministically") {
    val df = (0 until 200).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val mix = Map("a" -> 0.3, "b" -> 1.0)
    val out = SplitOps.hashMixture(df, "g", "id", mix)
    val sizes = out.groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sizes === Map("a" -> 30L, "b" -> 100L))   // ceil(.3*100), all of b
    // reproducible: the same call selects the same ids
    val ids1 = out.select("id").as[Long].collect().sorted
    val ids2 = SplitOps.hashMixture(df, "g", "id", mix)
      .select("id").as[Long].collect().sorted
    assert(ids1 === ids2)
    // a different salt draws a different subset of the same size
    val salted = SplitOps.hashMixture(df, "g", "id", mix, salt = "s1")
      .select("id").as[Long].collect().sorted
    assert(salted.length === ids1.length && !(salted sameElements ids1))
  }

  test("hashSampleMixture: deterministic, near-f sizes, zero-shuffle plan") {
    val df = (0 until 2000).map(i => (i.toLong, "a")).toDF("id", "g")
    val out = SplitOps.hashSampleMixture(df, "g", "id", Map("a" -> 0.3))
    val n = out.count()
    assert(math.abs(n - 600.0) < 100, s"binomial size way off: $n")  // ±~4σ
    assert(out.count() === n)                    // deterministic re-run
    // the filter is a scan-stage predicate: no exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "hash-threshold sampling must not shuffle")
  }

  test("qualityGate operator selects exactly q65's two-projection doc set") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val viaOp = TextOps.qualityGate(docs, "text", 20, 80, 0.02)
      .select("doc_id").as[Long].collect().sorted
    val viaQuery = SparkEntry.queries("q65_quality_gate")(spark, dir)
      .select("doc_id").as[Long].collect().sorted
    assert(viaOp === viaQuery)
  }

  // ------------------------------------------------------ lang-id bind

  test("langId still classifies after the bind rewrite") {
    val r = Seq("the cat is a friend of the dog", "el gato es de la casa")
      .toDF("text").select(TextOps.langId(col("text"))).as[String].collect()
    assert(r === Array("en", "es"))
  }
}
