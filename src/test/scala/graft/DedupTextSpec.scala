package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, TextOps}

/** Dedup + text-analysis operators (LLM-pipeline surface): exact dedup,
  * MinHash/LSH recall on known duplicates, SimHash locality, Jaccard
  * verify exactness, tokenization/fingerprint/lang-id semantics. */
class DedupTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy cat"),      // near dup of 0
    (3L, "completely different text about spark engines"),
    (4L, "unrelated words nothing shared here at all")
  ).toDF("doc_id", "text")

  test("exactDedup keeps the lowest key per content group") {
    val kept = DedupOps.exactDedup(docs, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(0L, 2L, 3L, 4L))
  }

  test("dupGroups reports keeper and copy count") {
    val g = DedupOps.dupGroups(docs, "text", "doc_id")
      .filter(col("n_copies") > 1).head()
    assert(g.getLong(g.fieldIndex("keeper")) === 0L)
    assert(g.getLong(g.fieldIndex("n_copies")) === 2L)
  }

  test("identical docs have identical MinHash signatures (fast + md5)") {
    for (sig <- Seq(
        DedupOps.minhashSignatureFast(docs, "doc_id", "text", k = 32),
        DedupOps.minhashSignature(docs, "doc_id", "text", k = 8))) {
      val rows = sig.filter(col("doc_id") < 2).drop("doc_id")
        .collect().map(_.toSeq)
      assert(rows(0) === rows(1))
    }
  }

  test("lshCandidatePairs maxBucket downgrades mega-buckets to " +
       "representative pairs, leaves small buckets all-pairs") {
    // 6 identical docs form one mega-bucket in every band; docs 100/101
    // form a separate small (2-member) bucket
    val clustered = ((0L until 6L).map(i => (i, "aaa bbb ccc ddd eee")) ++
      Seq((100L, "xxx yyy zzz www qqq"), (101L, "xxx yyy zzz www qqq")))
      .toDF("doc_id", "text")
    val capped = DedupOps.lshCandidatePairs(clustered, "doc_id", "text",
        k = 32, bands = 4, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // mega-bucket (6 > 4): only (min, member) anchors — 5 pairs, not C(6,2)
    val clusterPairs = capped.filter(_._2 < 100L)
    assert(clusterPairs === (1L until 6L).map(i => (0L, i)).toSet)
    // small bucket (2 ≤ 4): exact all-pairs semantics retained
    assert(capped.contains((100L, 101L)))
    // uncapped form on the same data is the full C(6,2) enumeration
    val full = DedupOps.lshCandidatePairs(clustered, "doc_id", "text",
        k = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.count(_._2 < 100L) === 15)
    assert(capped.subsetOf(full))
  }

  test("LSH candidates recall exact duplicates and respect id ordering") {
    val pairs = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        k = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))       // identical docs always collide
    assert(pairs.forall { case (a, b) => a < b })
    // the unrelated docs must NOT be candidates at r=8
    assert(!pairs.contains((3L, 4L)))
  }

  test("MinHashAgg array signature is bit-for-bit the column-form " +
       "signature") {
    val k = 32
    val arr = DedupOps.minhashSignatureArr(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cols = DedupOps.minhashSignatureFast(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1))).toMap
    assert(arr.keySet === cols.keySet)
    arr.foreach { case (id, sig) => assert(sig === cols(id), s"doc $id") }
    // and the banding over both forms produces identical keys
    val bA = DedupOps.lshBandsFromArray(
        DedupOps.minhashSignatureArr(docs, "doc_id", "text", k),
        "doc_id", "sig", k, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val bC = DedupOps.lshBands(
        DedupOps.minhashSignatureFast(docs, "doc_id", "text", k),
        "doc_id", k, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(bA === bC)
  }

  test("lshRepresentativePairs anchors members to the bucket minimum") {
    val pairs = DedupOps.lshRepresentativePairs(docs, "doc_id", "text",
        k = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))      // exact dup anchored to min id
    assert(pairs.forall { case (a, b) => a < b })
    // representative pairs are a subset of the full candidate set
    val full = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        k = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(full))
  }

  test("shingle→minhash→band→bucket pipeline recalls exact duplicates") {
    val pairs = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        k = 32, bands = 4, ngram = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))   // identical docs, shingle-level
    assert(!pairs.contains((3L, 4L)))
  }

  test("jaccardVerify computes exact token-set Jaccard") {
    val cands = Seq((0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val j = DedupOps.jaccardVerify(docs, "doc_id", "text", cands)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // doc0 vs doc2: tokens {the,quick,brown,fox,jumps,over,lazy,dog} vs
    // same minus dog plus cat → inter 7, union 9
    assert(math.abs(j((0L, 2L)) - 7.0 / 9.0) < 1e-12)
    assert(j((0L, 3L)) < 0.1)
  }

  test("simhash: identical docs equal, near-dups closer than unrelated") {
    val fp = DedupOps.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) === fp(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(2L)) < ham(fp(0L), fp(4L)))
  }

  test("SimHashAgg matches the 64-column vote formulation bit-for-bit") {
    val a = DedupOps.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = DedupOps.simhash64Columns(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("hamming64 column matches bitCount") {
    val df = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .select(DedupOps.hamming64(col("a"), col("b")).as("h"))
    assert(df.head.getInt(0) === 8)
  }

  test("tokenCount/subwordCount/tokenSet semantics") {
    val df = Seq("  hello   world hello ").toDF("t").select(
      TextOps.tokenCount(col("t")).as("n"),
      size(TextOps.tokenSet(col("t"))).as("d"),
      TextOps.subwordCount(lit("abc123-def")).as("sw"))
    val r = df.head()
    assert(r.getInt(0) === 3)   // leading/trailing/multi whitespace ignored
    assert(r.getInt(1) === 2)   // distinct
    assert(r.getInt(2) === 4)   // abc | 123 | - | def
  }

  test("setFingerprint is word-order-insensitive, rollingFingerprint is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y").select(
      TextOps.setFingerprint(col("x")).as("sx"),
      TextOps.setFingerprint(col("y")).as("sy"),
      TextOps.rollingFingerprint(col("x")).as("rx"),
      TextOps.rollingFingerprint(col("y")).as("ry"))
    val r = df.head()
    assert(r.getString(0) === r.getString(1))
    assert(r.getLong(2) !== r.getLong(3))
  }

  test("shingles: sliding n-gram windows; short docs yield empty sets") {
    val df = Seq("a b c d", "a b", "x").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s"))
    val got = df.collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("shingle-level jaccardVerify distinguishes word order") {
    // same token SET, different order → unigram jaccard 1.0 but
    // bigram jaccard < 1 (the reason shingles exist)
    val docs = Seq((0L, "a b c d e"), (1L, "e d c b a")).toDF("doc_id", "text")
    val cands = Seq((0L, 1L)).toDF("id_a", "id_b")
    val uni = DedupOps.jaccardVerify(docs, "doc_id", "text", cands)
      .head.getDouble(2)
    val bi = DedupOps.jaccardVerify(docs, "doc_id", "text", cands, ngram = 2)
      .head.getDouble(2)
    assert(uni === 1.0)
    assert(bi === 0.0)
  }

  test("connectedComponents: chain merges to one cluster, singleton " +
       "stays its own, disjoint pair separate") {
    // graph: 1-2-3-4 (a chain — needs multiple propagation rounds),
    // 6-7, and isolated node 5
    val nodes = (1L to 7L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("id_a", "id_b")
    val got = DedupOps.connectedComponents(nodes, pairs, "id")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L))
  }

  test("connectedComponents releases superseded checkpoints: at most the " +
       "final iterate's RDD survives a 20-iteration run") {
    val sc = spark.sparkContext
    // snapshot IDS, not counts: earlier tests' final checkpoints may be
    // context-cleaner-collected mid-test, which would skew a count delta
    val before = sc.getPersistentRDDs.keySet
    // 30-node path: diameter 29 > maxIter, so all 20 iterations run and
    // every one produces (and must release) a checkpoint. Without the
    // per-round release this strands 20+ RDDs (edges + initial labels +
    // one per iteration) — the q57 monotone-slowdown signature.
    val nodes = (1L to 30L).toDF("id")
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = DedupOps.connectedComponents(nodes, pairs, "id", maxIter = 20)
    assert(got.count() === 30L)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size === 1,
      s"stranded checkpoint RDDs from this run: $leaked " +
        "(only the final iterate's checkpoint may survive the call)")
  }

  test("connectedComponents labels are invariant to edge direction and " +
       "duplicate pairs") {
    val nodes = (1L to 4L).toDF("id")
    val pairs = Seq((2L, 1L), (1L, 2L), (3L, 2L), (4L, 3L))
      .toDF("id_a", "id_b")
    val got = DedupOps.connectedComponents(nodes, pairs, "id")
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet === Set(1L))
  }

  test("chunkTokens: overlapping windows cover every token; empty doc " +
       "yields no chunks") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x"), (3L, " "))
      .toDF("doc_id", "text")
    val got = TextOps.chunkTokens(df, "doc_id", "text", 4, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    // step 3: starts 1,4,7,10 → 4 chunks for doc 1; doc 2 one chunk;
    // doc 3 (whitespace only) none
    assert(got === Array(
      (1L, 0L, "a b c d"), (1L, 1L, "d e f g"), (1L, 2L, "g h i j"),
      (1L, 3L, "j"), (2L, 0L, "x")))
  }

  test("dupShingleRatio flags repetitive text, 0 for short or " +
       "all-distinct docs") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),  // 4 identical trigrams
      (2L, "all tokens here are different words"),
      (3L, "ab")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextOps.dupShingleRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.75)  // 4 trigrams, 1 distinct
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)   // too short for a trigram
  }

  test("qualityGate applies the token window and repetition ceiling") {
    val df = Seq(
      (1L, "one two three four five six seven"),       // kept (7 tokens)
      (2L, "too short"),                                // < minTokens
      (3L, "rep rep rep rep rep rep rep rep"))          // repetitive
      .toDF("doc_id", "text")
    val kept = TextOps.qualityGate(df, "text", 5, 100, 0.1)
      .select("doc_id").as[Long].collect()
    assert(kept === Array(1L))
  }

  test("langId picks the language with most stopword hits, und on none") {
    val df = Seq(
      "the cat is one of the animals and it sleeps",
      "el gato es uno de los animales que duerme",
      "zzz qqq xxx").toDF("t")
      .select(TextOps.langId(col("t")).as("lang"))
    assert(df.as[String].collect() === Array("en", "es", "und"))
  }

  test("topElementFraction: longest sorted run over tokens and shingles; " +
       "0.0 on empty and sub-n docs") {
    val df = Seq(
      "a b a b a",   // top token a: 3/5; 2-grams [a b, b a, a b, b a]: 2/4
      "x",           // single token: 1/1; no 2-grams -> 0.0
      "",            // empty: 0.0 everywhere
      "u v w").toDF("t")  // all distinct: 1/3; 2-grams distinct: 1/2
      .select(
        TextOps.topElementFraction(TextOps.tokens(col("t"))).as("tok"),
        TextOps.topShingleFraction(col("t"), 2).as("g2"))
    val rows = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows(0) === ((0.6, 0.5)))
    assert(rows(1) === ((1.0, 0.0)))
    assert(rows(2) === ((0.0, 0.0)))
    assert(rows(3) === ((1.0 / 3, 0.5)))
  }

  test("urlNormalize strips query/fragment/trailing slash and lowercases " +
       "scheme+host only; urlHost extracts the lowercased host") {
    val df = Seq(
      "https://WWW.Foo.Example.org/Path/To?q=1#frag",
      "http://A.b/",
      "HTTPS://Host.com:8080/Mixed/Case",
      "https://bare.host").toDF("u")
      .select(TextOps.urlNormalize(col("u")).as("n"),
        TextOps.urlHost(col("u")).as("h"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) === (("https://www.foo.example.org/Path/To",
      "www.foo.example.org")))
    assert(rows(1) === (("http://a.b", "a.b")))
    assert(rows(2) === (("https://host.com:8080/Mixed/Case",
      "host.com:8080")))
    assert(rows(3) === (("https://bare.host", "bare.host")))
  }
}
