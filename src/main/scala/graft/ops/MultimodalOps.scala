package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-data-pipeline surface: treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode/feature-extract as partition-local batch
  * functions.
  *
  * The actual media decode is STUBBED (no image/audio libs in this
  * container): [[stubDecode]] is a deterministic fake keyed on the bytes.
  * Everything Spark-side — schema, batching, partition-local execution,
  * metadata columns — is real and tested. Swap [[stubDecode]] for a real
  * codec and nothing else changes.
  *
  * Scale notes: payloads never shuffle (all ops are narrow maps); at
  * 100 TB keep media in its own column family / parquet files and prune
  * it out of every query that doesn't decode (columnar projection does
  * this for free — verified by ReadSchema in the plan).
  */
object MultimodalOps {

  /** Canonical multimodal schema fragment: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap a text table into the media schema (fixtures have no binary
    * column; utf-8 bytes stand in as the opaque payload). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** Cheap payload stats computed natively (no decode): size, content
    * hash — the metadata pass you run before deciding what to decode. */
  def payloadStats(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("payload_md5", md5(col("payload")))

  /** Deterministic fake "decode + feature extract": a real impl would
    * decode the payload (image→pixels, audio→samples) and emit features.
    * The stub derives an 8-dim feature vector from byte statistics —
    * deterministic, so tests can pin outputs. REPLACE the body for real
    * media; the signature (bytes → features) is the contract. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
    val feats = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      feats(b % 8) += b.toDouble
      i += 1
    }
    feats.map(_ / payload.length)
  }

  /** Partition-local batch feature extraction — the Scala analogue of a
    * Pandas-UDF-over-mapInPandas: each partition is processed as a local
    * iterator batch, payload bytes never cross a shuffle. `decode` is
    * the pluggable codec ([[stubDecode]] by default; pass
    * [[imageFeatures]] for real image payloads — the production swap
    * the module scaladoc promises, proven by Round12MediaSpec). */
  def extractFeatures(df: DataFrame,
                      decode: Array[Byte] => Array[Double] = stubDecode)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = false))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decode(payload).toSeq)
      }
    }(encoder)
  }

  /** REAL image decode (round-12 verdict task 7): `javax.imageio` —
    * public JDK API, no extra dependency — decodes the payload and
    * returns row-major LUMA values (ITU-R BT.601 integer weights,
    * (299·R + 587·G + 114·B) / 1000 ∈ [0, 255]). Null/undecodable
    * payloads (ImageIO returns null on unknown formats) → empty
    * array, the same degenerate-input convention as [[stubDecode]].
    * Integer arithmetic keeps the luma — and everything hashed from
    * it — engine-portable. */
  def imageLuma(payload: Array[Byte]): Array[Long] = {
    if (payload == null || payload.isEmpty) return Array.empty[Long]
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) return Array.empty[Long]
    val (w, h) = (img.getWidth, img.getHeight)
    // hostile/corrupt headers can declare >= 2^31 pixels — w*h would
    // wrap negative and kill the task instead of following the
    // degenerate-input convention; 2^28 pixels (~1 GB of luma) is
    // already far beyond any sane corpus thumbnail
    if (w.toLong * h > (1L << 28)) return Array.empty[Long]
    val out = new Array[Long](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        out(y * w + x) = (299L * r + 587L * g + 114L * b) / 1000L
        x += 1
      }
      y += 1
    }
    out
  }

  /** [[stubDecode]]'s 8-dim feature contract computed from REAL
    * decoded luma instead of raw payload bytes — drop-in for
    * [[extractFeatures]]'s `decode` parameter. */
  def imageFeatures(payload: Array[Byte]): Array[Double] = {
    val luma = imageLuma(payload)
    if (luma.isEmpty) return Array.fill(8)(0.0)
    val feats = new Array[Double](8)
    var i = 0
    while (i < luma.length) {
      val v = luma(i)
      feats((v % 8).toInt) += v.toDouble
      i += 1
    }
    feats.map(_ / luma.length)
  }

  /** Add a `luma array<long>` column by really decoding the image
    * payload ([[imageLuma]]) — partition-local, payloads never
    * shuffle; only the luma (and downstream, the 8-byte
    * [[aHash32FromLongs]] fingerprint) moves on. This is the
    * production head of the q202/q271 pHash chain: swap
    * [[aHash32]]'s byte-grid stand-in for `decodeLuma ∘
    * aHash32FromLongs` and every relational stage downstream —
    * banding, Hamming verify, dedup — is unchanged. */
  def decodeLuma(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("luma", ArrayType(LongType), nullable = false))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ imageLuma(payload).toSeq)
      }
    }(encoder)
  }

  /** Deterministic "resize" stub: keep every `factor`-th payload byte —
    * the stand-in for an image downscale (real impl: decode → scale →
    * re-encode; the Spark-side contract, a narrow binary→binary map,
    * is identical). */
  def resizePayload(df: DataFrame, factor: Int): DataFrame = {
    val resize = udf((payload: Array[Byte]) =>
      if (payload == null) null
      else payload.grouped(factor).map(_.head).toArray)
    df.withColumn("payload_resized", resize(col("payload")))
      .withColumn("n_bytes_resized", octet_length(col("payload_resized")))
  }

  /** Perceptual AVERAGE-HASH (aHash — the classic image near-dup
    * fingerprint: downscale, threshold each cell against the global
    * mean, pack bits) over the stub "pixel" domain: the payload's
    * byte sequence mapped onto a 32-cell grid (cell = pos·32 div len,
    * the downscale), each cell's mean byte value thresholded against
    * the payload mean, bit g set iff cell g is brighter. A real image
    * pipeline swaps the byte grid for decoded luma — every relational
    * shape downstream (cell aggregate, threshold join, bit packing,
    * Hamming banding) is the production one.
    *
    * DETERMINISM: cell/total means are single divides of exact
    * integer sums; the strict `>` threshold resolves identically in
    * any engine; the hash is an integer sum of distinct powers of two.
    *
    * SCALE: the hash is a PURE PROJECTION ([[aHash32Expr]]) — zero
    * shuffle, the payload bytes never leave their partition; only the
    * 8-byte fingerprints move into the downstream band join. */
  def aHash32(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(length(col(textCol)) > 0)
      .select(col(idCol), aHash32Expr(col(textCol)).as("phash"))

  /** [[aHash32]]'s hash as a PURE per-row expression — the shape that
    * matters at 100 TB: a perceptual hash is local to its payload, so
    * it must be a projection (zero shuffle; only the 8-byte
    * fingerprints ever move), not an explode + grid aggregate + join.
    * Cell g covers byte positions [⌈g·n/32⌉, ⌈(g+1)·n/32⌉) — exactly
    * the positions p with p·32 div n = g, so the relational spelling
    * (and the DuckDB oracle) is bit-identical. All arithmetic is
    * exact: integer products < 2^40, and the one float compare is a
    * single divide on each side. */
  def aHash32Expr(text: Column): Column =
    // the char-walk expression is bound ONCE inside aHash32FromLongs —
    // unbound it would be re-built per cell (33× the O(len) char walk,
    // the 6 s → 113 s difference measured on the sf0.1 corpus)
    aHash32FromLongs(
      transform(sequence(lit(0), (length(text) - 1).cast("int")),
        i => ascii(text.substr(i + lit(1), lit(1))).cast("long")))

  /** The aHash grid/threshold/pack core over ANY `array<long>` of
    * pixel-domain values — [[aHash32Expr]] feeds it the byte-grid
    * stand-in, [[decodeLuma]] feeds it REAL decoded luma (round-12
    * task 7); the expression (and so the oracle SQL shape) is
    * identical either way. Empty arrays hash to 0. */
  def aHash32FromLongs(byteVals: Column): Column =
    // bind is load-bearing twice: an unbound `bytes` would re-evaluate
    // the input expression per cell, and an unbound total would
    // re-sum per cell
    TextOps.bind(byteVals,
      bytes => TextOps.bind(
        aggregate(bytes, lit(0L), (acc, b) => acc + b),
        total => {
          val n = size(bytes).cast("long")
          // exact floor(x / 32) for non-negative x (x − x mod 32 is a
          // multiple of 32 well under 2^53 ⇒ the double divide is exact)
          def div32(x: Column) =
            ((x - pmod(x, lit(32L))) / lit(32L)).cast("long")
          val contribs = transform(sequence(lit(0L), lit(31L)), g => {
            val lo = div32(g * n + lit(31L))
            val hi = div32((g + lit(1L)) * n + lit(31L))
            val cnt = hi - lo
            val csum = aggregate(
              slice(bytes, (lo + lit(1L)).cast("int"), cnt.cast("int")),
              lit(0L), (acc, b) => acc + b)
            when(cnt > 0 &&
                csum.cast("double") / cnt.cast("double") >
                total.cast("double") / n.cast("double"),
              pow(lit(2.0), g.cast("double")).cast("long"))
              .otherwise(lit(0L))
          })
          aggregate(contribs, lit(0L), (acc, c) => acc + c)
        }))

  /** Frame-sampling stub for video-shaped payloads: emit every `stride`th
    * chunk of `frameBytes` as a "frame" row (1→N explode, narrow). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty
        else payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, i) => Row(id, i, chunk) }
      }
    }(encoder)
  }
}
