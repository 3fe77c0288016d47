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
    * iterator batch, payload bytes never cross a shuffle. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = false))
    val encoder = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ stubDecode(payload).toSeq)
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
    // TextOps.bind is load-bearing twice: an unbound `bytes` would be
    // re-built per cell (33× the O(len) char walk — the 6 s → 113 s
    // difference measured on the sf0.1 corpus), and an unbound total
    // re-summed per cell
    TextOps.bind(
      transform(sequence(lit(0), (length(text) - 1).cast("int")),
        i => ascii(text.substr(i + lit(1), lit(1))).cast("long")),
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
