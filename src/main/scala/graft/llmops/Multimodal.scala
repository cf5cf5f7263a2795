package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{EngineQuery, Tables}

/** Multimodal columns (north star [ext]): media payloads as opaque
  * `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * No image/audio codec libraries exist in this container, so the
  * default DECODE step is a clearly-marked deterministic stub
  * ([[FakeDecoder]]); everything Spark-side — the asset schema, binary
  * column handling, batched per-partition processing shape, and
  * metadata derivation — is real and tested. The swap-point itself is
  * PROVEN executable, not just asserted: [[PpmDecoder]] is a real
  * pixel decoder (binary P6 PPM needs no library) that LlmopsSpec
  * drives through the same [[decodeFeatures]] path on generated image
  * bytes, asserting header-true width/height and channel-mean
  * features. Production swaps one [[MediaDecoder]] instance.
  */
object Multimodal {

  /** Canonical media-asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  /** Decoded-feature schema produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** The decoder seam: payload bytes → (width, height, n_frames,
    * feature vector). Runs executor-side inside `mapPartitions`, so
    * implementations must be serializable and stateless (or hold only
    * serializable config). Production plugs a JNI/codec call in here;
    * [[PpmDecoder]] proves the seam with a real pixel format.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float])
  }

  /** STUB decoder — stands in for the image/audio codec that is not
    * available here. Deterministic on the payload bytes so tests and
    * oracles are stable. Production replaces only this object.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = if (payload == null) 0L else payload.length.toLong
      val width = (16 + n % 64).toInt
      val height = (16 + (n * 7) % 64).toInt
      val frames = (1 + n % 8).toInt
      // 4-dim "feature": leading byte values normalized — fake but stable
      val feat = (0 until 4).map { i =>
        if (payload == null || payload.length <= i) 0f
        else (payload(i) & 0xff) / 255f
      }.toArray
      (width, height, frames, feat)
    }
  }

  /** REAL decoder for binary P6 PPM images — no library needed (the
    * format is a text header + raw RGB bytes), so the decode seam is
    * provable with actual pixel data even in this codec-less
    * container. Emits true width/height from the header, n_frames=1,
    * and a 4-dim feature of channel means (mean R, G, B, and
    * Rec.601 luma), each normalized by maxval to [0,1] — the same
    * shape contract as [[FakeDecoder]], so the two are drop-in
    * interchangeable through [[decodeFeatures]].
    */
  object PpmDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      require(payload != null && payload.length >= 2 &&
        payload(0) == 'P' && payload(1) == '6', "not a P6 PPM payload")
      var pos = 2
      // header tokens are whitespace-separated ints; '#' starts a
      // comment running to end-of-line (PPM spec)
      def nextInt(): Int = {
        while (pos < payload.length &&
            (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = 0
        require(pos < payload.length && payload(pos) >= '0' &&
          payload(pos) <= '9', s"malformed PPM header at byte $pos")
        while (pos < payload.length && payload(pos) >= '0' &&
            payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
        }
        v
      }
      val width = nextInt()
      val height = nextInt()
      val maxval = nextInt()
      require(maxval > 0 && maxval < 256,
        s"only 1-byte-per-sample PPM supported, maxval=$maxval")
      pos += 1 // exactly one whitespace byte separates header and raster
      val need = width.toLong * height * 3
      require(payload.length - pos >= need,
        s"truncated raster: need $need bytes, have ${payload.length - pos}")
      var r = 0L; var g = 0L; var b = 0L
      var i = pos
      val end = pos + need.toInt
      while (i < end) {
        r += payload(i) & 0xff
        g += payload(i + 1) & 0xff
        b += payload(i + 2) & 0xff
        i += 3
      }
      val n = (width.toDouble * height) * maxval
      val mr = (r / n).toFloat; val mg = (g / n).toFloat
      val mb = (b / n).toFloat
      val luma = (0.299 * r / n + 0.587 * g / n + 0.114 * b / n).toFloat
      (width, height, 1, Array(mr, mg, mb, luma))
    }
  }

  /** REAL decoder for the multi-frame "PV" container — the video-shaped
    * twin of [[PpmDecoder]] (round-9 verdict #8: q153's frame-sample
    * path previously gated only on hex-slicing arithmetic). The format
    * is a frame DIRECTORY plus concatenated P6 PPM frames:
    *
    *   `PV\n<n_frames>\n<len_0> <len_1> ... <len_{n-1}>\n<frame bytes…>`
    *
    * The decoder parses the directory, slices each frame by its
    * recorded length, re-parses every frame's own PPM header (all
    * frames must agree on width/height/maxval — a container contract),
    * and accumulates EXACT integer channel sums across all rasters;
    * the feature is the global per-channel mean + Rec.601 luma over
    * the whole clip, n_frames from the directory. A mis-assembled
    * directory, a wrong per-frame length, or a header/raster bug all
    * shift the sums and hash-mismatch the q182 gate.
    */
  object PpmFramesDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      require(payload != null && payload.length >= 2 &&
        payload(0) == 'P' && payload(1) == 'V', "not a PV container")
      var pos = 2
      def nextInt(): Int = {
        while (pos < payload.length && payload(pos).toChar.isWhitespace)
          pos += 1
        var v = 0
        require(pos < payload.length && payload(pos) >= '0' &&
          payload(pos) <= '9', s"malformed PV directory at byte $pos")
        while (pos < payload.length && payload(pos) >= '0' &&
            payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
        }
        v
      }
      val nFrames = nextInt()
      require(nFrames > 0, s"PV container with $nFrames frames")
      val lens = Array.fill(nFrames)(nextInt())
      pos += 1 // exactly one whitespace byte ends the directory
      var w = -1; var h = -1; var mv = -1
      var r = 0L; var g = 0L; var b = 0L
      lens.foreach { len =>
        require(payload.length - pos >= len,
          s"truncated container: frame needs $len bytes, " +
            s"have ${payload.length - pos}")
        // per-frame P6 header parse (same grammar as PpmDecoder)
        val end = pos + len
        require(end - pos >= 2 && payload(pos) == 'P' &&
          payload(pos + 1) == '6', "frame is not a P6 PPM")
        var fp = pos + 2
        def frameInt(): Int = {
          while (fp < end && (payload(fp).toChar.isWhitespace ||
              payload(fp) == '#')) {
            if (payload(fp) == '#')
              while (fp < end && payload(fp) != '\n') fp += 1
            else fp += 1
          }
          var v = 0
          require(fp < end && payload(fp) >= '0' && payload(fp) <= '9',
            s"malformed frame header at byte $fp")
          while (fp < end && payload(fp) >= '0' && payload(fp) <= '9') {
            v = v * 10 + (payload(fp) - '0'); fp += 1
          }
          v
        }
        val width = frameInt(); val height = frameInt()
        val maxval = frameInt()
        fp += 1
        if (w < 0) { w = width; h = height; mv = maxval }
        else require(w == width && h == height && mv == maxval,
          "container frames disagree on geometry")
        val need = width * height * 3
        require(end - fp >= need,
          s"truncated frame raster: need $need, have ${end - fp}")
        var i = fp
        val rEnd = fp + need
        while (i < rEnd) {
          r += payload(i) & 0xff
          g += payload(i + 1) & 0xff
          b += payload(i + 2) & 0xff
          i += 3
        }
        pos = end
      }
      val n = (w.toDouble * h * nFrames) * mv
      val mr = (r / n).toFloat; val mg = (g / n).toFloat
      val mb = (b / n).toFloat
      val luma = (0.299 * r / n + 0.587 * g / n + 0.114 * b / n).toFloat
      (w, h, nFrames, Array(mr, mg, mb, luma))
    }
  }

  /** The binary→binary transform seam (the resize/transcode slot):
    * payload bytes in, payload bytes out, executor-side. q152's stride
    * decimation is the stub occupant; [[PpmBoxHalver]] proves the seam
    * with a real pixel operation.
    */
  trait MediaTransform extends Serializable {
    def transform(payload: Array[Byte]): Array[Byte]
  }

  /** REAL resizer: 2x box downscale of a binary P6 PPM — each output
    * pixel is the floor-average of its 2x2 source block, per channel
    * (exact integer arithmetic, so an oracle can replay it), re-emitted
    * as a well-formed P6 PPM. Re-emission is the point: the output of
    * a real resize stage is another decodable asset, so q183 chains
    * this transform into [[PpmDecoder]] and the gate checks the
    * re-emitted HEADER (halved geometry) and RASTER (block means)
    * together.
    */
  object PpmBoxHalver extends MediaTransform {
    def transform(payload: Array[Byte]): Array[Byte] = {
      require(payload != null && payload.length >= 2 &&
        payload(0) == 'P' && payload(1) == '6', "not a P6 PPM payload")
      var pos = 2
      def nextInt(): Int = {
        while (pos < payload.length &&
            (payload(pos).toChar.isWhitespace || payload(pos) == '#')) {
          if (payload(pos) == '#')
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = 0
        require(pos < payload.length && payload(pos) >= '0' &&
          payload(pos) <= '9', s"malformed PPM header at byte $pos")
        while (pos < payload.length && payload(pos) >= '0' &&
            payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1
      require(w % 2 == 0 && h % 2 == 0,
        s"box halver needs even dimensions, got ${w}x$h")
      require(payload.length - pos >= w.toLong * h * 3,
        "truncated raster")
      val w2 = w / 2; val h2 = h / 2
      val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + w2 * h2 * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var o = header.length
      var by = 0
      while (by < h2) {
        var bx = 0
        while (bx < w2) {
          var c = 0
          while (c < 3) {
            val i00 = pos + ((2 * by) * w + 2 * bx) * 3 + c
            val i01 = i00 + 3
            val i10 = pos + ((2 * by + 1) * w + 2 * bx) * 3 + c
            val i11 = i10 + 3
            val sum = (payload(i00) & 0xff) + (payload(i01) & 0xff) +
              (payload(i10) & 0xff) + (payload(i11) & 0xff)
            out(o) = (sum / 4).toByte
            o += 1; c += 1
          }
          bx += 1
        }
        by += 1
      }
      out
    }
  }

  /** Batched per-partition binary→binary transform through a REAL
    * [[MediaTransform]] — the generalized form of [[resizePayloads]]'
    * seam (same partition-local iterator; production swaps the
    * transform object exactly like [[decodeFeatures]] swaps decoders).
    */
  def transformPayloads(assetsDf: DataFrame,
      t: MediaTransform): DataFrame = {
    val spark = assetsDf.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rdd = assetsDf.select("asset_id", "payload").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, if (p == null) null else t.transform(p))
        }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Documents rendered as binary media assets (the fixture set has no
    * real media; text bytes stand in for the payload).
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents.select(
      col("doc_id").as("asset_id"),
      lit("text/plain").as("media_type"),
      col("text").cast(BinaryType).as("payload"),
      octet_length(col("text")).cast(LongType).as("n_bytes"),
      md5(col("text").cast(BinaryType)).as("checksum"))

  /** Batched per-partition decode — the real plumbing: executors stream
    * partitions of binary payloads through the decoder, emitting typed
    * features. This is where `mapInPandas`/Arrow batches would sit in a
    * Python pipeline; in Scala it is a partition-local iterator (no
    * shuffle, no driver materialization).
    */
  def decodeFeatures(assetsDf: DataFrame,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val spark = assetsDf.sparkSession
    val rdd = assetsDf.select("asset_id", "payload").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (w, h, f, feat) = decoder.decode(payload)
          Row(id, w, h, f, feat)
        }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Driver-gate query: the SQL-expressible slice of the multimodal
    * pipeline — binary payloads, byte lengths, checksums, and the
    * deterministic stub metadata (pure integer arithmetic, so the oracle
    * can replicate it).
    */
  val q70 = EngineQuery(
    "q70_multimodal_meta",
    (s, dir) => {
      val nBytes = octet_length(col("text")).cast(LongType)
      Tables(s, dir).documents.select(
        col("doc_id").as("asset_id"),
        // payload surfaced as hex — raw BinaryType cells crash the
        // driver's pandas harness; real pipelines keep the binary
        // column (see assets()/decodeFeatures), the GATE serializes it
        hex(col("text").cast(BinaryType)).as("payload_hex"),
        nBytes.as("n_bytes"),
        md5(col("text").cast(BinaryType)).as("checksum"),
        (lit(16) + nBytes % 64).cast(IntegerType).as("width"),
        (lit(16) + (nBytes * 7) % 64).cast(IntegerType).as("height"),
        (lit(1) + nBytes % 8).cast(IntegerType).as("n_frames"))
        .orderBy(col("asset_id"))
    },
    Some("""SELECT doc_id AS asset_id,
              hex(encode(text)) AS payload_hex,
              octet_length(encode(text)) AS n_bytes,
              md5(text) AS checksum,
              CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
              CAST(16 + (octet_length(encode(text)) * 7) % 64 AS INT)
                AS height,
              CAST(1 + octet_length(encode(text)) % 8 AS INT) AS n_frames
            FROM documents ORDER BY asset_id"""))

  /** Driver-gate query for the DECODE PLUMBING itself: the full
    * assets → partition-local decodeFeatures path (the mapPartitions
    * iterator production swaps a codec into), checked against an oracle
    * replicating the stub's arithmetic. The oracle is BYTE-based like
    * the engine (UTF-8 bytes of the payload, extracted from the hex
    * encoding — this DuckDB has no blob subscripting), not char-based,
    * so non-ASCII payloads agree too. The f32 feature division is
    * reproduced in DuckDB via a FLOAT4 cast (verified: single-rounded
    * f32 division equals the double→float double-rounding for every
    * byte value 0..255), serialized fixed-point like every array
    * output.
    */
  val q71 = EngineQuery(
    "q71_multimodal_decode",
    (s, dir) => {
      val feats = decodeFeatures(assets(s, dir))
      feats.select(
        col("asset_id"), col("width"), col("height"), col("n_frames"),
        concat_ws(",", transform(col("feature"),
          x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
            .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH a AS (
              SELECT doc_id AS asset_id,
                octet_length(encode(text)) AS n,
                hex(encode(text)) AS hx
              FROM documents
            )
            SELECT asset_id,
              CAST(16 + n % 64 AS INT) AS width,
              CAST(16 + (n * 7) % 64 AS INT) AS height,
              CAST(1 + n % 8 AS INT) AS n_frames,
              array_to_string(
                [CAST(CAST(FLOOR(CAST(CAST(
                   (CASE WHEN n >= i THEN
                      16*(strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)
                       + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1)
                    ELSE 0 END) / 255.0
                   AS FLOAT) AS DOUBLE) * 10000000.0) AS BIGINT) AS VARCHAR)
                 for i in range(1, 5)], ',') AS feat_fp
            FROM a ORDER BY asset_id"""))

  /** STUB resize — byte decimation at a fixed stride stands in for the
    * pixel resampler (same contract as [[FakeDecoder]]: deterministic
    * on the payload bytes, production swaps in a codec). The PLUMBING
    * is the point: a binary→binary transform running partition-local
    * on executors, no shuffle, no driver materialization.
    */
  def resizePayloads(assetsDf: DataFrame, stride: Int): DataFrame = {
    require(stride > 0)
    val spark = assetsDf.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = true)))
    val rdd = assetsDf.select("asset_id", "payload").rdd.mapPartitions {
      rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val out = if (p == null) null
            else p.indices.collect { case i if i % stride == 0 => p(i) }
              .toArray
          Row(id, out)
        }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** STUB frame sampler — a "video" payload is fixed-size byte frames;
    * emit every `every`-th frame (partition-local flatMap: the binary
    * explode never leaves the executor, rows out = frames kept).
    * Production swaps the chunker for a container demuxer.
    */
  def sampleFrames(assetsDf: DataFrame, frameBytes: Int,
      every: Int): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val spark = assetsDf.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val rdd = assetsDf.select("asset_id", "payload").rdd.mapPartitions {
      rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val p = if (r.isNullAt(1)) Array.emptyByteArray
            else r.getAs[Array[Byte]](1)
          val nFrames = (p.length + frameBytes - 1) / frameBytes
          (0 until nFrames by every).iterator.map { i =>
            Row(id, i,
              p.slice(i * frameBytes, math.min(p.length, (i + 1) * frameBytes)))
          }
        }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Gate query for the resize plumbing: stride-4 byte decimation via
    * the partition-local binary transform, serialized as hex (the gate
    * cannot carry raw binary cells); the oracle reconstructs the same
    * decimation from the hex encoding (2 hex chars per byte — byte
    * j=4i is substr(hx, 8i+1, 2)).
    */
  val q152 = EngineQuery(
    "q152_multimodal_resize",
    (s, dir) => {
      resizePayloads(assets(s, dir), stride = 4)
        .select(col("asset_id"),
          octet_length(col("resized")).cast(LongType).as("n_bytes"),
          hex(col("resized")).as("resized_hex"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH a AS (
              SELECT doc_id AS asset_id,
                octet_length(encode(text)) AS n,
                hex(encode(text)) AS hx
              FROM documents
            )
            SELECT asset_id,
              CAST(CEIL(n / 4.0) AS BIGINT) AS n_bytes,
              array_to_string(
                [substr(hx, 8*i+1, 2)
                 for i in range(0, CAST(CEIL(n / 4.0) AS BIGINT))], '')
                AS resized_hex
            FROM a ORDER BY asset_id"""))

  /** Gate query for the frame-sample plumbing: 32-byte frames, every
    * 3rd kept. Output rows = sampled frames (the explode happened
    * executor-side); the oracle slices the same frames out of the hex
    * encoding (frame i is substr(hx, 64i+1, 64), naturally short at
    * the tail).
    */
  val q153 = EngineQuery(
    "q153_multimodal_frame_sample",
    (s, dir) => {
      sampleFrames(assets(s, dir), frameBytes = 32, every = 3)
        .select(col("asset_id"), col("frame_idx"),
          octet_length(col("frame")).cast(LongType).as("frame_bytes"),
          hex(col("frame")).as("frame_hex"))
        .orderBy(col("asset_id"), col("frame_idx"))
    },
    Some("""WITH a AS (
              SELECT doc_id AS asset_id,
                octet_length(encode(text)) AS n,
                hex(encode(text)) AS hx
              FROM documents
            ), f AS (
              SELECT asset_id, n, hx,
                UNNEST([3*i for i in
                  range(0, CAST(CEIL(CEIL(n / 32.0) / 3.0) AS BIGINT))])
                  AS frame_idx
              FROM a
            )
            SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
              CAST(length(substr(hx, 64*frame_idx+1, 64)) / 2 AS BIGINT)
                AS frame_bytes,
              substr(hx, 64*frame_idx+1, 64) AS frame_hex
            FROM f ORDER BY asset_id, frame_idx"""))

  /** Gate query for the REAL decode path: deterministic binary P6 PPM
    * images are constructed in-query from doc_id (header text + raster
    * bytes via hex assembly — `unhex` is the only way to produce
    * arbitrary 0..255 bytes from SQL), then driven through the SAME
    * assets → [[decodeFeatures]] plumbing as q71, but with
    * [[PpmDecoder]] — an actual pixel decoder parsing an actual image
    * format — in the seam instead of the arithmetic stub. The gate's
    * width/height come out of the decoder's HEADER PARSE and the
    * features out of its raster scan, so a mis-assembled header, a
    * wrong raster length, or a parser bug all hash-mismatch (the
    * decoder also hard-fails on truncated rasters). The oracle
    * replays the construction arithmetic — per-channel byte sums over
    * the same `(doc_id·31 + i) % 256` raster — without ever building
    * the binary, which is exactly what makes the comparison a proof
    * that the decode path reads the bytes back correctly.
    *
    * Scale shape: identical to q71 — a partition-local mapPartitions
    * over the binary column, no shuffle, no driver materialization;
    * payload construction is a pure projection.
    */
  val q179 = EngineQuery(
    "q179_multimodal_ppm_decode",
    (s, dir) => {
      val ppm = Tables(s, dir).documents
        .withColumn("w", expr("4 + doc_id % 13"))
        .withColumn("h", expr("3 + doc_id % 7"))
        .select(col("doc_id").as("asset_id"), expr(
          """unhex(concat(
               hex(cast(concat('P6\n', cast(w as string), ' ',
                 cast(h as string), '\n255\n') as binary)),
               concat_ws('', transform(
                 sequence(0, cast(w*h*3 - 1 as int)),
                 i -> lpad(hex((doc_id*31 + i) % 256), 2, '0')))))""")
          .as("payload"))
      decodeFeatures(ppm, PpmDecoder)
        .select(col("asset_id"), col("width"), col("height"),
          col("n_frames"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH p AS (
              SELECT doc_id AS asset_id,
                4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
              FROM documents
            ), sums AS (
              SELECT asset_id, w, h,
                list_sum([(asset_id*31 + i) % 256
                          for i in range(0, w*h*3, 3)]) AS r,
                list_sum([(asset_id*31 + i) % 256
                          for i in range(1, w*h*3, 3)]) AS g,
                list_sum([(asset_id*31 + i) % 256
                          for i in range(2, w*h*3, 3)]) AS b,
                CAST(w*h AS DOUBLE) * 255.0 AS n
              FROM p
            )
            SELECT asset_id, CAST(w AS INT) AS width,
              CAST(h AS INT) AS height, CAST(1 AS INT) AS n_frames,
              array_to_string([
                CAST(CAST(FLOOR(CAST(CAST(r / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(g / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(b / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(
                  0.299*r/n + 0.587*g/n + 0.114*b/n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR)], ',') AS feat_fp
            FROM sums ORDER BY asset_id"""))

  /** Gate query for the MULTI-FRAME real decode path (the video-shaped
    * seam): deterministic PV containers — a frame directory plus
    * 1..3 concatenated P6 PPM frames per asset — are assembled in-query
    * from doc_id (header text + per-frame rasters via hex assembly,
    * frame f's raster byte i = `(doc_id·31 + f·97 + i) % 256`), then
    * driven through the SAME assets → [[decodeFeatures]] plumbing with
    * [[PpmFramesDecoder]] in the seam. The gate's width/height come out
    * of the per-frame HEADER PARSES, n_frames out of the DIRECTORY
    * parse, and the features out of the cross-frame raster sums — so a
    * mis-assembled directory, a wrong per-frame length, frame-geometry
    * drift, or a slicing bug all hash-mismatch. The oracle replays the
    * construction arithmetic (per-channel integer sums over all frames)
    * without ever building the binary.
    *
    * Scale shape: identical to q179 — payload construction is a pure
    * projection; decode is a partition-local mapPartitions with no
    * shuffle and no driver materialization.
    */
  val q182 = EngineQuery(
    "q182_multimodal_frames_decode",
    (s, dir) => {
      val pv = Tables(s, dir).documents
        .withColumn("w", expr("3 + doc_id % 5"))
        .withColumn("h", expr("2 + doc_id % 4"))
        .withColumn("nf", expr("1 + doc_id % 3"))
        .withColumn("flen", expr(
          """length(concat('P6\n', cast(w as string), ' ',
               cast(h as string), '\n255\n')) + w*h*3"""))
        .select(col("doc_id").as("asset_id"), expr(
          """unhex(concat(
               hex(cast(concat('PV\n', cast(nf as string), '\n',
                 concat_ws(' ', transform(sequence(1, cast(nf as int)),
                   f -> cast(flen as string))), '\n') as binary)),
               concat_ws('', transform(
                 sequence(0, cast(nf - 1 as int)),
                 f -> concat(
                   hex(cast(concat('P6\n', cast(w as string), ' ',
                     cast(h as string), '\n255\n') as binary)),
                   concat_ws('', transform(
                     sequence(0, cast(w*h*3 - 1 as int)),
                     i -> lpad(hex((doc_id*31 + f*97 + i) % 256),
                       2, '0'))))))))""")
          .as("payload"))
      decodeFeatures(pv, PpmFramesDecoder)
        .select(col("asset_id"), col("width"), col("height"),
          col("n_frames"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH p AS (
              SELECT doc_id AS asset_id,
                3 + doc_id % 5 AS w, 2 + doc_id % 4 AS h,
                1 + doc_id % 3 AS nf
              FROM documents
            ), sums AS (
              SELECT asset_id, w, h, nf,
                list_sum([list_sum([(asset_id*31 + f*97 + i) % 256
                          for i in range(0, w*h*3, 3)])
                          for f in range(0, nf)]) AS r,
                list_sum([list_sum([(asset_id*31 + f*97 + i) % 256
                          for i in range(1, w*h*3, 3)])
                          for f in range(0, nf)]) AS g,
                list_sum([list_sum([(asset_id*31 + f*97 + i) % 256
                          for i in range(2, w*h*3, 3)])
                          for f in range(0, nf)]) AS b,
                CAST(w*h*nf AS DOUBLE) * 255.0 AS n
              FROM p
            )
            SELECT asset_id, CAST(w AS INT) AS width,
              CAST(h AS INT) AS height, CAST(nf AS INT) AS n_frames,
              array_to_string([
                CAST(CAST(FLOOR(CAST(CAST(r / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(g / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(b / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(
                  0.299*r/n + 0.587*g/n + 0.114*b/n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR)], ',') AS feat_fp
            FROM sums ORDER BY asset_id"""))

  /** Gate query for the REAL resize path (binary→binary): even-dimension
    * P6 PPMs assembled in-query from doc_id, box-downscaled 2x by
    * [[PpmBoxHalver]] through the partition-local transform seam, then
    * the RE-EMITTED payload decoded by [[PpmDecoder]] — so the gate
    * checks the halved geometry out of the re-emitted header AND the
    * block floor-averages out of the re-emitted raster. A wrong output
    * header, a mis-indexed block, or biased rounding all hash-mismatch
    * (the oracle replays every block's `(a+b+c+d) // 4` in exact
    * integers without ever building bytes).
    *
    * Scale shape: two chained mapPartitions projections (transform,
    * decode) over the binary column — no shuffle, no driver
    * materialization, same physics as q71/q179.
    */
  val q183 = EngineQuery(
    "q183_multimodal_real_resize",
    (s, dir) => {
      val ppm = Tables(s, dir).documents
        .withColumn("w", expr("4 + 2*(doc_id % 5)"))
        .withColumn("h", expr("2 + 2*(doc_id % 4)"))
        .select(col("doc_id").as("asset_id"), expr(
          """unhex(concat(
               hex(cast(concat('P6\n', cast(w as string), ' ',
                 cast(h as string), '\n255\n') as binary)),
               concat_ws('', transform(
                 sequence(0, cast(w*h*3 - 1 as int)),
                 i -> lpad(hex((doc_id*31 + i) % 256), 2, '0')))))""")
          .as("payload"))
      decodeFeatures(transformPayloads(ppm, PpmBoxHalver), PpmDecoder)
        .select(col("asset_id"), col("width"), col("height"),
          col("n_frames"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH p AS (
              SELECT doc_id AS asset_id,
                4 + 2*(doc_id % 5) AS w, 2 + 2*(doc_id % 4) AS h
              FROM documents
            ), sums AS (
              SELECT asset_id, w, h,
                list_sum(flatten([[
                    ((asset_id*31 + ((2*by)*w + 2*bx)*3 + 0) % 256
                   + (asset_id*31 + ((2*by)*w + 2*bx + 1)*3 + 0) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx)*3 + 0) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx + 1)*3 + 0) % 256)
                     // 4
                  for bx in range(0, w//2)] for by in range(0, h//2)]))
                  AS r,
                list_sum(flatten([[
                    ((asset_id*31 + ((2*by)*w + 2*bx)*3 + 1) % 256
                   + (asset_id*31 + ((2*by)*w + 2*bx + 1)*3 + 1) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx)*3 + 1) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx + 1)*3 + 1) % 256)
                     // 4
                  for bx in range(0, w//2)] for by in range(0, h//2)]))
                  AS g,
                list_sum(flatten([[
                    ((asset_id*31 + ((2*by)*w + 2*bx)*3 + 2) % 256
                   + (asset_id*31 + ((2*by)*w + 2*bx + 1)*3 + 2) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx)*3 + 2) % 256
                   + (asset_id*31 + ((2*by+1)*w + 2*bx + 1)*3 + 2) % 256)
                     // 4
                  for bx in range(0, w//2)] for by in range(0, h//2)]))
                  AS b,
                CAST((w//2)*(h//2) AS DOUBLE) * 255.0 AS n
              FROM p
            )
            SELECT asset_id, CAST(w//2 AS INT) AS width,
              CAST(h//2 AS INT) AS height, CAST(1 AS INT) AS n_frames,
              array_to_string([
                CAST(CAST(FLOOR(CAST(CAST(r / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(g / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(b / n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(
                  0.299*r/n + 0.587*g/n + 0.114*b/n AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR)], ',') AS feat_fp
            FROM sums ORDER BY asset_id"""))

  /** REAL decoder for PCM WAV audio — the audio-shaped member of the
    * real-codec family (image [[PpmDecoder]], video [[PpmFramesDecoder]],
    * resize [[PpmBoxHalver]]). RIFF is a chunked container: `RIFF`
    * <size> `WAVE`, then (id, le32 size) chunks; the parser walks the
    * chunk list generically (skipping unknown chunks — the real-world
    * shape, where `LIST`/`fact` chunks precede `data`), reads the
    * `fmt ` chunk (PCM s16le only), cross-checks the derived fields
    * (byte_rate = sr·nch·2, block_align = nch·2 — a mis-assembled
    * header fails loudly instead of mis-striding the samples), and
    * scans the `data` chunk as interleaved little-endian signed 16-bit
    * frames. Emits (n_channels, sample_rate, n_samples_per_channel) in
    * the seam's three int slots and a 4-dim feature: mean of channel 0,
    * mean of the last channel, overall mean, and overall mean
    * ABSOLUTE amplitude (the DC-offset + loudness readouts an audio
    * curation pass computes), each normalized by 32768 to [-1,1].
    */
  object WavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val (nch, sr, ns, dataAt) = RiffWav.parse(payload)
      var s0 = 0L; var sl = 0L; var sa = 0L; var sb = 0L
      var j = 0
      val total = ns * nch
      while (j < total) {
        val v = RiffWav.sample(payload, dataAt, j)
        val c = j % nch
        if (c == 0) s0 += v
        if (c == nch - 1) sl += v
        sa += v
        sb += math.abs(v)
        j += 1
      }
      val perCh = ns * 32768.0
      val all = ns.toDouble * nch * 32768.0
      (nch, sr, ns, Array((s0 / perCh).toFloat, (sl / perCh).toFloat,
        (sa / all).toFloat, (sb / all).toFloat))
    }
  }

  /** Shared RIFF/WAVE container parser behind [[WavDecoder]] and
    * [[WavHalver]] — both the decode and the transform side of the
    * audio family must agree byte-for-byte on what a valid container
    * is, so the chunk walk and every header cross-check live once.
    */
  private[llmops] object RiffWav {

    /** Walk the chunk list and cross-check the PCM header. Returns
      * (n_channels, sample_rate, n_samples_per_channel, data offset).
      */
    def parse(payload: Array[Byte]): (Int, Int, Int, Int) = {
      require(payload != null && payload.length >= 12, "not a RIFF payload")
      def tag(at: Int): String =
        new String(payload, at, 4, "US-ASCII")
      def le32(at: Int): Int =
        (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8) |
          ((payload(at + 2) & 0xff) << 16) | ((payload(at + 3) & 0xff) << 24)
      def le16(at: Int): Int =
        (payload(at) & 0xff) | ((payload(at + 1) & 0xff) << 8)
      require(tag(0) == "RIFF" && tag(8) == "WAVE",
        s"not a RIFF/WAVE payload: ${tag(0)}/${tag(8)}")
      require(le32(4) == payload.length - 8,
        s"RIFF size ${le32(4)} != payload ${payload.length - 8}")
      // generic chunk walk: collect fmt and data offsets
      var pos = 12
      var fmtAt = -1; var dataAt = -1; var dataLen = -1
      while (pos + 8 <= payload.length) {
        val id = tag(pos); val len = le32(pos + 4)
        // bound computed in Long: a malformed len near Int.MaxValue
        // overflows the Int sum to negative and slips past the check,
        // turning the designed descriptive refusal into an
        // ArrayIndexOutOfBoundsException later in the walk
        require(len >= 0 && pos.toLong + 8L + len <= payload.length,
          s"chunk $id overruns payload: len=$len at $pos")
        if (id == "fmt ") { require(len >= 16, "short fmt chunk"); fmtAt = pos + 8 }
        if (id == "data") { dataAt = pos + 8; dataLen = len }
        pos += 8 + len + (len & 1) // chunks are word-aligned (RIFF spec)
      }
      require(fmtAt >= 0, "no fmt chunk")
      require(dataAt >= 0, "no data chunk")
      val fmt = le16(fmtAt)
      require(fmt == 1, s"only PCM supported, got format=$fmt")
      val nch = le16(fmtAt + 2)
      val sr = le32(fmtAt + 4)
      val byteRate = le32(fmtAt + 8)
      val blockAlign = le16(fmtAt + 12)
      val bits = le16(fmtAt + 14)
      require(bits == 16, s"only s16le supported, got $bits bits")
      require(nch >= 1, s"bad channel count $nch")
      require(blockAlign == nch * 2,
        s"block_align $blockAlign != nch*2 ${nch * 2}")
      require(byteRate == sr * nch * 2,
        s"byte_rate $byteRate != sr*nch*2 ${sr * nch * 2}")
      require(dataLen % blockAlign == 0,
        s"data length $dataLen not a multiple of frame size $blockAlign")
      // an empty data chunk passes every cross-check above but makes
      // every downstream per-sample mean a 0/0 — refuse it here so the
      // failure is a descriptive parse error, not silent NaN features
      require(dataLen > 0, "empty data chunk (zero samples)")
      (nch, sr, dataLen / blockAlign, dataAt)
    }

    /** Interleaved sample `j` as a sign-extended s16le value. */
    def sample(payload: Array[Byte], dataAt: Int, j: Int): Int =
      (payload(dataAt + 2 * j) & 0xff) |
        (payload(dataAt + 2 * j + 1) << 8) // hi byte sign-extends
  }

  /** REAL audio resampler: 2x downsample of a PCM s16le WAV — each
    * output frame is the FLOOR-average of two consecutive input frames
    * per channel (exact integer arithmetic via `Math.floorDiv`, so the
    * oracle can replay it; floor, not truncation — they differ on
    * negative samples), re-emitted as a well-formed canonical WAV at
    * half the sample rate. The audio analog of [[PpmBoxHalver]]:
    * re-emission is the point, so q189 chains this transform into
    * [[WavDecoder]] and the gate checks the re-emitted header (halved
    * rate and frame count) and the resampled data together.
    */
  object WavHalver extends MediaTransform {
    def transform(payload: Array[Byte]): Array[Byte] = {
      val (nch, sr, ns, dataAt) = RiffWav.parse(payload)
      require(ns % 2 == 0, s"wav halver needs an even sample count, got $ns")
      require(sr % 2 == 0, s"wav halver needs an even sample rate, got $sr")
      val ns2 = ns / 2; val sr2 = sr / 2
      val dlen2 = ns2 * nch * 2
      val out = new Array[Byte](44 + dlen2)
      def putTag(at: Int, s: String): Unit =
        System.arraycopy(s.getBytes("US-ASCII"), 0, out, at, 4)
      def putLe16(at: Int, v: Int): Unit = {
        out(at) = (v & 0xff).toByte; out(at + 1) = ((v >> 8) & 0xff).toByte
      }
      def putLe32(at: Int, v: Int): Unit = {
        putLe16(at, v & 0xffff); putLe16(at + 2, (v >> 16) & 0xffff)
      }
      putTag(0, "RIFF"); putLe32(4, 36 + dlen2); putTag(8, "WAVE")
      putTag(12, "fmt "); putLe32(16, 16); putLe16(20, 1); putLe16(22, nch)
      putLe32(24, sr2); putLe32(28, sr2 * nch * 2)
      putLe16(32, nch * 2); putLe16(34, 16)
      putTag(36, "data"); putLe32(40, dlen2)
      var t = 0; var o = 44
      while (t < ns2) {
        var c = 0
        while (c < nch) {
          val a = RiffWav.sample(payload, dataAt, (2 * t) * nch + c)
          val b = RiffWav.sample(payload, dataAt, (2 * t + 1) * nch + c)
          putLe16(o, Math.floorDiv(a + b, 2) & 0xffff)
          o += 2; c += 1
        }
        t += 1
      }
      out
    }
  }

  /** Gate query for the REAL audio decode path: deterministic PCM WAV
    * binaries — RIFF container, `fmt ` + `data` chunks, interleaved
    * s16le samples `((doc_id·37 + j·101) mod 65536) - 32768`-signed —
    * are assembled in-query from doc_id via hex (little-endian
    * multi-byte fields built byte by byte), then driven through the
    * SAME assets → [[decodeFeatures]] seam with [[WavDecoder]]. The
    * gate's n_channels/sample_rate/n_samples come out of the chunk
    * walk + header parse and the features out of the sample scan, so a
    * mis-assembled RIFF size, a wrong chunk length, an endianness slip,
    * or a sign-extension bug all hash-mismatch. The oracle replays the
    * construction arithmetic (signed sums via `((v+32768) mod 65536) -
    * 32768` — pure arithmetic, no conditionals) without building bytes.
    *
    * Scale shape: identical to q179 — payload construction is a pure
    * projection, decode is a partition-local mapPartitions; no shuffle,
    * no driver materialization.
    */
  val q188 = EngineQuery(
    "q188_multimodal_wav_decode",
    (s, dir) => {
      // little-endian hex of an int expression, 2 or 4 bytes
      def le16(e: String) =
        s"concat(lpad(hex(($e) % 256), 2, '0')," +
          s" lpad(hex(($e) div 256 % 256), 2, '0'))"
      def le32(e: String) =
        s"concat(lpad(hex(($e) % 256), 2, '0')," +
          s" lpad(hex(($e) div 256 % 256), 2, '0')," +
          s" lpad(hex(($e) div 65536 % 256), 2, '0')," +
          s" lpad(hex(($e) div 16777216 % 256), 2, '0'))"
      val wav = Tables(s, dir).documents
        .withColumn("nch", expr("1 + doc_id % 2"))
        .withColumn("ns", expr("8 + doc_id % 32"))
        .withColumn("sr", expr("8000 + (doc_id % 3) * 4000"))
        .withColumn("dlen", expr("ns * nch * 2"))
        .select(col("doc_id").as("asset_id"), expr(
          s"""unhex(concat(
               hex(cast('RIFF' as binary)), ${le32("36 + dlen")},
               hex(cast('WAVE' as binary)),
               hex(cast('fmt ' as binary)), ${le32("16")},
               ${le16("1")}, ${le16("nch")}, ${le32("sr")},
               ${le32("sr * nch * 2")}, ${le16("nch * 2")}, ${le16("16")},
               hex(cast('data' as binary)), ${le32("dlen")},
               concat_ws('', transform(
                 sequence(0, cast(ns * nch - 1 as int)),
                 j -> ${le16("(doc_id*37 + j*101) % 65536")}))))""")
          .as("payload"))
      decodeFeatures(wav, WavDecoder)
        .select(col("asset_id"), col("width").as("n_channels"),
          col("height").as("sample_rate"),
          col("n_frames").as("n_samples"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some("""WITH p AS (
              SELECT doc_id AS asset_id,
                1 + doc_id % 2 AS nch,
                8 + doc_id % 32 AS ns,
                8000 + (doc_id % 3) * 4000 AS sr
              FROM documents
            ), sums AS (
              SELECT asset_id, nch, ns, sr,
                list_sum([((asset_id*37 + j*101 + 32768) % 65536) - 32768
                          for j in range(0, ns*nch, nch)]) AS s0,
                list_sum([((asset_id*37 + j*101 + 32768) % 65536) - 32768
                          for j in range(nch - 1, ns*nch, nch)]) AS sl,
                list_sum([((asset_id*37 + j*101 + 32768) % 65536) - 32768
                          for j in range(0, ns*nch)]) AS sa,
                list_sum([abs(((asset_id*37 + j*101 + 32768) % 65536)
                          - 32768) for j in range(0, ns*nch)]) AS sb,
                CAST(ns AS DOUBLE) * 32768.0 AS np,
                CAST(ns*nch AS DOUBLE) * 32768.0 AS na
              FROM p
            )
            SELECT asset_id, CAST(nch AS INT) AS n_channels,
              CAST(sr AS INT) AS sample_rate, CAST(ns AS INT) AS n_samples,
              array_to_string([
                CAST(CAST(FLOOR(CAST(CAST(s0 / np AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(sl / np AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(sa / na AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR),
                CAST(CAST(FLOOR(CAST(CAST(sb / na AS FLOAT) AS DOUBLE)
                  * 10000000.0) AS BIGINT) AS VARCHAR)], ',') AS feat_fp
            FROM sums ORDER BY asset_id"""))

  /** Gate query for the REAL audio resample path (binary→binary):
    * even-frame-count PCM WAVs assembled in-query (the q188 builder
    * with even geometry), 2x-downsampled by [[WavHalver]] through the
    * partition-local transform seam, then the RE-EMITTED payload
    * decoded by [[WavDecoder]] — so the gate checks the halved header
    * (sr/2, ns/2 — and that the halver's derived byte_rate/block_align
    * survive the decoder's cross-checks) AND the floor-averaged frames
    * out of the re-emitted data chunk. A truncation-vs-floor slip on
    * negative samples, a mis-strided channel pair, or a mis-assembled
    * output header all hash-mismatch (the oracle replays every output
    * frame's `floor((a+b) / 2)` — explicit floor, since DuckDB's `//`
    * truncates toward zero on negative integers — without building
    * bytes).
    *
    * Scale shape: two chained mapPartitions projections (transform,
    * decode) over the binary column — no shuffle, no driver
    * materialization, q183's physics on the audio family.
    */
  val q189 = EngineQuery(
    "q189_multimodal_wav_resample",
    (s, dir) => {
      def le16(e: String) =
        s"concat(lpad(hex(($e) % 256), 2, '0')," +
          s" lpad(hex(($e) div 256 % 256), 2, '0'))"
      def le32(e: String) =
        s"concat(lpad(hex(($e) % 256), 2, '0')," +
          s" lpad(hex(($e) div 256 % 256), 2, '0')," +
          s" lpad(hex(($e) div 65536 % 256), 2, '0')," +
          s" lpad(hex(($e) div 16777216 % 256), 2, '0'))"
      val wav = Tables(s, dir).documents
        .withColumn("nch", expr("1 + doc_id % 2"))
        .withColumn("ns", expr("8 + 2 * (doc_id % 16)"))
        .withColumn("sr", expr("8000 + (doc_id % 3) * 4000"))
        .withColumn("dlen", expr("ns * nch * 2"))
        .select(col("doc_id").as("asset_id"), expr(
          s"""unhex(concat(
               hex(cast('RIFF' as binary)), ${le32("36 + dlen")},
               hex(cast('WAVE' as binary)),
               hex(cast('fmt ' as binary)), ${le32("16")},
               ${le16("1")}, ${le16("nch")}, ${le32("sr")},
               ${le32("sr * nch * 2")}, ${le16("nch * 2")}, ${le16("16")},
               hex(cast('data' as binary)), ${le32("dlen")},
               concat_ws('', transform(
                 sequence(0, cast(ns * nch - 1 as int)),
                 j -> ${le16("(doc_id*37 + j*101) % 65536")}))))""")
          .as("payload"))
      decodeFeatures(transformPayloads(wav, WavHalver), WavDecoder)
        .select(col("asset_id"), col("width").as("n_channels"),
          col("height").as("sample_rate"),
          col("n_frames").as("n_samples"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .orderBy(col("asset_id"))
    },
    Some {
      // input sample j (interleaved), replayed from the construction
      def v(j: String) =
        s"(((asset_id*37 + ($j)*101 + 32768) % 65536) - 32768)"
      // halved output frame t, channel c: FLOOR-average of frames
      // 2t,2t+1 — NOT DuckDB's `//`, which truncates toward zero on
      // negative integers; floor((a+b)/2.0) is exact in double for
      // |a+b| <= 65534 and matches the engine's Math.floorDiv
      def hv(t: String, c: String) =
        s"CAST(floor((${v(s"(2*($t))*nch + ($c)")} + " +
          s"${v(s"(2*($t)+1)*nch + ($c)")}) / 2.0) AS BIGINT)"
      def fp(num: String, den: String) =
        s"CAST(CAST(FLOOR(CAST(CAST($num / $den AS FLOAT) AS DOUBLE)" +
          s" * 10000000.0) AS BIGINT) AS VARCHAR)"
      s"""WITH p AS (
            SELECT doc_id AS asset_id,
              1 + doc_id % 2 AS nch,
              8 + 2 * (doc_id % 16) AS ns,
              8000 + (doc_id % 3) * 4000 AS sr
            FROM documents
          ), sums AS (
            SELECT asset_id, nch, ns, sr,
              list_sum([${hv("t", "0")}
                        for t in range(0, ns // 2)]) AS s0,
              list_sum([${hv("t", "nch - 1")}
                        for t in range(0, ns // 2)]) AS sl,
              list_sum(flatten([[${hv("t", "c")}
                        for c in range(0, nch)]
                        for t in range(0, ns // 2)])) AS sa,
              list_sum(flatten([[abs(${hv("t", "c")})
                        for c in range(0, nch)]
                        for t in range(0, ns // 2)])) AS sb,
              CAST(ns // 2 AS DOUBLE) * 32768.0 AS np,
              CAST((ns // 2) * nch AS DOUBLE) * 32768.0 AS na
            FROM p
          )
          SELECT asset_id, CAST(nch AS INT) AS n_channels,
            CAST(sr // 2 AS INT) AS sample_rate,
            CAST(ns // 2 AS INT) AS n_samples,
            array_to_string([
              ${fp("s0", "np")},
              ${fp("sl", "np")},
              ${fp("sa", "na")},
              ${fp("sb", "na")}], ',') AS feat_fp
          FROM sums ORDER BY asset_id"""
    })

  /** PERCEPTUAL near-dup detection over REAL-decoded media — image
    * dedup for multimodal pretraining corpora, where byte-level
    * dedup (q40) misses re-encoded copies: assets group by a CONTENT
    * fingerprint computed from decoded pixels (per-channel fixed-point
    * means + dimensions), not payload bytes. The decode is the q179
    * REAL parser (RIFF-style refusing PPM walk), so a header-only
    * lookalike with different pixels lands in a different group. The
    * fixture plants duplicate classes by construction (pixel seed =
    * doc_id mod 5, dims mod 7/4 — assets equal mod 140 are
    * byte-identical copies), and the oracle replays the pixel
    * arithmetic per asset, so a decoder drift, fingerprint change, or
    * wrong group membership hash-mismatches.
    *
    * Scale shape: decode is one partition-local pass (the q179 seam),
    * the grouping is ONE hash-agg on the fingerprint — the image-dedup
    * analog of q40's exact dedup, with the fingerprint computed from
    * content instead of bytes. At 100 TB the decode dominates and
    * parallelizes embarrassingly; the shuffle carries |assets| short
    * fingerprint rows, never pixels.
    */
  val q205 = EngineQuery(
    "q205_media_perceptual_dedup",
    (s, dir) => {
      val ppm = Tables(s, dir).documents
        .withColumn("w", expr("4 + doc_id % 7"))
        .withColumn("h", expr("3 + doc_id % 4"))
        .withColumn("seed", expr("doc_id % 5"))
        .select(col("doc_id").as("asset_id"), expr(
          """unhex(concat(
               hex(cast(concat('P6\n', cast(w as string), ' ',
                 cast(h as string), '\n255\n') as binary)),
               concat_ws('', transform(
                 sequence(0, cast(w*h*3 - 1 as int)),
                 i -> lpad(hex((seed*31 + i) % 256), 2, '0')))))""")
          .as("payload"))
      decodeFeatures(ppm, PpmDecoder)
        .select(col("asset_id"), col("width"), col("height"),
          concat_ws(",", transform(col("feature"),
            x => floor(x.cast(DoubleType) * lit(1e7)).cast(LongType)
              .cast("string"))).as("feat_fp"))
        .groupBy(col("feat_fp"), col("width"), col("height"))
        .agg(count(lit(1)).as("n_assets"),
          min(col("asset_id")).as("keep_id"))
        .orderBy(col("keep_id"))
    },
    Some("""WITH p AS (
              SELECT doc_id AS asset_id,
                4 + doc_id % 7 AS w, 3 + doc_id % 4 AS h,
                doc_id % 5 AS seed
              FROM documents
            ), sums AS (
              SELECT asset_id, w, h,
                list_sum([(seed*31 + i) % 256
                          for i in range(0, w*h*3, 3)]) AS r,
                list_sum([(seed*31 + i) % 256
                          for i in range(1, w*h*3, 3)]) AS g,
                list_sum([(seed*31 + i) % 256
                          for i in range(2, w*h*3, 3)]) AS b,
                CAST(w*h AS DOUBLE) * 255.0 AS n
              FROM p
            ), fp AS (
              SELECT asset_id, CAST(w AS INT) AS width,
                CAST(h AS INT) AS height,
                array_to_string([
                  CAST(CAST(FLOOR(CAST(CAST(r / n AS FLOAT) AS DOUBLE)
                    * 10000000.0) AS BIGINT) AS VARCHAR),
                  CAST(CAST(FLOOR(CAST(CAST(g / n AS FLOAT) AS DOUBLE)
                    * 10000000.0) AS BIGINT) AS VARCHAR),
                  CAST(CAST(FLOOR(CAST(CAST(b / n AS FLOAT) AS DOUBLE)
                    * 10000000.0) AS BIGINT) AS VARCHAR),
                  CAST(CAST(FLOOR(CAST(CAST(
                    0.299*r/n + 0.587*g/n + 0.114*b/n AS FLOAT) AS DOUBLE)
                    * 10000000.0) AS BIGINT) AS VARCHAR)], ',')
                  AS feat_fp
              FROM sums
            )
            SELECT feat_fp, width, height, COUNT(*) AS n_assets,
              MIN(asset_id) AS keep_id
            FROM fp GROUP BY 1, 2, 3
            ORDER BY keep_id"""))

  val all: Seq[EngineQuery] =
    Seq(q70, q71, q152, q153, q179, q182, q183, q188, q189, q205)
}
