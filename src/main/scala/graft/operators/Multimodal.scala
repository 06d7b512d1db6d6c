package graft.operators

import graft.cdc.ErrorPolicy
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-decoded on executors.
  *
  * The Spark-side machinery is real and tested — schema, partition-parallel
  * batched iteration (the Scala analog of a batched/pandas decode UDF), typed
  * output — while the codec itself is a clearly marked DETERMINISTIC STUB
  * (this container ships no image/audio libraries), now behind the
  * [[MediaCodec]] trait: swapping in a real JNI/opencv/ffmpeg implementation
  * is a type-checked constructor argument, not an edit, and changes nothing
  * about the distributed plumbing.
  */
object Multimodal {

  /** Typed per-media features produced by the decode stage. */
  final case class MediaMeta(
      doc_id: Long,
      format: String,
      n_bytes: Int,
      checksum: Long, // Σ bytes mod 2^31-1
      width: Int,     // STUB: derived dimensions standing in for real decode
      height: Int)

  /** The codec seam: everything that touches media BYTES goes through here;
    * everything that distributes work (batching, partitioning, schemas,
    * explode shapes) stays in [[Multimodal]] and is codec-agnostic. A real
    * implementation wraps opencv/ffmpeg/JNI; instances ship to executors, so
    * they must be Serializable and cheap to construct — per-BATCH native
    * setup belongs inside the `mapPartitions` bodies below, not in the codec
    * constructor.
    */
  trait MediaCodec extends Serializable {
    /** Decode a blob into typed features (a real impl: parse container,
      * read dimensions, hash content).
      */
    def decode(docId: Long, format: String, blob: Array[Byte]): MediaMeta
    /** Total frames in a video-like blob at the given nominal frame size
      * (a real impl: the demuxer's frame index).
      */
    def frameCount(blob: Array[Byte], frameBytes: Int): Int
    /** Extract frame `i` (0-based). */
    def frame(blob: Array[Byte], frameBytes: Int, i: Int): Array[Byte]
    /** Resize to a fixed w×h grid; MUST return exactly w·h bytes (the
      * fixed-size-output contract a training-batch assembler requires).
      */
    def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Decode to 8-bit PCM samples in [0, 255] (a real audio codec: demux +
      * decode + resample; the default stub: the payload bytes ARE the
      * samples). Default implementation so existing codecs stay pluggable.
      */
    def pcm(blob: Array[Byte]): Array[Int] = blob.map(b => b & 0xff)
  }

  /** ??? real decode goes here — the in-repo STUB: deterministic byte-level
    * features. Checksum = Σ codepoints of the UTF-8-decoded payload, ONE
    * final modulo — matching the SQL-oracle restatement (`unicode(char)`
    * fold) exactly; a byte-wise or per-step-mod definition would silently
    * diverge on the first non-ASCII or very large payload. Frame
    * segmentation is fixed-size; resize is nearest-neighbor over raw bytes.
    */
  object StubCodec extends MediaCodec {
    def decode(docId: Long, format: String, blob: Array[Byte]): MediaMeta = {
      var sum = 0L
      val it = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().iterator()
      while (it.hasNext) sum += it.nextInt()
      val checksum = sum % 2147483647L
      MediaMeta(docId, format, blob.length, checksum,
        width = (blob.length % 64) + 1, height = (checksum % 64).toInt + 1)
    }
    def frameCount(blob: Array[Byte], frameBytes: Int): Int =
      (blob.length + frameBytes - 1) / frameBytes
    def frame(blob: Array[Byte], frameBytes: Int, i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(
        blob, i * frameBytes, math.min((i + 1) * frameBytes, blob.length))
    def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = w * h
      Array.tabulate(n) { i =>
        if (blob.isEmpty) 0.toByte
        else blob(((i.toLong * blob.length) / n).toInt)
      }
    }
  }

  /** Attach a binary media column (here fabricated from text — the testdata
    * has no real blobs; a production source would read image/audio bytes).
    */
  def withBlob(docs: DataFrame, textCol: String, fmtCol: String): DataFrame =
    docs.select(col("doc_id"), col(fmtCol).as("format"),
      encode(col(textCol), "UTF-8").as("blob"))

  /** Oversize-blob guard — the media-path instance of the engine's error
    * policy (≙ the 1 MiB row cap, ext/io_util.c:3–4): a blob larger than
    * `maxBytes` would blow executor memory in the batched decoders below
    * (each row's blob is fully materialized), so Exit fails the query at the
    * poison row and Log drops it and continues. Compose BEFORE any decode:
    * `decodeBatched(guardOversize(withBlob(...), policy, max))`.
    */
  def guardOversize(blobs: DataFrame, policy: ErrorPolicy,
      maxBytes: Int): DataFrame =
    ErrorPolicy.maxRecordSize(blobs, "blob", policy, maxBytes)

  /** Batched executor-side decode: partitions stream through in fixed-size
    * batches (the shape a vectorized decode library wants — amortized codec
    * init per batch, bounded memory), one output row per media item.
    */
  def decodeBatched(blobs: DataFrame, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[MediaMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec setup would happen here
          batch.iterator.map { case (id, fmt, blob) => codec.decode(id, fmt, blob) }
        }
      }
  }

  /** ViT PATCH-GRID PREP (mm10): the vision-transformer input-shaping step
    * that follows decode — tile each image into `patch`×`patch` patches
    * (ceil-divided grid, so partial edge patches count and `pad_w`/`pad_h`
    * record the padding a real pixel pipeline would add), cap the token
    * budget at `maxPatches` (`truncated` marks images whose grid overflows,
    * the crop/resize decision signal), and report `seq_len` = kept patches
    * + 1 CLS token.
    *
    * Pixels die inside [[decodeBatched]] as everywhere in this family; the
    * grid math is pure per-row projection after it — zero exchanges, and
    * the one thing that would touch bytes again (actual patch extraction)
    * belongs in the codec seam next to `resize`.
    */
  def vitPatchGrid(blobs: DataFrame, patch: Int = 16, maxPatches: Int = 196,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): DataFrame = {
    require(patch >= 1 && maxPatches >= 1, s"bad patch/maxPatches: $patch/$maxPatches")
    val gw = expr(s"(width + ${patch - 1}) div $patch")
    val gh = expr(s"(height + ${patch - 1}) div $patch")
    decodeBatched(blobs, batchSize, codec).toDF()
      .select(col("doc_id"), gw.as("grid_w"), gh.as("grid_h"),
        col("width"), col("height"))
      .select(col("doc_id"), col("grid_w"), col("grid_h"),
        (col("grid_w") * col("grid_h")).as("n_patches"),
        (least(col("grid_w") * col("grid_h"), lit(maxPatches)) + 1).as("seq_len"),
        (col("grid_w") * col("grid_h") > maxPatches).as("truncated"),
        (col("grid_w") * lit(patch) - col("width")).as("pad_w"),
        (col("grid_h") * lit(patch) - col("height")).as("pad_h"))
  }

  /** One sampled frame of a video-like blob. */
  final case class Frame(doc_id: Long, frame_idx: Int, total_frames: Int,
      frame: Array[Byte])

  /** Frame sampling: emit every `every`-th frame as its OWN ROW — the explode
    * shape a frame-level pipeline (caption, embed, filter per frame) needs.
    * Segmentation is the codec's business ([[StubCodec]]: fixed-size; a real
    * container format: the demuxer's frame index); the partition-parallel
    * batched explode, the one-row-per-frame schema, and the total_frames
    * bookkeeping are the codec-agnostic plumbing. Empty blobs produce no
    * frames.
    */
  def frameSample(blobs: DataFrame, frameBytes: Int, every: Int,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): Dataset[Frame] = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch demuxer setup would happen here
          batch.iterator.flatMap { case (id, _, blob) =>
            val total = codec.frameCount(blob, frameBytes)
            (0 until total by every).iterator.map { i =>
              Frame(id, i, total, codec.frame(blob, frameBytes, i))
            }
          }
        }
      }
  }

  /** Typed per-frame features: frame identity + the codec's decode output. */
  final case class FrameMeta(doc_id: Long, frame_idx: Int, n_bytes: Int,
      checksum: Long, width: Int, height: Int)

  /** Frame-level feature extraction — the composition of [[frameSample]]'s
    * explode with the codec's decode, keeping frame identity: the shape a
    * frame-level curation pipeline (caption, filter, embed per frame)
    * consumes. Same batched executor plumbing as [[decodeBatched]]; the
    * codec sees each frame as an independent blob.
    */
  def featurizeFrames(frames: Dataset[Frame], batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[FrameMeta] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec setup would happen here
        batch.iterator.map { f =>
          val m = codec.decode(f.doc_id, "frame", f.frame)
          FrameMeta(f.doc_id, f.frame_idx, m.n_bytes, m.checksum,
            m.width, m.height)
        }
      }
    }
  }

  /** A media item resized to a fixed grid. */
  final case class Resized(doc_id: Long, width: Int, height: Int,
      pixels: Array[Byte])

  /** Resize to a fixed w×h grid — the scaler is the codec's ([[StubCodec]]:
    * nearest-neighbor over raw bytes; a real impl: bilinear over decoded
    * pixels); the batched executor plumbing and the fixed-size output
    * contract (every row exactly w·h bytes) are codec-agnostic and enforced
    * here, failing loudly on a codec that breaks it.
    */
  def resizeBatched(blobs: DataFrame, w: Int, h: Int,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): Dataset[Resized] = {
    require(w > 0 && h > 0, "target dimensions must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch scaler setup would happen here
          batch.iterator.map { case (id, _, blob) =>
            val px = codec.resize(blob, w, h)
            require(px.length == w * h,
              s"codec broke the fixed-size contract: ${px.length} != ${w * h}")
            Resized(id, w, h, px)
          }
        }
      }
  }

  /** One overlapping audio feature window. */
  final case class AudioWindow(doc_id: Long, win_idx: Int, n_samples: Int,
      energy: Long, zero_crossings: Int)

  /** Overlapping audio feature windows (STFT-style framing: length `win`,
    * stride `hop` — 50 % overlap by default, the standard speech framing,
    * unlike [[frameSample]]'s disjoint video frames): per window, the
    * integer energy Σ(s−128)² over centered samples and the zero-crossing
    * count — the two classic silence/voicing discriminators an audio
    * curation pipeline filters on before transcription.
    *
    * The sample decode is the codec's ([[MediaCodec.pcm]]; stub: payload
    * bytes are the samples); the framing arithmetic, integer features
    * (exact on every engine — no float accumulation), and batched
    * executor plumbing are codec-agnostic. Window `j` starts at `j·hop`
    * for every start below the sample count, so trailing windows shorten
    * rather than drop — silence at the clip tail still gets a window.
    * Empty blobs produce no windows.
    */
  def audioWindows(blobs: DataFrame, win: Int = 64, hop: Int = 32,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): Dataset[AudioWindow] = {
    require(win > 0 && hop > 0, "win and hop must be positive")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch decoder setup would happen here
          batch.iterator.flatMap { case (id, _, blob) =>
            val s = codec.pcm(blob)
            (s.indices by hop).iterator.zipWithIndex.map { case (st, j) =>
              val end = math.min(st + win, s.length)
              var energy = 0L; var zc = 0; var i = st
              while (i < end) {
                val c = s(i) - 128
                energy += c.toLong * c
                if (i > st && ((s(i - 1) - 128 < 0) != (c < 0))) zc += 1
                i += 1
              }
              AudioWindow(id, j, end - st, energy, zc)
            }
          }
        }
      }
  }

  /** Energy-gated segmentation over [[audioWindows]] — the VAD-shaped
    * (voice-activity-detection) step an audio curation pipeline runs
    * before transcription: windows above `energyThreshold` are ACTIVE,
    * and maximal runs of consecutive active windows become segments (one
    * row each, with window span and summed energy). Everything below the
    * threshold — silence, hum — is simply never transcribed, which at
    * scale is most of the audio.
    *
    * The run merge is the gaps-and-islands trick on the window index
    * (idx − rank is constant within a consecutive run): the rank window
    * and the segment group-by both key on the doc, so segmentation adds
    * ONE exchange after the decode. A real codec slots in through the
    * same [[MediaCodec.pcm]] seam as mm05.
    */
  def voiceSegments(blobs: DataFrame, win: Int = 64, hop: Int = 32,
      energyThreshold: Long = 120000L, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): DataFrame = {
    val active = audioWindows(blobs, win, hop, batchSize, codec).toDF()
      .filter(col("energy") > energyThreshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win_idx"))
    active
      .withColumn("_grp", col("win_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("_grp"))
      .agg(min(col("win_idx")).as("start_win"),
        max(col("win_idx")).as("end_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("total_energy"))
      .withColumn("seg_idx",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("start_win"))) - 1)
      .select(col("doc_id"), col("seg_idx"), col("start_win"),
        col("end_win"), col("n_windows"), col("total_energy"))
  }

  /** A 64-bit perceptual hash, packed as two 32-bit halves so every bit op
    * stays in non-negative BIGINT range on every engine (bit 63 of a single
    * long would flip its sign). Bit `i` of the conceptual 64-bit hash lives
    * in `ph_lo` for i<32, else in `ph_hi` at i−32.
    */
  final case class PHash(doc_id: Long, ph_hi: Long, ph_lo: Long)

  /** Blockhash-style perceptual image hash: resize to an 8×8 grid (the
    * codec's scaler — stub: nearest-neighbor byte walk; real: bilinear over
    * decoded luma), threshold each pixel against the integer mean, pack the
    * 64 above-mean bits. Near-identical images — recompressed, lightly
    * edited — land within a few bits of each other, which byte-exact
    * hashing ([[Dedup.exactGroups]] on blobs) can never see. Runs in the
    * same batched executor plumbing as the other decoders; one narrow row
    * (id + two longs) per image comes out, so at 100 TB the downstream
    * dedup never touches pixels again.
    */
  def perceptualHash(blobs: DataFrame, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[PHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch scaler setup would happen here
          batch.iterator.map { case (id, _, blob) =>
            val px = codec.resize(blob, 8, 8).map(b => (b & 0xff).toLong)
            val mean = px.sum / 64
            var hi = 0L; var lo = 0L
            var i = 0
            while (i < 64) {
              if (px(i) > mean) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            PHash(id, hi, lo)
          }
        }
      }
  }

  /** Near-duplicate VIDEO pairs: two videos are near-dups when ≥
    * `minShared` of their frame perceptual hashes collide within
    * `maxHamming` — re-encoded, watermarked, or lightly-edited re-uploads
    * share almost every frame hash while byte-level dedup sees nothing.
    * Composes the existing stages: [[frameSample]] (every frame) →
    * [[perceptualHash]] per frame (keyed doc_id·10⁶ + frame_idx, so frames
    * ride the image machinery unchanged) → [[phashDupPairs]] banded
    * matching → one aggregation over cross-video matches. Returns
    * (a, b, n_frame_matches), a < b.
    *
    * Scale: per-frame pixels still die inside the decode; the pair space
    * is band-bucketed, never |frames|²; the final rollup groups the match
    * stream by video pair. Requires < 10⁶ frames per video (the composite
    * key's stride).
    */
  def videoDupPairs(blobs: DataFrame, frameBytes: Int = 64,
      maxHamming: Int = 3, minShared: Int = 3, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): DataFrame = {
    val frames = frameSample(blobs, frameBytes, every = 1, batchSize, codec)
    val frameBlobs = frames.toDF().select(
      (col("doc_id") * 1000000L + col("frame_idx")).as("doc_id"),
      lit("frame").as("format"), col("frame").as("blob"))
    phashDupPairs(perceptualHash(frameBlobs, batchSize, codec).toDF(),
        maxHamming)
      .select(expr("a div 1000000").as("va"), expr("b div 1000000").as("vb"))
      .filter(col("va") =!= col("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(count(lit(1)).as("n_frame_matches"))
      .filter(col("n_frame_matches") >= minShared)
      .select(col("va").as("a"), col("vb").as("b"), col("n_frame_matches"))
  }

  /** VIDEO SCENE-CHANGE DETECTION — split a video into visually coherent
    * runs: per-frame perceptual hashes (the mm06 machinery over the frame
    * explode, composite doc·10⁶+idx key), one doc-keyed lead() window for
    * the frame-to-frame Hamming distance, a boundary wherever it exceeds
    * `threshold` (a held shot hashes near-identically; a cut jumps). The
    * shot-boundary step every video curation pipeline runs before
    * per-scene sampling/captioning. Returns per video: n_frames, n_scenes
    * (= boundaries + 1), and the comma-joined boundary frame indices.
    *
    * Scale shape: pixels die inside the batched decode; the Hamming lead
    * and the island rollup ride ONE video-keyed exchange.
    */
  def sceneChanges(blobs: DataFrame, frameBytes: Int = 64,
      threshold: Int = 3, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = frameSample(blobs, frameBytes, every = 1, batchSize, codec)
    val frameBlobs = frames.toDF().select(
      (col("doc_id") * 1000000L + col("frame_idx")).as("doc_id"),
      lit("frame").as("format"), col("frame").as("blob"))
    val ph = perceptualHash(frameBlobs, batchSize, codec).toDF()
      .select(expr("doc_id div 1000000").as("vid"),
        (col("doc_id") % 1000000L).as("idx"), col("ph_hi"), col("ph_lo"))
    val w = Window.partitionBy(col("vid")).orderBy(col("idx"))
    val dist = ph
      .withColumn("_nhi", lead(col("ph_hi"), 1).over(w))
      .withColumn("_nlo", lead(col("ph_lo"), 1).over(w))
      .withColumn("_d",
        bit_count(col("ph_hi").bitwiseXOR(col("_nhi"))) +
          bit_count(col("ph_lo").bitwiseXOR(col("_nlo"))))
    dist.groupBy(col("vid"))
      .agg(count(lit(1)).as("n_frames"),
        (sum(when(col("_d") > threshold, 1L).otherwise(0L)) + 1L)
          .as("n_scenes"),
        array_join(array_sort(collect_list(
          when(col("_d") > threshold, col("idx") + 1))), ",")
          .as("boundaries"))
      .select(col("vid").as("doc_id"), col("n_frames"), col("n_scenes"),
        col("boundaries"))
  }

  /** KEYFRAME SELECTION — one representative frame per scene (the FIRST
    * frame of each [[sceneChanges]] run): the sampling step between shot
    * detection and captioning/embedding, cutting per-video downstream
    * cost from frames to scenes. Scene numbering is the cumulative count
    * of boundaries before each frame (one lag + one running sum on the
    * same video-keyed exchange); returns (doc_id, scene, keyframe_idx,
    * n_frames) per scene.
    */
  def keyframes(blobs: DataFrame, frameBytes: Int = 64, threshold: Int = 3,
      batchSize: Int = 64, codec: MediaCodec = StubCodec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = frameSample(blobs, frameBytes, every = 1, batchSize, codec)
    val frameBlobs = frames.toDF().select(
      (col("doc_id") * 1000000L + col("frame_idx")).as("doc_id"),
      lit("frame").as("format"), col("frame").as("blob"))
    val ph = perceptualHash(frameBlobs, batchSize, codec).toDF()
      .select(expr("doc_id div 1000000").as("vid"),
        (col("doc_id") % 1000000L).as("idx"), col("ph_hi"), col("ph_lo"))
    val w = Window.partitionBy(col("vid")).orderBy(col("idx"))
    val dist = ph
      .withColumn("_nhi", lead(col("ph_hi"), 1).over(w))
      .withColumn("_nlo", lead(col("ph_lo"), 1).over(w))
      .withColumn("_d",
        bit_count(col("ph_hi").bitwiseXOR(col("_nhi"))) +
          bit_count(col("ph_lo").bitwiseXOR(col("_nlo"))))
    val scenes = dist
      .withColumn("_pd", lag(col("_d"), 1).over(w))
      .withColumn("scene", lit(1) + sum(
        when(col("_pd") > threshold, 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    scenes.groupBy(col("vid"), col("scene"))
      .agg(min(col("idx")).as("keyframe_idx"), count(lit(1)).as("n_frames"))
      .select(col("vid").as("doc_id"), col("scene"), col("keyframe_idx"),
        col("n_frames"))
  }

  /** STREAMING VISUAL DEDUP — exact-phash dedup pumped by a stream: each
    * micro-batch decodes its own blobs to perceptual hashes (the batched
    * mm06 path, stateless, so batch and stream share it unchanged) and
    * folds (ph_hi, ph_lo) → min doc_id into a standing keeper table; a
    * re-upload arriving in ANY later batch resolves against every hash
    * seen so far without re-touching history. Folding is idempotent (min
    * is) — replays/retries are free, the SketchStream discipline. The
    * standing table is O(distinct images); bucket it through
    * MaterializedTable if that outgrows one rewrite.
    */
  def foldPhashKeepers(batch: DataFrame, tableDir: String,
      codec: MediaCodec = StubCodec): Unit = {
    val spark = batch.sparkSession
    val h = perceptualHash(batch, codec = codec).toDF()
      .groupBy(col("ph_hi"), col("ph_lo")).agg(min(col("doc_id")).as("keep_id"))
    val existing = {
      // exists-check, not a catch-all: a transient read failure must
      // surface — swallowing it would silently reset the standing keeper
      // table to this batch alone
      val p = new org.apache.hadoop.fs.Path(tableDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(tableDir)) else None
    }
    val merged = existing match {
      case None => h
      case Some(e) => e.unionByName(h)
        .groupBy(col("ph_hi"), col("ph_lo")).agg(min(col("keep_id")).as("keep_id"))
    }
    val tmp = s"$tableDir.tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(tableDir)
  }

  /** Drive a blob stream through [[foldPhashKeepers]] to completion. */
  def streamingVisualDedup(stream: DataFrame, tableDir: String,
      codec: MediaCodec = StubCodec): Unit = {
    val ckpt = java.nio.file.Files.createTempDirectory("phfold").toString
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        foldPhashKeepers(batch, tableDir, codec)
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Near-duplicate image pairs by perceptual-hash Hamming distance ≤
    * `maxHamming`: the banded-join discipline (SimHash/MinHash style) —
    * the 64 bits split into four 16-bit bands, candidates meet in a band
    * bucket, exact Hamming verifies. Pigeonhole: ≤3 differing bits cannot
    * touch all 4 bands, so every qualifying pair shares at least one band
    * — the candidate join is COMPLETE for `maxHamming` ≤ 3 (required), and
    * never all-pairs: shuffle is O(images·4) band rows, pair work only
    * inside buckets. Returns (a, b, hamming), a < b.
    *
    * HOT-BAND CAP (`spark.graft.phash.maxBandFreq`, default 0 = off):
    * bucket pair work is Σ f² over band-bucket frequencies f, and
    * degenerate content makes f planet-hot — a solid-black / blank frame
    * hashes identically across an entire corpus, so ONE bucket holds
    * O(corpus) rows and its pair loop is quadratic in the corpus (the
    * mm07 1000×-soak disk death: rotation-twin frames ran buckets
    * ~26–1000× hot and spilled 72 GB before exhausting the volume). With
    * the cap set, band buckets with more than `maxBandFreq` member rows
    * are EXCLUDED from candidate generation — the standard LSH posture.
    * This is a documented approximation, which is why it is opt-in: a
    * qualifying pair is lost only if EVERY band the two hashes share is
    * hot (degenerate twins, exactly the mass being shed); the default-off
    * path stays exact and hash-identical to the brute oracle.
    */
  def phashDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding over 4 bands is only complete for maxHamming ≤ 3: $maxHamming")
    val allBanded = hashes.select(col("doc_id"), col("ph_hi"), col("ph_lo"),
        posexplode(array(
          col("ph_lo").bitwiseAND(lit(0xffffL)),
          shiftrightunsigned(col("ph_lo"), 16).bitwiseAND(lit(0xffffL)),
          col("ph_hi").bitwiseAND(lit(0xffffL)),
          shiftrightunsigned(col("ph_hi"), 16).bitwiseAND(lit(0xffffL)))))
      .select(col("doc_id"), col("ph_hi"), col("ph_lo"),
        col("pos").as("band"), col("col").as("bv"))
    val cap = hashes.sparkSession.conf
      .get("spark.graft.phash.maxBandFreq", "0").toLong
    val banded = if (cap <= 0) allBanded else {
      // the frequency aggregate and the semi-join both key on (band, bv)
      // — the same partitioning the candidate self-join below shuffles
      // on, so the cap rides the exchange the join needs anyway
      val cold = allBanded.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("_bf")).filter(col("_bf") <= cap)
        .select(col("band"), col("bv"))
      allBanded.join(cold, Seq("band", "bv"))
    }
    val l = banded.select(col("band"), col("bv"), col("doc_id").as("a"),
      col("ph_hi").as("hi_a"), col("ph_lo").as("lo_a"))
    val r = banded.select(col("band"), col("bv"), col("doc_id").as("b"),
      col("ph_hi").as("hi_b"), col("ph_lo").as("lo_b"))
    l.join(r, Seq("band", "bv"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** 256-bit perceptual hash — the WIDE variant that removes the 64-bit
    * path's corpus ceiling. The mm07 1000× soak proved the ceiling is
    * arithmetic, not content: exact Hamming ≤ 3 over 64-bit hashes forces
    * four 16-bit bands (pigeonhole), so band buckets have only 2¹⁶
    * distinct values and occupancy grows as frames/65536 NO MATTER how
    * well-spread the hashes are — candidate pairs grow as corpus²/2¹⁶
    * (measured: 27.5M frames → ~420 rows/bucket → 4.6×10¹⁰ candidates,
    * 857 s at 100×; 275M frames → ~4.6×10¹² candidates, a projected day
    * of pair work at 1000×). Four 64-BIT bands give 2⁶⁴ values — bucket
    * occupancy stays ~1 to ~10¹⁹ frames and candidate generation is
    * output-bound again. 256 bits is also what production pHash dedup
    * uses at web scale: 64-bit codes semantically collide long before
    * the math does.
    *
    * Layout: 16×16 resize → 256 pixels thresholded against the mean; the
    * 256 bits are stored as EIGHT 32-bit words (`p0`..`p7`, low bits
    * first — word w holds pixels w·32..w·32+31 at value bits 0..31).
    * 32-bit words keep every value non-negative and below 2³¹, so the
    * DuckDB oracle can rebuild them with plain `1 << i` integer sums —
    * the same cross-engine-parity discipline as [[PHash]]'s hi/lo split
    * (a 64-bit word would need sign-bit arithmetic on both engines).
    */
  final case class PHash256(doc_id: Long,
      p0: Long, p1: Long, p2: Long, p3: Long,
      p4: Long, p5: Long, p6: Long, p7: Long)

  /** Per-blob 256-bit perceptual hash (see [[PHash256]]). */
  def perceptualHash256(blobs: DataFrame, batchSize: Int = 64,
      codec: MediaCodec = StubCodec): Dataset[PHash256] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("doc_id", "format", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, _, blob) =>
            val px = codec.resize(blob, 16, 16).map(b => (b & 0xff).toLong)
            val mean = px.sum / 256
            val w = new Array[Long](8)
            var i = 0
            while (i < 256) {
              if (px(i) > mean) w(i >> 5) |= 1L << (i & 31)
              i += 1
            }
            PHash256(id, w(0), w(1), w(2), w(3), w(4), w(5), w(6), w(7))
          }
        }
      }
  }

  /** Near-duplicate pairs over 256-bit hashes, Hamming ≤ `maxHamming`:
    * four 64-bit bands (word pairs (p0,p1) (p2,p3) (p4,p5) (p6,p7), keyed
    * as two 32-bit columns — no 64-bit band arithmetic anywhere), complete
    * for `maxHamming` ≤ 3 by the same pigeonhole as [[phashDupPairs]].
    * Band values range over 2⁶⁴, so bucket occupancy is ~1 until ~10¹⁹
    * rows — candidate generation is output-bound at any realistic corpus,
    * where the 64-bit path goes quadratic past ~10⁶ frames. Honors the
    * same opt-in `spark.graft.phash.maxBandFreq` cap (real degenerate
    * content — solid frames — still collides at ANY width). Returns
    * (a, b, hamming), a < b.
    *
    * ONE exchange, no join: the first mm21 1000× attempt used the
    * classic l/r band self-join — which materializes the fat banded
    * relation (frames·4 rows × 8 words) TWICE through shuffles, plus a
    * third pair-relation exchange for `distinct()` — and exhausted the
    * harness volume at ~70 GB. Instead: group each band bucket once
    * (`collect_list`, safe at occupancy ~1; the cap bounds degenerates),
    * enumerate i<j pairs INSIDE the bucket with nested `transform`s
    * (codegen, no shuffle), and emit a pair only in its FIRST matching
    * band — each qualifying pair appears exactly once by construction,
    * so the distinct() exchange disappears too.
    */
  def phash256DupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banding over 4 bands is only complete for maxHamming ≤ 3: $maxHamming")
    val ws = (0 to 7).map(i => col(s"p$i"))
    val banded = hashes.select(col("doc_id") +: ws :+
        posexplode(array((0 to 3).map(b =>
          struct(col(s"p${2 * b}").as("v1"), col(s"p${2 * b + 1}").as("v2"))): _*)): _*)
      .select(col("pos").as("band"), col("col.v1").as("bv1"),
        col("col.v2").as("bv2"),
        struct(col("doc_id") +: ws: _*).as("h"))
    val cap = hashes.sparkSession.conf
      .get("spark.graft.phash.maxBandFreq", "0").toLong
    val buckets = banded.groupBy(col("band"), col("bv1"), col("bv2"))
      .agg(collect_list(col("h")).as("rows"))
      .filter(size(col("rows")) > 1)
    val capped = if (cap <= 0) buckets
      else buckets.filter(size(col("rows")) <= cap)
    // i<j pairs inside SMALL buckets — generated in a projection, no join.
    // The nested transform materializes a bucket's full pair array per
    // output row, so it is bounded to buckets of ≤ 64 rows (≈ all of them
    // at 2⁶⁴ band values — measured occupancy ~1); the rare hot bucket
    // (degenerate content: an all-space frame hashes to the all-zero code
    // in every replica — the 8 g harness OOM'd on exactly that at 100×)
    // streams through a self-join instead, whose sort-merge buffer holds
    // one bucket side, not the pair product. Both branches are exact and
    // emit-once; the union is disjoint by the size split.
    val enumMax = 64
    val small = capped.filter(size(col("rows")) <= enumMax)
    val hot = capped.filter(size(col("rows")) > enumMax)
    val smallPairs = small.select(col("band"),
      explode(flatten(transform(col("rows"), (x, i) =>
        transform(slice(col("rows"), i + lit(2),
            greatest(size(col("rows")) - i - 1, lit(0))),
          y => struct(x.as("x"), y.as("y")))))).as("pr"))
      .select(col("band"), col("pr.x").as("x"), col("pr.y").as("y"))
    val hotRows = hot.select(col("band"), col("bv1"), col("bv2"),
      explode(col("rows")).as("h"))
    val hotPairs = hotRows.alias("l")
      .join(hotRows.alias("r"), Seq("band", "bv1", "bv2"))
      .filter(col("l.h.doc_id") < col("r.h.doc_id"))
      .select(col("band"), col("l.h").as("x"), col("r.h").as("y"))
    val pairs = smallPairs.unionByName(hotPairs)
      .filter(col("x.doc_id") =!= col("y.doc_id"))
    val ham = (0 to 7).map(i =>
        bit_count(col(s"x.p$i").bitwiseXOR(col(s"y.p$i"))))
      .reduce(_ + _).cast("long")
    // emit-once: a pair surfaces only in the smallest band both share —
    // band b requires some word of every band b' < b to differ
    def bandsDiffer(b: Int) = (0 until b).map(bp =>
        col(s"x.p${2 * bp}") =!= col(s"y.p${2 * bp}") ||
        col(s"x.p${2 * bp + 1}") =!= col(s"y.p${2 * bp + 1}"))
      .foldLeft(lit(true))(_ && _)
    val firstBand = (1 to 3).foldLeft(when(col("band") === 0, lit(true))) {
      (w, b) => w.when(col("band") === b, bandsDiffer(b)) }.otherwise(lit(false))
    pairs.filter(firstBand)
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b"),
        ham.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Video near-dup by shared frame hashes over the WIDE 256-bit path —
    * [[videoDupPairs]] with [[perceptualHash256]]/[[phash256DupPairs]]
    * swapped in (frames default to 256 bytes: the 16×16 resize then reads
    * every byte once). Same contract: (a, b, n_frame_matches), a < b,
    * ≥ `minShared` matching frame pairs.
    *
    * Two frame-QA exclusions keep the match signal meaningful AND kill
    * the degenerate hot buckets at scale (both restated by the mm21
    * oracle): frames with fewer than `minFrameBytes` source bytes are
    * skipped (a sub-resolution tail frame resizes to near-constant
    * pixels — a 1-byte frame is 256 copies of one value — and "matches"
    * every other short frame), and constant frames (no pixel above the
    * mean ⇒ the all-zero code) are skipped after hashing. At 100× soak
    * scale the all-zero bucket alone held tens of thousands of tail
    * frames — quadratic churn with zero dedup information.
    */
  def videoDupPairs256(blobs: DataFrame, frameBytes: Int = 256,
      maxHamming: Int = 3, minShared: Int = 3, batchSize: Int = 64,
      minFrameBytes: Int = 64, codec: MediaCodec = StubCodec): DataFrame = {
    val frames = frameSample(blobs, frameBytes, every = 1, batchSize, codec)
    val frameBlobs = frames.toDF()
      .filter(octet_length(col("frame")) >= minFrameBytes)
      .select(
        (col("doc_id") * 1000000L + col("frame_idx")).as("doc_id"),
        lit("frame").as("format"), col("frame").as("blob"))
    val hashes = perceptualHash256(frameBlobs, batchSize, codec).toDF()
      // words are 32-bit non-negative ⇒ sum > 0 ⟺ some bit set
      .filter((0 to 7).map(i => col(s"p$i")).reduce(_ + _) > 0)
    phash256DupPairs(hashes, maxHamming)
      .select(expr("a div 1000000").as("va"), expr("b div 1000000").as("vb"))
      .filter(col("va") =!= col("vb"))
      .groupBy(col("va"), col("vb"))
      .agg(count(lit(1)).as("n_frame_matches"))
      .filter(col("n_frame_matches") >= minShared)
      .select(col("va").as("a"), col("vb").as("b"), col("n_frame_matches"))
  }

  /** AUDIO FINGERPRINTING (the Shazam landmark shape): consecutive-window
    * feature pairs become compact hashes, and a clip matches a track when
    * MANY of its hashes agree at ONE CONSISTENT window offset — the
    * offset-histogram vote that makes landmark matching robust to the
    * clip starting mid-track. Features here are [[audioWindows]]'s integer
    * zero-crossing count and a 6-bit energy band per window (the
    * codec-agnostic stand-ins for spectral peaks; a real deployment swaps
    * the codec and the per-window feature, the pairing/voting dataflow is
    * unchanged): feat = zc · 64 + (energy div 16 mod 64) — 12 bits —
    * and fp = feat_j · 4096 + feat_{j+1} — 24 bits, enough entropy that
    * unrelated windows rarely collide. Exact integers, engine-portable.
    *
    * Returns (doc_id, win_idx, fp), one row per consecutive window pair.
    * Scale shape: the window features come from the batched decode; the
    * pairing is one doc-keyed lead() window.
    */
  def audioFingerprints(blobs: DataFrame, win: Int = 64, hop: Int = 32,
      codec: MediaCodec = StubCodec): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feat = expr("zero_crossings * 64 + (energy div 16) % 64")
    audioWindows(blobs, win, hop, codec = codec).toDF()
      .withColumn("_feat", feat)
      .select(col("doc_id"), col("win_idx"),
        (col("_feat") * 4096 +
          lead(col("_feat"), 1).over(
            Window.partitionBy(col("doc_id")).orderBy(col("win_idx"))))
          .cast("long").as("fp"))
      .filter(col("fp").isNotNull)
  }

  /** Match clip fingerprints against track fingerprints: hash equi-join on
    * fp, vote per (clip, track, window offset), keep each clip's best
    * (score DESC, track, offset) hypothesis. The fp join is the inverted
    * index of a production system — candidates are bounded by fp document
    * frequency, never clips × tracks; the vote is one partial-agg'd count.
    * Returns (clip_id, track_id, offset, n_matched).
    */
  def audioMatch(clipFps: DataFrame, trackFps: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = clipFps.select(col("doc_id").as("clip_id"),
      col("win_idx").as("_cj"), col("fp"))
    val t = trackFps.select(col("doc_id").as("track_id"),
      col("win_idx").as("_tj"), col("fp"))
    c.join(t, Seq("fp"))
      .groupBy(col("clip_id"), col("track_id"),
        (col("_tj") - col("_cj")).as("offset"))
      .agg(count(lit(1)).as("n_matched"))
      .withColumn("_rnk", row_number().over(
        Window.partitionBy(col("clip_id"))
          .orderBy(col("n_matched").desc, col("track_id"), col("offset"))))
      .filter(col("_rnk") === 1)
      .select(col("clip_id"), col("track_id"), col("offset"), col("n_matched"))
  }
}
