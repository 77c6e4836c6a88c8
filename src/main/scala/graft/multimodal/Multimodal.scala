package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata structs, with
  * decode / feature-extract / resize / frame-sample as per-partition
  * batch transforms.
  *
  * Raster formats decode FOR REAL — Netpbm by hand-parse, PNG/JPEG/BMP/
  * GIF through the JDK's own `javax.imageio` readers ([[Codecs]]); only
  * audio-codec/video formats (MP3/AAC/H.264), which the JDK cannot
  * decode, fall back to the clearly-marked deterministic stub below.
  * Everything Spark-side — schema, batching, partition sizing, the typed
  * mapPartitions shape — is identical across real and stubbed payloads;
  * on a cluster with codec libraries you extend the dispatch, nothing
  * else changes.
  */
object Multimodal {

  /** Typed metadata accompanying every media payload. */
  final case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                             width: Int, height: Int)

  final case class MediaFeature(media_id: Long, kind: String,
                                feature: Array[Double])

  // ======================================================================
  // STUB — deterministic fake decoder. A real deployment replaces this with
  // an image/audio codec call; the signature (bytes → fixed-length feature
  // vector) and everything around it stay identical.
  // ======================================================================
  private[multimodal] def stubDecode(payload: Array[Byte], dim: Int): Array[Double] = {
    // Position-salted per-byte hash, accumulated as EXACT integers and
    // divided once at the end: deterministic regardless of byte visit
    // order/association, and expressible in checked-64-bit SQL (no wrap-
    // around multiply), so the driver's DuckDB oracle can recompute it.
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val c = payload(i) & 0xff
      val h = ((c + 1L) * 2654435761L + (i + 1L) * 40503L) % 1000000007L
      acc(i % dim) += h & 0xffffL
      i += 1
    }
    acc.map(_ / 65535.0)
  }

  /** Attach metadata to a binary column: `(media_id, payload)` → adds byte
    * length and container dimensions. Known magics (PPM/PGM/WAV and the
    * imageio rasters PNG/JPEG/BMP/GIF) get REAL header-parsed dimensions
    * via [[Codecs.sniffDims]] — the same parse [[decodeMedia]] dispatches
    * on, so the two always agree; only unknown containers (audio-codec/
    * video formats the JDK cannot read) fall back to the deterministic
    * length-derived stub shape. Header
    * sniffing is inherently imperative byte walking, so it runs as a
    * compact UDF that touches only the header bytes; `byte_len` stays a
    * native codegen'd `length`.
    */
  def withMeta(media: DataFrame, kind: String): DataFrame = {
    val dims = udf((payload: Array[Byte]) =>
      Codecs.sniffDims(payload) match {
        case Some((w, h, _, _)) => (w, h)
        case None =>
          val len = payload.length.toLong
          ((len % 64 + 1).toInt, (len / 64 % 64 + 1).toInt)
      })
    media
      .withColumn("kind", lit(kind))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("_wh", dims(col("payload")))
      .withColumn("width", col("_wh._1"))
      .withColumn("height", col("_wh._2"))
      .drop("_wh")
  }

  /** Feature extraction as a typed per-partition batch transform — the
    * Scala analogue of `mapInPandas`: each task processes its partition as
    * an iterator (bounded memory, no per-row UDF overhead), emitting fixed-
    * width feature vectors. Partition sizing upstream (`repartition` by
    * bytes) keeps batches within executor memory at 100 TB.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          MediaFeature(id, kind, stubDecode(payload, dim))
        }
      }
  }

  /** One decoded media payload, reduced to exact integer statistics.
    * Integer sums/extrema are deterministic under any partition order and
    * SQL-recomputable, so the REAL decode path is oracle-checkable (q58).
    */
  final case class MediaDecoded(media_id: Long, container: String,
                                width: Int, height: Int, channels: Int,
                                sample_rate: Int, n_values: Long,
                                v_sum: Long, v_min: Long, v_max: Long)

  /** REAL decode: per-partition batch transform that sniffs the container
    * magic and runs the pure-JVM codec ([[Codecs]] — PGM/PPM raster parse,
    * RIFF/WAVE chunk walk + PCM16). Only unknown containers fall back to
    * the stub hash (`container = "unknown"` marks them honestly).
    *
    * Same 100 TB shape as [[extractFeatures]]: iterator-at-a-time within a
    * partition — bounded memory, no per-row UDF overhead, and upstream
    * byte-based repartitioning controls batch size.
    */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaDecoded] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          def stats(vs: Array[Int]): (Long, Long, Long, Long) = {
            var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
            var j = 0
            while (j < vs.length) {
              s += vs(j); if (vs(j) < mn) mn = vs(j); if (vs(j) > mx) mx = vs(j)
              j += 1
            }
            if (vs.isEmpty) (0L, 0L, 0L, 0L) else (vs.length.toLong, s, mn, mx)
          }
          try Codecs.sniff(payload) match {
            case c @ ("ppm" | "pgm") =>
              val img = Codecs.decodeNetpbm(payload)
              val (n, s, mn, mx) = stats(img.pixels)
              MediaDecoded(id, c, img.width, img.height, img.channels, 0,
                n, s, mn, mx)
            case "wav" =>
              val au = Codecs.decodeWav(payload)
              val (n, s, mn, mx) = stats(au.samples)
              MediaDecoded(id, "wav", 0, 0, au.nChannels, au.sampleRate,
                n, s, mn, mx)
            case c if Codecs.ImageIoFormats(c) =>
              // REAL decode through the JDK's own imageio readers —
              // PNG/BMP/GIF losslessly (q137 oracle-pins the round trip),
              // JPEG deterministically for this JDK (spec-tested)
              val img = Codecs.decodeImageIO(payload)
              val (n, s, mn, mx) = stats(img.pixels)
              MediaDecoded(id, c, img.width, img.height, img.channels, 0,
                n, s, mn, mx)
            case _ =>
              // audio-codec/video formats (MP3/AAC/H.264): the JDK has no
              // decoder — keep the documented stub hash as the feature
              val f = stubDecode(payload, 4)
              MediaDecoded(id, "unknown", 0, 0, 0, 0, payload.length.toLong,
                f.map(v => (v * 65535.0).round).sum, 0L, 0L)
          } catch {
            // matching magic + malformed body (truncated raster, corrupt
            // chunk): ONE bad payload must not abort a corpus-scale job —
            // emit an explicit error row callers can filter or route
            case scala.util.control.NonFatal(_) =>
              MediaDecoded(id, "error", 0, 0, 0, 0, payload.length.toLong,
                0L, 0L, 0L)
          }
        }
      }
  }

  /** One resized raster: integer stats of the target raster (q58/q77
    * discipline — SQL-recomputable) plus the re-encoded Netpbm payload for
    * downstream stages.
    */
  final case class MediaResized(media_id: Long, container: String,
                                width: Int, height: Int, channels: Int,
                                n_values: Long, v_sum: Long, v_min: Long,
                                v_max: Long, payload: Array[Byte])

  /** Nearest-neighbor resize over REAL decoded rasters — the standard
    * image-normalization step of a multimodal training pipeline (every
    * image to a fixed (outW, outH) before feature extraction / hashing).
    * Target pixel (x, y, c) samples source
    * ((y·srcH)/outH, (x·srcW)/outW, c) with integer floor division —
    * deterministic, channel-preserving, and exactly replayable in SQL, so
    * the driver query's oracle recomputes the resized raster from the
    * generation formulas (q82). Per-partition batch transform like
    * [[decodeMedia]]; non-raster containers become explicit `"unknown"`
    * rows and malformed rasters `"error"` rows — never aborts.
    */
  def resizeNetpbm(spark: SparkSession, media: DataFrame,
                   outW: Int, outH: Int): Dataset[MediaResized] = {
    import spark.implicits._
    require(outW > 0 && outH > 0, "target dims must be positive")
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          try Codecs.decodeRaster(payload) match {
            case Some((c, img)) =>
              val ch = img.channels
              val tgt = new Array[Int](outW * outH * ch)
              var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
              var y = 0
              while (y < outH) {
                val sy = y * img.height / outH
                var x = 0
                while (x < outW) {
                  val sx = x * img.width / outW
                  var cc = 0
                  while (cc < ch) {
                    val p = img.pixels((sy * img.width + sx) * ch + cc)
                    tgt((y * outW + x) * ch + cc) = p
                    s += p; if (p < mn) mn = p; if (p > mx) mx = p
                    cc += 1
                  }
                  x += 1
                }
                y += 1
              }
              // netpbm sources re-encode netpbm; imageio sources PNG
              // (lossless) — both re-decodable by this same dispatch
              val enc =
                if (c == "ppm" || c == "pgm")
                  Codecs.encodeNetpbm(outW, outH, ch, tgt)
                else Codecs.encodePng(outW, outH, ch, tgt)
              MediaResized(id, c, outW, outH, ch, tgt.length.toLong, s, mn,
                mx, enc)
            case None =>
              MediaResized(id, "unknown", 0, 0, 0, payload.length.toLong,
                0L, 0L, 0L, Array.emptyByteArray)
          } catch {
            case scala.util.control.NonFatal(_) =>
              MediaResized(id, "error", 0, 0, 0, payload.length.toLong,
                0L, 0L, 0L, Array.emptyByteArray)
          }
        }
      }
  }

  /** Real audio features for one WAV payload. Integer fields follow the
    * q58 exact-stat discipline (oracle-able); `band_energies`/`peak_band`
    * are float DFT results, spec-tested against synthesized sinusoids.
    */
  final case class AudioFeat(media_id: Long, sample_rate: Int,
                             n_samples: Long, sum_sq: Long,
                             zero_crossings: Long,
                             band_energies: Array[Double], peak_band: Int)

  /** REAL audio feature extraction over PCM16 WAV payloads: exact signal
    * energy (Σ s²) and zero-crossing count (both integer — the q139
    * oracle replays them), plus `nBands` linearly-spaced spectral band
    * energies via the Goertzel recurrence (O(n·bands), no FFT library)
    * with `peak_band` = argmax (smallest index on ties). Non-WAV
    * payloads emit nothing; malformed WAVs a sample_rate = -1 error row.
    */
  def audioFeatures(spark: SparkSession, media: DataFrame,
                    nBands: Int = 8): Dataset[AudioFeat] = {
    import spark.implicits._
    require(nBands > 0, "nBands must be positive")
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          if (Codecs.sniff(payload) != "wav") Iterator.empty
          else try {
            val au = Codecs.decodeWav(payload)
            val s = au.samples
            var sumSq = 0L; var zc = 0L
            var j = 0
            while (j < s.length) {
              sumSq += s(j).toLong * s(j)
              if (j > 0 && s(j - 1).toLong * s(j) < 0) zc += 1
              j += 1
            }
            val bands = new Array[Double](nBands)
            var b = 0
            while (b < nBands) {
              // Goertzel power at the band-center frequency
              val freq = au.sampleRate * 0.5 * (b + 0.5) / nBands
              val w = 2.0 * math.Pi * freq / au.sampleRate
              val coeff = 2.0 * math.cos(w)
              var s1 = 0.0; var s2 = 0.0
              var k = 0
              while (k < s.length) {
                val s0 = s(k) + coeff * s1 - s2
                s2 = s1; s1 = s0
                k += 1
              }
              bands(b) =
                (s1 * s1 + s2 * s2 - coeff * s1 * s2) /
                  math.max(s.length.toLong * s.length, 1L)
              b += 1
            }
            var peak = 0
            b = 1
            while (b < nBands) {
              if (bands(b) > bands(peak)) peak = b
              b += 1
            }
            Iterator.single(AudioFeat(id, au.sampleRate, s.length.toLong,
              sumSq, zc, bands, peak))
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.single(AudioFeat(id, -1, payload.length.toLong,
                0L, 0L, Array.empty, -1))
          }
        }
      }
  }

  /** One decoded, sampled frame of a multi-image container, reduced to
    * the q58 exact-integer-stat discipline.
    */
  final case class FrameDecoded(media_id: Long, frame_idx: Int,
                                container: String, width: Int, height: Int,
                                n_values: Long, v_sum: Long, v_min: Long,
                                v_max: Long)

  /** REAL frame sampling over decodable multi-image containers
    * (multi-page TIFF, animated GIF — [[Codecs.decodeFrames]]): keep
    * every `stride`-th frame, reduce each to exact integer stats. The
    * decoded-container twin of the byte-chunk [[sampleFrames]] (which
    * remains the path for codec-class video the JDK cannot read).
    * Non-raster payloads emit nothing; malformed rasters emit a single
    * frame_idx = -1 "error" row, never abort.
    */
  def decodeFrameStats(spark: SparkSession, media: DataFrame,
                       stride: Int): Dataset[FrameDecoded] = {
    import spark.implicits._
    require(stride > 0, "stride must be positive")
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val c = Codecs.sniff(payload)
          if (c == "unknown" || c == "wav") Iterator.empty
          else try {
            val frames = c match {
              case "tiff" | "gif" => Codecs.decodeFrames(payload)
              case _ => Codecs.decodeRaster(payload).map(_._2).toSeq
            }
            frames.zipWithIndex.iterator.collect {
              case (img, f) if f % stride == 0 =>
                var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
                var j = 0
                while (j < img.pixels.length) {
                  val v = img.pixels(j)
                  s += v; if (v < mn) mn = v; if (v > mx) mx = v
                  j += 1
                }
                FrameDecoded(id, f, c, img.width, img.height,
                  img.pixels.length.toLong, s, mn, mx)
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.single(FrameDecoded(id, -1, "error", 0, 0,
                payload.length.toLong, 0L, 0L, 0L))
          }
        }
      }
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frameBytes` chunks, keep every `stride`-th.
    *
    * Memory shape matters more than the plan shape here: exploding frame
    * INDICES and slicing afterwards would carry the full payload on every
    * exploded row — a 1 GB video sampled at 1000 frames materializes ~1 TB
    * of intermediate rows. Instead the kept frames are sliced into an
    * array of (frame_idx, frame) structs INSIDE the generator expression,
    * so the rows leaving the Generate carry only their own `frameBytes`
    * slice; `payload` never survives past the projection (and is not in
    * the output schema).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    val keptIdx = filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => pmod(i, lit(stride)) === 0)
    val frames = transform(keptIdx, i =>
      struct(i.cast("int").as("frame_idx"),
        col("payload").substr(i.cast("int") * frameBytes + 1, lit(frameBytes))
          .as("frame")))
    val keep = media.columns.filterNot(_ == "payload").map(col)
    media
      .select(keep :+ explode(frames).as("_f"): _*)
      .withColumn("frame_idx", col("_f.frame_idx"))
      .withColumn("frame", col("_f.frame"))
      .drop("_f")
  }

  // ------------------------------------------------- perceptual hashing --

  /** `ahash` is the human/oracle-readable bit string; `bits` packs the
    * same 64 bits into a long (bit j = grid cell j) so the pair join and
    * hamming verification run on 8-byte integers in whole-stage codegen
    * instead of 64-char strings — measured 30× cheaper at sf0.1.
    */
  final case class MediaHash(media_id: Long, ahash: String, bits: Long)

  /** Perceptual average-hash (aHash) over REAL decoded rasters: sample the
    * image on a fixed 8×8 grid (nearest pixel, first channel as gray),
    * threshold each sample against the 64-sample mean, emit the 64 bits as
    * a '0'/'1' string. INTEGER-only arithmetic throughout — the mean
    * compare is `pixel·64 > sum` — so any engine (incl. the q77 DuckDB
    * oracle) recomputes it exactly. A constant brightness shift moves
    * every sample and the mean together, so aHash is invariant to it away
    * from wraparound: that is what makes it a NEAR-duplicate signal for
    * re-encoded/brightness-tweaked images rather than a byte checksum.
    * Non-image and malformed payloads yield no hash row (corpus jobs
    * filter, not abort).
    */
  def aHash(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          try Codecs.decodeRaster(payload) match {
            case Some((_, img)) =>
              val samples = new Array[Int](64)
              var sum = 0L
              var j = 0
              while (j < 64) {
                val y = (j / 8) * img.height / 8
                val x = (j % 8) * img.width / 8
                val p = img.pixels((y * img.width + x) * img.channels)
                samples(j) = p; sum += p
                j += 1
              }
              val sb = new java.lang.StringBuilder(64)
              var bits = 0L
              j = 0
              while (j < 64) {
                if (samples(j) * 64L > sum) { sb.append('1'); bits |= 1L << j }
                else sb.append('0')
                j += 1
              }
              Iterator.single(MediaHash(id, sb.toString, bits))
            case _ => Iterator.empty
          } catch {
            case scala.util.control.NonFatal(_) => Iterator.empty
          }
        }
      }
  }

  /** Banded near-duplicate pairs on perceptual hashes: split the 64-bit
    * hash into `nBands` equal bit fields, candidates share at least one
    * band (lossless for hamming < nBands by pigeonhole — the same blocking
    * scheme as the SimHash text path), exact hamming verifies. The join
    * shuffles only same-band groups, never the image corpus cross itself.
    *
    * Everything runs on the packed long: band keys are shift+mask, the
    * verification is one `bit_count(xor)` — all codegen'd 8-byte ops (the
    * first cut compared 64-char strings per pair and cost 30× more).
    */
  def perceptualDupPairs(hashes: DataFrame, maxHamming: Int = 6,
                         nBands: Int = 4, idCol: String = "media_id",
                         bitsCol: String = "bits",
                         maxBucketSize: Int = 4096): DataFrame = {
    require(64 % nBands == 0, s"nBands $nBands must divide 64")
    val bandBits = 64 / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val banded = hashes
      .select(col(idCol).as("id"), col(bitsCol).as("b"))
      .select(col("id"), col("b"),
        explode(array((0 until nBands).map(bd => struct(
          lit(bd).as("band"),
          shiftrightunsigned(col("b"), bd * bandBits)
            .bitwiseAND(lit(mask)).as("key"))): _*)).as("_bk"))
      .select(col("id"), col("b"),
        col("_bk.band").as("band"), col("_bk.key").as("key"))
    // hot (band, key) buckets star to the min-id member — identical
    // images have identical aHashes in every band (the
    // Dedup.minhashLshPairs cap; a re-encoded thumbnail duplicated across
    // a crawl is exactly this shape)
    val cand = graft.operators.Dedup
      .cappedSelfJoin(banded, Seq("band", "key"), "id", "b", maxBucketSize)
      .select(col("id_a"), col("id_b"), col("b_a"), col("b_b"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("b_a").bitwiseXOR(col("b_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
