package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Multimodal-column plumbing: media (image/audio/video) live as
  * opaque `binary` columns with typed metadata alongside. Binary
  * casting and metadata extraction (q44) plus a partition-batched
  * image DECODE + feature extraction pass (q45) through the real
  * [[PgmCodec]] P5 parser — uncompressed grayscale, the one format a
  * zero-dependency environment can genuinely decode, and the shape of
  * the reference's MNIST data. Compressed formats (JPEG/audio/video)
  * would slot into the same `Array[Byte] → features` contract and
  * mapPartitions batch shape with a codec dependency.
  */
object Multimodal extends QueryModule {

  /** Deterministic fixture image for `doc_id`: dims and pixels are
    * closed-form in the id, so the DuckDB oracle can recompute the
    * expected decode output without parsing bytes — which is what
    * upgrades q45 from a rows-only gate to a full oracle entry.
    */
  def fixtureImage(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val px = Array.tabulate(w * h)(i => ((id * 31 + i * 7) % 256).toInt)
    PgmCodec.encode(w, h, px)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary-column metadata: cast text payload to binary (standing in
    // for a media blob), extract typed metadata. Fully oracle-checked.
    "q44_multimodal_meta" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast("binary").as("blob"),
          col("lang"))
        .select(col("doc_id"),
          octet_length(col("blob")).as("n_bytes"),
          ascii(col("blob").cast("string")).as("first_code"),
          md5(col("blob")).as("blob_md5"),
          col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Partition-batched image decode + feature extraction over a
    // binary column via mapPartitions — the iterator is the batch, so
    // codec init amortizes across a partition exactly as a real
    // (JPEG/audio) decoder would. The blobs are genuine P5 PGM images
    // (synthesized deterministically per doc_id, so the oracle can
    // recompute the expected output in closed form — see
    // [[fixtureImage]]); the decode is [[PgmCodec]]'s real parser:
    // header tokenizer, dims, payload bounds-check, pixel extraction.
    "q45_multimodal_features" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map(id => (id, fixtureImage(id)))
        .toDF("doc_id", "blob")
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          // per-partition codec init would happen once, here:
          batch.map { case (id, blob) =>
            val img = PgmCodec.decode(blob)
            var sum = 0L; var mn = 255; var mx = 0; var i = 0
            while (i < img.pixels.length) {
              val p = img.pixels(i)
              sum += p
              if (p < mn) mn = p
              if (p > mx) mx = p
              i += 1
            }
            (id, blob.length, img.width, img.height,
              sum.toDouble / img.pixels.length, mn, mx)
          }
        }
        .toDF("doc_id", "n_bytes", "width", "height",
          "mean_px", "min_px", "max_px")
        .orderBy(col("doc_id"))
    }),

    // Nearest-neighbor RESIZE to 8×8 through the real decoder — the
    // third leg of the decode/extract/resize/frame-sample quartet.
    // Target cell (r,c) samples source pixel (r·h/8, c·w/8); the
    // partition-batched Array[Byte] → pixels contract is identical to
    // q45's, which is where a JPEG/video thumbnailer would slot in.
    // Oracle recomputes the resized grid in closed form from doc_id.
    "q119_image_resize" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map(id => (id, fixtureImage(id)))
        .toDF("doc_id", "blob")
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          batch.map { case (id, blob) =>
            val img = PgmCodec.decode(blob)
            val out = Array.tabulate(64) { k =>
              val r = k / 8; val c = k % 8
              img.pixels((r * img.height / 8) * img.width + (c * img.width / 8))
            }
            var sum = 0L; var mn = 255; var mx = 0
            out.foreach { p => sum += p; if (p < mn) mn = p; if (p > mx) mx = p }
            (id, sum, mn, mx, out(0), out(63))
          }
        }
        .toDF("doc_id", "rsum", "rmin", "rmax", "p00", "p77")
        .orderBy(col("doc_id"))
    }),

    // FRAME-SAMPLE over a packed binary "video" column: the fixture
    // packs F fixed-size frames into one blob; every 2nd frame is
    // sliced out with substring on the BINARY column (a stride
    // `sequence` + explode — no per-frame decode needed to sample) and
    // fingerprinted byte-exactly via hex. The slicing arithmetic is the
    // real operator; a codec would only replace the fingerprint step.
    "q120_frame_sample" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val frames = (4 + id % 5).toInt
          val fsize = (16 + (id % 3) * 8).toInt
          val video = Array.tabulate(frames * fsize) { i =>
            val f = i / fsize; val j = i % fsize
            ((id * 13 + f * 101 + j * 7) % 256).toByte
          }
          (id, frames, fsize, video)
        }
        .toDF("doc_id", "n_frames", "fsize", "video")
        .select(col("doc_id"), col("fsize"), col("video"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(2))).as("f"))
        .select(col("doc_id"), col("f").cast("int").as("frame_id"),
          hex(expr("substring(video, f * fsize + 1, fsize)")).as("fhex"),
          col("fsize").cast("int").as("n_bytes"))
        .orderBy(col("doc_id"), col("frame_id"))
    }),

    // AUDIO leg of the multimodal triad: a PCM8-style mono payload
    // (fixture-synthesized, like q120's video) framed into 16-sample
    // windows sliced with binary substring, each window's RMS and peak
    // computed from the actual BYTES (hex-unpack → centered samples) —
    // the window framing + feature extraction a loudness/VAD pass
    // runs; a real codec would only replace the byte→sample decode.
    // All window features are integer-derived, so sqrt/avg are
    // bit-identical across engines.
    "q131_audio_window_rms" -> ((s, d) => {
      import s.implicits._
      val W = 16
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = (64 + (id % 5) * 16).toInt
          val audio = Array.tabulate(n)(i => ((id * 17 + i * 11) % 256).toByte)
          (id, n / W, audio)
        }
        .toDF("doc_id", "n_win", "audio")
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_win") - 1)).as("w"),
          hex(expr(s"substring(audio, w * $W + 1, $W)")).as("whex"))
        .select(col("doc_id"), col("w").cast("int").as("window_id"),
          explode(sequence(lit(0), lit(W - 1))).as("j"), col("whex"))
        .select(col("doc_id"), col("window_id"),
          (expr("conv(substr(whex, j * 2 + 1, 2), 16, 10)").cast("double")
            - 128).as("v"))
        .groupBy(col("doc_id"), col("window_id"))
        .agg(round(sqrt(avg(col("v") * col("v"))), 6).as("rms"),
          max(abs(col("v"))).cast("int").as("peak"))
        .orderBy(col("doc_id"), col("window_id"))
    }),

    // Media payload dedup — the multimodal leg of the dedup family:
    // re-crawled/mirrored images collapse to one representative per
    // decoded content. The fixture simulates re-crawls by generating
    // each doc's image from doc_id % 64 (so ~64 distinct contents),
    // and the dedup key is the DECODED content fingerprint
    // (w, h, pixel-sum) from the real PgmCodec parse — byte-identical
    // files are the easy case; decoding first also catches re-encoded
    // duplicates, which is why production image dedup keys on content
    // (pHash et al), not file bytes. One decode pass + one
    // fingerprint-keyed groupBy, no pairwise stage.
    "q143_media_dedup" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id")).as[Long]
        .map(id => (id, fixtureImage(id % 64)))
        .toDF("doc_id", "blob")
        .as[(Long, Array[Byte])]
        .mapPartitions { batch =>
          batch.map { case (id, blob) =>
            val img = PgmCodec.decode(blob)
            var sum = 0L; var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i); i += 1 }
            (id, img.width, img.height, sum)
          }
        }
        .toDF("doc_id", "w", "h", "px_sum")
        .groupBy(col("w"), col("h"), col("px_sum"))
        .agg(count(lit(1)).cast("int").as("n_copies"),
          min(col("doc_id")).as("rep_id"))
        .orderBy(col("w"), col("h"), col("px_sum"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q44_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(ascii(text) AS INT) AS first_code,
        |  md5(text) AS blob_md5,
        |  lang
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q45's twin recomputes the decode output in closed form from
    // doc_id (the fixture-image construction): dims from the id,
    // pixel stats over generate_series, n_bytes = P5 header length
    // ("P5\n" + "w h\n" + "255\n") + w*h payload.
    "q45_multimodal_features" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    8 + doc_id % 9 AS w,
        |    8 + doc_id % 7 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, (doc_id * 31 + i * 7) % 256 AS p
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) t)
        |SELECT doc_id,
        |  CAST(3 + LENGTH(CAST(w AS VARCHAR)) + 1 + LENGTH(CAST(h AS VARCHAR))
        |    + 1 + 4 + w * h AS INT) AS n_bytes,
        |  CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  CAST(SUM(p) AS DOUBLE) / COUNT(*) AS mean_px,
        |  CAST(MIN(p) AS INT) AS min_px,
        |  CAST(MAX(p) AS INT) AS max_px
        |FROM px
        |GROUP BY doc_id, w, h
        |ORDER BY doc_id""".stripMargin,

    // resized pixel (r,c) = source pixel at (r·h/8, c·w/8), and source
    // pixel i = (id·31 + i·7) % 256 — the whole resize recomputed in
    // closed form, no byte parsing needed
    "q119_image_resize" ->
      """WITH g AS (
        |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
        |  FROM documents),
        |px AS (
        |  SELECT g.doc_id, rr.r, cc.c,
        |    ((g.doc_id*31 + (((rr.r*g.h)//8)*g.w + ((cc.c*g.w)//8))*7) % 256) AS v
        |  FROM g CROSS JOIN range(8) rr(r) CROSS JOIN range(8) cc(c))
        |SELECT doc_id, CAST(SUM(v) AS BIGINT) AS rsum,
        |  CAST(MIN(v) AS INT) AS rmin, CAST(MAX(v) AS INT) AS rmax,
        |  CAST(MAX(CASE WHEN r=0 AND c=0 THEN v END) AS INT) AS p00,
        |  CAST(MAX(CASE WHEN r=7 AND c=7 THEN v END) AS INT) AS p77
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // byte j of frame f = (id·13 + f·101 + j·7) % 256; the sampled
    // frames' uppercase-hex fingerprints must match Spark's
    // hex(substring(video, ...)) byte for byte. range() can't take
    // lateral column args in DuckDB, so fixed max ranges + filters.
    "q120_frame_sample" ->
      """WITH frames AS (
        |  SELECT d.doc_id, f.f, CAST(16 + (d.doc_id % 3) * 8 AS INT) AS n_bytes,
        |    string_agg(format('{:02X}', (d.doc_id*13 + f.f*101 + j.j*7) % 256),
        |               '' ORDER BY j.j) AS fhex
        |  FROM documents d
        |  CROSS JOIN range(9) f(f)
        |  CROSS JOIN range(32) j(j)
        |  WHERE f.f < 4 + d.doc_id % 5 AND j.j < 16 + (d.doc_id % 3) * 8
        |  GROUP BY d.doc_id, f.f)
        |SELECT doc_id, CAST(f AS INT) AS frame_id, fhex, n_bytes
        |FROM frames WHERE f % 2 = 0 ORDER BY doc_id, frame_id""".stripMargin,

    // samples recomputed in closed form from doc_id (the fixture
    // synthesis); all per-window terms are integers, so AVG and sqrt
    // are exact/deterministic on both engines
    "q131_audio_window_rms" ->
      """WITH w AS (
        |  SELECT doc_id, 64 + (doc_id % 5) * 16 AS n FROM documents),
        |sm AS (
        |  SELECT doc_id, i // 16 AS window_id,
        |    CAST((doc_id * 17 + i * 11) % 256 AS DOUBLE) - 128 AS v
        |  FROM w, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) t)
        |SELECT doc_id, CAST(window_id AS INT) AS window_id,
        |  ROUND(sqrt(AVG(v * v)), 6) AS rms,
        |  CAST(MAX(ABS(v)) AS INT) AS peak
        |FROM sm GROUP BY doc_id, window_id
        |ORDER BY doc_id, window_id""".stripMargin,

    // decoded-content fingerprint recomputed in closed form from
    // m = doc_id % 64 (the re-crawl simulation): dims from m, pixel
    // sum over generate_series — the twin of decoding the real bytes
    "q143_media_dedup" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 64 AS m,
        |    8 + (doc_id % 64) % 9 AS w, 8 + (doc_id % 64) % 7 AS h
        |  FROM documents),
        |fp AS (
        |  SELECT doc_id, w, h,
        |    CAST(SUM((m * 31 + i * 7) % 256) AS BIGINT) AS px_sum
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS i) t
        |  GROUP BY doc_id, w, h)
        |SELECT CAST(w AS INT) AS w, CAST(h AS INT) AS h, px_sum,
        |  CAST(COUNT(*) AS INT) AS n_copies, MIN(doc_id) AS rep_id
        |FROM fp GROUP BY w, h, px_sum ORDER BY w, h, px_sum""".stripMargin
  )
}
