package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset plumbing (north-star): image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample stages a training
  * pipeline runs over them.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC STUB ([[Codec.decodeFeatures]]) — it derives features
  * from the payload bytes with pure arithmetic. Everything AROUND the
  * kernel is the real Spark shape and is what these queries verify:
  * - assets carry `payload: binary` + `meta: struct` (never strings);
  * - the decode stage projects ONLY (asset_id, payload) into a
  *   `Dataset.mapPartitions` (narrow schema into the non-codegen stage,
  *   column pruning does the rest), batch-iterating per partition the
  *   way a real JNI/codec call would amortize setup;
  * - frame sampling is an `explode` over a computed index range —
  *   rows-per-asset fan-out stays in the engine, not driver loops;
  * - resize is metadata arithmetic + payload slice.
  *
  * Because the stub is arithmetic over bytes, and payloads are built
  * deterministically from `documents.text` (UTF-8), the DuckDB oracle
  * replicates every stage from the text column — so even the
  * mapPartitions path is hash-checked end to end.
  *
  * Scale: assets tables are the one place "row = megabytes" is normal.
  * The plans here only ever move (id, payload) into the decode stage and
  * aggregate fixed-width features out of it; metadata-only queries never
  * touch `payload` (check `.explain` shows the binary column pruned).
  */
object Multimodal {

  /** Deterministic fake-asset construction from `documents` — the
    * testbed's stand-in for a real asset table. kind cycles by doc_id;
    * meta is derived arithmetically; payload is the UTF-8 text bytes. */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 12).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 40).cast("int").as("duration_ms"),
        col("source").as("format")).as("meta"))

  object Codec {
    /** STUB decode kernel — stands in for an image/audio decoder.
      * Features from payload bytes (all exact integer arithmetic):
      *   f0 = byte count, f1 = sum of bytes, f2 = polynomial hash,
      *   f3 = count of 'space' bytes (0x20).
      * A real implementation would decode pixels/samples here; the
      * signature (bytes in, fixed-width features out) is the contract. */
    def decodeFeatures(payload: Array[Byte]): Array[Long] = {
      var sum = 0L; var hash = 7L; var spaces = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xffL
        sum += b
        hash = (hash * 31 + b) % 1000000007L
        if (b == 0x20L) spaces += 1
        i += 1
      }
      Array(payload.length.toLong, sum, hash, spaces)
    }
  }

  final case class RawAsset(asset_id: Long, payload: Array[Byte])
  final case class Decoded(asset_id: Long, f0: Long, f1: Long, f2: Long, f3: Long)

  /** The decode stage: narrow projection -> mapPartitions -> typed rows.
    * Partition-level iteration is where batch decode amortization lives
    * (codec init once per partition, not per row). */
  def decode(assets: DataFrame): Dataset[Decoded] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).as[RawAsset]
      .mapPartitions { it =>
        // Per-partition setup for a real codec would go here.
        it.map { a =>
          val f = Codec.decodeFeatures(a.payload)
          Decoded(a.asset_id, f(0), f(1), f(2), f(3))
        }
      }
  }

  /** Batched-inference plumbing: the Scala analog of the `mapInPandas`
    * batch contract — rows grouped into fixed-size batches inside each
    * partition, the model invoked once per BATCH (where a real pipeline
    * amortizes GPU transfer / graph dispatch), per-row outputs zipped
    * back. Outputs must be row-deterministic (batching is a throughput
    * shape, never a semantic boundary) — which is exactly what makes the
    * stage oracle-checkable. The batch-invocation count itself is pinned
    * by MultimodalSpec via an accumulator.
    */
  def batchInfer(assets: DataFrame, batchSize: Int)(
      model: Seq[Array[Byte]] => Seq[Long]): Dataset[(Long, Long)] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("payload")).as[RawAsset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val outs = model(batch.map(_.payload))
          batch.map(_.asset_id).zip(outs)
        }
      }
  }

  /** STUB batch model: per-payload polynomial signature (mult 37). */
  def stubModel(batch: Seq[Array[Byte]]): Seq[Long] =
    batch.map { bytes =>
      var h = 7L; var i = 0
      while (i < bytes.length) { h = (h * 37 + (bytes(i) & 0xffL)) % 1000000007L; i += 1 }
      h
    }

  private val sqlBytes = "[CAST(unicode(ch) AS BIGINT) for ch in split(text, '')]"

  val all: Seq[Q] = Seq(

    // Metadata-only catalog stats: the payload column must never be read
    // (nested-schema pruning + column pruning).
    Q("qm01_asset_catalog",
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |       COUNT(*) AS n,
        |       CAST(SUM(n_chars % 64 + 16) AS BIGINT) AS sum_width,
        |       CAST(MAX(n_chars * 40) AS BIGINT) AS max_duration_ms
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin) { (s, dir) =>
      assets(s, dir)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.width").cast("long")).as("sum_width"),
          max(col("meta.duration_ms").cast("long")).as("max_duration_ms"))
        .orderBy("kind")
    },

    // The mapPartitions decode stage, hash-checked: DuckDB recomputes the
    // same features from the text the payload was built from.
    Q("qm02_decode_features",
      s"""SELECT doc_id AS asset_id,
         |       CAST(length(text) AS BIGINT) AS f0,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT), $sqlBytes), (a, x) -> a + x) AS f1,
         |       list_reduce(list_prepend(CAST(7 AS BIGINT), $sqlBytes), (a, x) -> (a * 31 + x) % 1000000007) AS f2,
         |       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS f3
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      decode(assets(s, dir)).toDF().orderBy("asset_id")
    },

    // Frame sampling: one row per sampled frame (every 25th frame of a
    // 25 fps clip = 1 per second of duration), engine-side fan-out with a
    // per-frame payload-slice checksum standing in for the frame grab.
    Q("qm03_frame_sample",
      s"""WITH v AS (SELECT doc_id AS asset_id, text, n_chars * 40 AS duration_ms
         |           FROM documents WHERE doc_id % 3 = 2 AND n_chars * 40 >= 1000),
         |f AS (SELECT asset_id, text,
         |             unnest(range(0, duration_ms // 1000)) AS frame_idx
         |      FROM v)
         |SELECT asset_id, frame_idx,
         |       CAST(unicode(substr(text, CAST(1 + (frame_idx * 25) % length(text) AS INT), 1)) AS BIGINT) AS frame_probe
         |FROM f ORDER BY asset_id, frame_idx""".stripMargin) { (s, dir) =>
      val nFrames = expr("meta.duration_ms div 1000").cast("long")
      assets(s, dir)
        .filter(col("kind") === "video" && nFrames >= 1)
        .select(col("asset_id"), col("payload"),
          explode(sequence(lit(0L), nFrames - 1L)).as("frame_idx"))
        .select(col("asset_id"), col("frame_idx"),
          // Probe byte of the sampled frame: payload[(idx*25) mod len],
          // via a 1-byte binary slice decoded through ascii (payloads are
          // UTF-8 text in the testbed; a real frame grab replaces this).
          ascii(expr("CAST(substring(payload, CAST(1 + (frame_idx * 25) % length(payload) AS INT), 1) AS STRING)"))
            .cast("long").as("frame_probe"))
        .orderBy("asset_id", "frame_idx")
    },

    // Batched inference over payloads (batch size 64), hash-checked:
    // row-deterministic outputs, batch grouping pinned by MultimodalSpec.
    Q("qm05_batch_embed",
      s"""SELECT doc_id AS asset_id,
         |       list_reduce(list_prepend(CAST(7 AS BIGINT), $sqlBytes),
         |                   (a, x) -> (a * 37 + x) % 1000000007) AS sig
         |FROM documents ORDER BY asset_id""".stripMargin) { (s, dir) =>
      batchInfer(assets(s, dir), 64)(stubModel)
        .toDF("asset_id", "sig")
        .orderBy("asset_id")
    },

    // Resize: pure metadata arithmetic + payload truncation to the new
    // byte budget — scale factors emitted as e6 integers.
    Q("qm04_resize_to_thumbnail",
      """SELECT doc_id AS asset_id,
        |       CAST(n_chars % 64 + 16 AS BIGINT) AS src_w,
        |       CAST(n_chars % 48 + 12 AS BIGINT) AS src_h,
        |       CAST(floor(32.0 * 1000000 / (n_chars % 64 + 16)) AS BIGINT) AS scale_x_e6,
        |       CAST(floor(32.0 * 1000000 / (n_chars % 48 + 12)) AS BIGINT) AS scale_y_e6,
        |       CAST(least(length(text), 32 * 32) AS BIGINT) AS thumb_bytes
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY asset_id""".stripMargin) { (s, dir) =>
      assets(s, dir)
        .filter(col("kind") === "image")
        .select(col("asset_id"),
          col("meta.width").cast("long").as("src_w"),
          col("meta.height").cast("long").as("src_h"),
          floor(lit(32.0) * 1000000 / col("meta.width")).cast("long").as("scale_x_e6"),
          floor(lit(32.0) * 1000000 / col("meta.height")).cast("long").as("scale_y_e6"),
          least(length(col("payload")), lit(32 * 32)).cast("long").as("thumb_bytes"))
        .orderBy("asset_id")
    },

    // Content-hash dedup over the binary payloads — the multimodal
    // analogue of qn01/qn02, and the one dedup where hashing-before-
    // shuffling is mandatory rather than an optimization: asset rows are
    // megabytes, so the groupBy key is sha2(payload) computed map-side
    // and only (kind, 32-byte digest, count, length) ever shuffles — the
    // payload column never moves. Emits per-kind dedup accounting
    // including the bytes a dedup pass would reclaim.
    Q("qm06_payload_dedup",
      """WITH a AS (SELECT (['image','audio','video'])[doc_id % 3 + 1] AS kind,
        |                  sha256(text) AS sha, strlen(text) AS bytes
        |           FROM documents),
        |g AS (SELECT kind, sha, COUNT(*) AS cnt, MIN(bytes) AS bytes
        |      FROM a GROUP BY 1, 2)
        |SELECT kind, CAST(SUM(cnt) AS BIGINT) AS n_assets,
        |       COUNT(*) AS n_unique,
        |       CAST(SUM((cnt - 1) * bytes) AS BIGINT) AS dup_bytes
        |FROM g GROUP BY kind ORDER BY kind""".stripMargin) { (s, dir) =>
      assets(s, dir)
        .select(col("kind"), sha2(col("payload"), 256).as("sha"),
          length(col("payload")).as("bytes"))
        .groupBy("kind", "sha")
        .agg(count(lit(1)).as("cnt"), min(col("bytes")).as("bytes"))
        .groupBy("kind")
        .agg(sum(col("cnt")).as("n_assets"), count(lit(1)).as("n_unique"),
          sum((col("cnt") - 1) * col("bytes")).as("dup_bytes"))
        .orderBy("kind")
    }
  )
}
