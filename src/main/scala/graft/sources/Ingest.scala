package graft.sources

import java.io.{BufferedInputStream, FileInputStream}
import java.security.MessageDigest

/** Ingest-side utilities mirroring the reference's download/verify layer
  * (SURVEY.md §2.A2/A3, §2.B7, §2.D4). Downloading itself is delegated to
  * whatever moves bytes near the cluster (distcp, S3 replication, a plain
  * HTTP fetch); these are the pure pieces the pipeline logic needs.
  */
object Ingest {

  /** URL -> entity type by substring match (reference utils.py:64-68:
    * first DISCOGS_CONFIGS key contained in the URL). */
  def detectDataType(url: String): Option[String] =
    Seq("artists" -> "artist", "labels" -> "label",
      "masters" -> "master", "releases" -> "release")
      .collectFirst { case (k, v) if url.contains(k) => v }

  /** Gzip magic-byte sniff (utils.py:60-61). */
  def isGzip(head: Array[Byte]): Boolean =
    head.length >= 2 && head(0) == 0x1f.toByte && head(1) == 0x8b.toByte

  /** Streaming file digest (process.py:117-127): constant memory, one
    * pass. `algo` in sha-256 / sha-1 / md5 / sha-512 (JCE names). */
  def checksumFile(path: String, algo: String = "SHA-256"): String = {
    val md = MessageDigest.getInstance(algo)
    val in = new BufferedInputStream(new FileInputStream(path), 64 * 1024)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Case-insensitive checksum compare (process.py:164-169, io.py:375). */
  def verifyChecksum(path: String, expected: String, algo: String = "SHA-256"): Boolean =
    expected.nonEmpty && checksumFile(path, algo).equalsIgnoreCase(expected.trim)

  /** Lenient gzip decompress (process.py:47-64 `lenient_gzip_decompress`):
    * salvage every byte that inflates cleanly, tolerating a corrupt CRC
    * trailer or a truncated stream — a damaged dump yields its intact
    * prefix records instead of aborting the whole scan. Returns
    * (bytesWritten, cleanEof): cleanEof=false means the tail was lost.
    */
  def lenientGunzip(inPath: String, outPath: String,
      bufSize: Int = 64 * 1024): (Long, Boolean) = {
    val in = new java.util.zip.GZIPInputStream(
      new BufferedInputStream(new FileInputStream(inPath), bufSize))
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(outPath), bufSize)
    var written = 0L
    var clean = true
    try {
      val buf = new Array[Byte](bufSize)
      try {
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); written += n; n = in.read(buf) }
      } catch {
        // EOFException (truncated member) or ZipException (CRC/length
        // trailer mismatch): keep what inflated, flag the loss.
        case _: java.io.IOException => clean = false
      }
    } finally {
      try in.close() catch { case _: Exception => () }
      out.close()
    }
    (written, clean)
  }

  /** Ranged-download chunk plan (io.py:219-236): split `totalSize` into
    * `maxWorkers*4` target chunks, clamped to [minChunk, chunkSize];
    * returns inclusive byte ranges for `Range:` headers. Pure math — the
    * transport (java.net.http / S3A ranged GETs) plugs in around it. */
  def splitChunks(totalSize: Long, maxWorkers: Int = 8,
      chunkSize: Long = 8L * 1024 * 1024,
      minChunk: Long = 1L * 1024 * 1024): Seq[(Long, Long)] = {
    require(totalSize >= 0)
    if (totalSize == 0) return Seq.empty
    val target = math.max(1L, totalSize / math.max(1, maxWorkers * 4))
    val size = math.min(chunkSize, math.max(minChunk, target))
    (0L until totalSize by size).map(start =>
      (start, math.min(start + size, totalSize) - 1))
  }
}
