package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** Pre-parse scrub of XML-invalid control characters, mirroring the
  * reference label path (`clean_xml_content`, utils.py:49-58, applied at
  * process.py:262-266): bytes 0x00-0x08, 0x0B, 0x0C, 0x0E-0x1F become a
  * space. These are single-byte UTF-8 code points, never continuation
  * bytes, so a streaming byte-level map is encoding-safe and runs in
  * constant memory (8 KiB chunks — the reference's GzipStreamReader
  * cadence, io.py:95-144).
  *
  * Architecture note for 100 TB: this is an ingest utility that runs once
  * per dump file before the distributed XML scan; with many dumps it
  * parallelizes per-file (driver submits one clean per input), keeping the
  * Spark plan itself fully declarative.
  */
object XmlCleaner {

  private def isInvalid(b: Byte): Boolean = {
    val c = b & 0xff
    c < 0x20 && c != 0x09 && c != 0x0a && c != 0x0d
  }

  /** Scrub `path` (gzip-aware by extension) into a temp file; returns the
    * cleaned file's path.
    */
  def cleanToTemp(path: String): String = {
    val out = Files.createTempFile("graft_xml_clean_", ".xml")
    val rawIn = new FileInputStream(path)
    val in = new BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(rawIn) else rawIn, 64 * 1024)
    val os = new BufferedOutputStream(new FileOutputStream(out.toFile), 64 * 1024)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (isInvalid(buf(i))) buf(i) = ' '.toByte
          i += 1
        }
        os.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally {
      in.close(); os.close()
    }
    out.toFile.deleteOnExit()
    out.toString
  }
}
