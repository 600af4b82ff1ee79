package graft

import graft.sources.Ingest
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import TestSpark._

  test("detectDataType matches the reference's substring dispatch") {
    assert(Ingest.detectDataType(
      "https://x/data/2008/discogs_20080309_artists.xml.gz").contains("artist"))
    assert(Ingest.detectDataType("s3://b/discogs_20240101_releases.xml.gz").contains("release"))
    assert(Ingest.detectDataType("file:/tmp/discogs_20240101_labels.xml").contains("label"))
    assert(Ingest.detectDataType("discogs_20240101_masters.xml.gz").contains("master"))
    assert(Ingest.detectDataType("random.txt").isEmpty)
  }

  test("checksum verify: known sha256, case-insensitive, empty rejects") {
    val f = java.nio.file.Files.createTempFile("graft_cs", ".txt")
    java.nio.file.Files.write(f, "hello\n".getBytes("UTF-8"))
    // sha256("hello\n") — standard known vector.
    val expected = "5891b5b522d5df086d0ff0b110fbd9d21bb4fc7163af34d08286a2e846f6be03"
    assert(Ingest.checksumFile(f.toString) == expected)
    assert(Ingest.verifyChecksum(f.toString, expected.toUpperCase))
    assert(!Ingest.verifyChecksum(f.toString, ""))
    assert(!Ingest.verifyChecksum(f.toString, "deadbeef"))
    java.nio.file.Files.delete(f)
  }

  test("gzip sniff") {
    assert(Ingest.isGzip(Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)))
    assert(!Ingest.isGzip("<?xml".getBytes))
    assert(!Ingest.isGzip(Array[Byte](0x1f)))
  }

  test("dot_ff registers as a SQL function on a live session") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_ff(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head.getDouble(0)
    assert(r == 11.0)
  }

  test("ranged HTTP fetch: parallel chunks, retry on 503, checksum intact") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.net.InetSocketAddress
    // 3 MB deterministic payload.
    val payload = Array.tabulate[Byte](3 * 1024 * 1024)(i => (i * 31 + i / 997).toByte)
    val failedOnce = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val rangedHits = new java.util.concurrent.atomic.AtomicInteger
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dump.xml", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val range = Option(x.getRequestHeaders.getFirst("Range"))
        if (x.getRequestMethod == "HEAD") {
          x.getResponseHeaders.set("Content-Length", payload.length.toString)
          x.sendResponseHeaders(200, -1); x.close()
        } else range match {
          case Some(r) =>
            // every distinct range 503s once first — exercises the retry
            if (failedOnce.add(r)) { x.sendResponseHeaders(503, -1); x.close() }
            else {
              rangedHits.incrementAndGet()
              val Array(a, b) = r.stripPrefix("bytes=").split("-").map(_.toLong)
              val body = payload.slice(a.toInt, b.toInt + 1)
              x.getResponseHeaders.set("Content-Range", s"bytes $a-$b/${payload.length}")
              x.sendResponseHeaders(206, body.length)
              x.getResponseBody.write(body); x.close()
            }
          case None =>
            x.sendResponseHeaders(200, payload.length)
            x.getResponseBody.write(payload); x.close()
        }
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val out = java.nio.file.Files.createTempDirectory("graft_http").resolve("dump.xml")
      val f = graft.sources.RangedHttp.fetch(s"http://127.0.0.1:$port/dump.xml",
        out.toString, maxWorkers = 4, chunkSize = 512 * 1024, minChunk = 256 * 1024,
        backoffMs = 1)
      assert(f.bytes == payload.length)
      assert(f.nChunks > 1 && rangedHits.get() == f.nChunks, s"chunks=${f.nChunks}")
      assert(java.nio.file.Files.readAllBytes(out).sameElements(payload))
      val md = java.security.MessageDigest.getInstance("SHA-256")
      assert(f.checksum == md.digest(payload).map("%02x".format(_)).mkString)
    } finally server.stop(0)
  }

  test("ranged HTTP fetch falls back to one sequential GET without HEAD support") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.net.InetSocketAddress
    val payload = Array.tabulate[Byte](64 * 1024)(i => (i * 7).toByte)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/d.xml", new HttpHandler {
      override def handle(x: HttpExchange): Unit =
        if (x.getRequestMethod == "HEAD") { x.sendResponseHeaders(405, -1); x.close() }
        else {
          x.sendResponseHeaders(200, payload.length)
          x.getResponseBody.write(payload); x.close()
        }
    })
    server.start()
    try {
      val out = java.nio.file.Files.createTempDirectory("graft_http2").resolve("d.xml")
      val f = graft.sources.RangedHttp.fetch(
        s"http://127.0.0.1:${server.getAddress.getPort}/d.xml", out.toString, backoffMs = 1)
      assert(f.nChunks == 1 && f.bytes == payload.length)
      assert(java.nio.file.Files.readAllBytes(out).sameElements(payload))
    } finally server.stop(0)
  }

  test("lenient gunzip salvages a truncated dump and a corrupt CRC trailer") {
    import graft.sources.DiscogsXml
    val dir = java.nio.file.Files.createTempDirectory("graft_lenient")
    // build a gz whose payload is the artists fixture
    val xml = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/repo/src/test/resources/fixtures/artists.xml"))
    val gz = dir.resolve("discogs_20080309_artists.xml.gz")
    val gzOut = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(gz))
    gzOut.write(xml); gzOut.close()
    val full = java.nio.file.Files.readAllBytes(gz)

    // corrupt CRC trailer (last 8 bytes = CRC32 + ISIZE): all data inflates
    val badCrc = full.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0xff).toByte
    val badCrcGz = dir.resolve("badcrc.xml.gz")
    java.nio.file.Files.write(badCrcGz, badCrc)
    val (crcBytes, crcClean) = Ingest.lenientGunzip(badCrcGz.toString, dir.resolve("crc.xml").toString)
    assert(crcBytes == xml.length && !crcClean)
    assert(java.nio.file.Files.readAllBytes(dir.resolve("crc.xml")).sameElements(xml))

    // truncated mid-stream: prefix salvaged, tail lost
    val trunc = full.take(full.length / 2)
    val truncGz = dir.resolve("trunc.xml.gz")
    java.nio.file.Files.write(truncGz, trunc)
    val (tBytes, tClean) = Ingest.lenientGunzip(truncGz.toString, dir.resolve("t.xml").toString)
    assert(tBytes > 0 && tBytes < xml.length && !tClean)

    // and the salvage scan yields the intact prefix records of the bad-CRC
    // dump (all 3 artists — the data was fully recoverable)
    val rows = DiscogsXml.readGzLenient(spark, badCrcGz.toString, "artist")
    assert(rows.count() == 3)
  }

  test("pre-split gz ingest: >1 record-aligned block, identical rows to the whole-file scan") {
    import graft.sources.DiscogsXml
    val gz = s"${graft.operators.Discogs.fixturesDir}/artists_gz.xml.gz"
    val splitDir = java.nio.file.Files.createTempDirectory("graft_presplit_spec").toString
    // Tiny block target: the 3-artist fixture must still split into
    // multiple blocks, each cut exactly after a </artist>.
    val blocks = Ingest.preSplitGz(gz, splitDir, "artist", blockBytes = 512L)
    assert(blocks.size > 1, s"expected multiple blocks, got ${blocks.size}")
    blocks.init.foreach { p =>
      val s = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
      assert(s.endsWith("</artist>"), s"block $p not record-aligned: ...${s.takeRight(30)}")
    }
    // Concatenating the blocks reproduces the decompressed stream byte
    // for byte — the split loses and reorders nothing.
    val whole = new String({
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(gz))
      try in.readAllBytes() finally in.close()
    }, "UTF-8")
    val joined = blocks.map(p => new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")).mkString
    assert(joined == whole)
    // And the parallel scan over the block directory equals the
    // single-split strict gz parse, row for row.
    val split = DiscogsXml.artistsRecovering(spark, splitDir)
      .collect().map(_.toString).sorted.toSeq
    val strict = DiscogsXml.artists(spark, gz)
      .collect().map(_.toString).sorted.toSeq
    assert(split == strict)
    assert(split.nonEmpty)
  }

  test("pre-split gz: random record sizes and block targets reassemble byte-identically") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Plain ScalaCheck generators with fixed seeds (XmlPropertySpec's
    // pattern). Invariants under arbitrary record-length mixes and
    // pathological block targets (down to 1 byte, forcing a cut attempt
    // at every read; records far larger than the block target, forcing
    // the oversized-record growth path): (1) concatenated blocks equal
    // the decompressed stream byte for byte; (2) every non-final block
    // ends exactly at a record boundary.
    val genDoc = for {
      nRecs <- Gen.choose(0, 12)
      bodies <- Gen.listOfN(nRecs, Gen.choose(0, 400).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))
    } yield "<artists>\n" + bodies.zipWithIndex.map { case (b, i) =>
      s"<artist><id>$i</id><profile>$b</profile></artist>"
    }.mkString("\n") + "\n</artists>"
    val genBlock = Gen.oneOf(Gen.choose(1L, 64L), Gen.choose(64L, 4096L))
    val params = Gen.Parameters.default
    (0 until 40).foreach { i =>
      val seed = Seed(1000L + i)
      val doc = genDoc.pureApply(params, seed)
      val blockBytes = genBlock.pureApply(params, seed.next)
      val base = java.nio.file.Files.createTempDirectory(s"graft_presplit_prop$i")
      val gz = s"$base/doc.xml.gz"
      locally {
        val out = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(gz))
        try out.write(doc.getBytes("UTF-8")) finally out.close()
      }
      val blocks = Ingest.preSplitGz(gz, s"$base/blocks", "artist", blockBytes)
      val joined = blocks.map(p => new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")).mkString
      assert(joined == doc, s"case $i (block=$blockBytes): reassembly diverged")
      blocks.init.foreach { p =>
        val s = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
        assert(s.endsWith("</artist>"),
          s"case $i (block=$blockBytes): block $p cut mid-record: ...${s.takeRight(30)}")
      }
    }
  }

  test("Main CLI: URL in, lake out (EP1 over HTTP)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.net.InetSocketAddress
    val payload = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/repo/src/test/resources/fixtures/releases_gz.xml.gz"))
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data/discogs_19960301_releases.xml.gz", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        if (x.getRequestMethod == "HEAD") {
          x.getResponseHeaders.set("Content-Length", payload.length.toString)
          x.sendResponseHeaders(200, -1); x.close()
        } else Option(x.getRequestHeaders.getFirst("Range")) match {
          case Some(r) =>
            val Array(a, b) = r.stripPrefix("bytes=").split("-").map(_.toLong)
            val body = payload.slice(a.toInt, b.toInt + 1)
            x.sendResponseHeaders(206, body.length)
            x.getResponseBody.write(body); x.close()
          case None =>
            x.sendResponseHeaders(200, payload.length)
            x.getResponseBody.write(payload); x.close()
        }
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data/discogs_19960301_releases.xml.gz"
      val out = java.nio.file.Files.createTempDirectory("graft_http_lake").toString
      val md = java.security.MessageDigest.getInstance("SHA-256")
      Main.main(Array(url, out, md.digest(payload).map("%02x".format(_)).mkString))
      assert(graft.sources.DiscogsLake.read(spark, out, "release").count() > 0)
    } finally server.stop(0)
  }

  test("Main CLI ingests a dump end to end") {
    val out = java.nio.file.Files.createTempDirectory("graft_main_lake").toString
    // Fixture named like a real dump so type/partition derive from it.
    val src = java.nio.file.Paths.get(
      "/root/repo/src/test/resources/fixtures/releases_gz.xml.gz")
    val staged = java.nio.file.Files.createTempDirectory("graft_main_in")
      .resolve("discogs_19960301_releases.xml.gz")
    java.nio.file.Files.copy(src, staged)
    val sum = Ingest.checksumFile(staged.toString)
    Main.main(Array(staged.toString, out, sum))
    val back = graft.sources.DiscogsLake.read(spark, out, "release")
    assert(back.count() > 0)
    assert(back.columns.contains("year") && back.columns.contains("month"))
    assert(back.select("month").distinct().collect().map(_.getString(0)).toSeq == Seq("03"))
  }
}
