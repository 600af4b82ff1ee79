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
