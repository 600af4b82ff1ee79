package graft

import graft.sources.{DiscogsLake, DiscogsXml}
import org.scalatest.funsuite.AnyFunSuite

/** Structural fidelity: the full NESTED entity DataFrames must match ground
  * truth produced by executing the reference parser on the same fixtures
  * (tools/make_expected.py -> expected_<entity>.jsonl).
  */
class DiscogsSpec extends AnyFunSuite {
  import TestSpark._

  private val fix = "/root/repo/src/test/resources/fixtures"

  private def check(entity: String, fixture: String): Unit = {
    val parsed = DiscogsXml.read(spark, s"$fix/$fixture", entity).orderBy("id")
    val expected = spark.read.schema(parsed.schema)
      .json(s"$fix/expected_$entity.jsonl").orderBy("id")
    val p = parsed.collect().toSeq.map(_.toString)
    val e = expected.collect().toSeq.map(_.toString)
    assert(p == e, s"$entity nested rows differ\nparsed=$p\nexpected=$e")
  }

  test("artists match reference parser output (nested)") { check("artist", "artists.xml") }
  test("labels match reference parser output (nested)") { check("label", "labels.xml") }
  test("masters match reference parser output (nested)") { check("master", "masters.xml") }
  test("releases match reference parser output (nested)") { check("release", "releases.xml") }
  test("gzip path produces identical artists") {
    val a = DiscogsXml.artists(spark, s"$fix/artists.xml").orderBy("id").collect().toSeq
    val b = DiscogsXml.artists(spark, s"$fix/artists_gz.xml.gz").orderBy("id").collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("schemas pin reference field order, incl. label width-first images") {
    val l = DiscogsXml.labels(spark, s"$fix/labels.xml")
    assert(l.schema.toDDL.contains(
      "images ARRAY<STRUCT<width: INT, height: INT, type: STRING, uri: STRING, uri150: STRING>>"))
    val a = DiscogsXml.artists(spark, s"$fix/artists.xml")
    assert(a.schema.toDDL.contains(
      "images ARRAY<STRUCT<height: INT, width: INT, type: STRING, uri: STRING, uri150: STRING>>"))
    val r = DiscogsXml.releases(spark, s"$fix/releases.xml")
    assert(r.schema("formats").dataType.sql.contains("qty: STRING"))
    assert(r.schema("artists").dataType.sql == "ARRAY<STRING>")
  }

  test("lake roundtrip preserves month as string partition") {
    val base = new java.io.File(sys.props("java.io.tmpdir"), "graft_lake_spec").toString
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
    val rel = DiscogsXml.releases(spark, s"$fix/releases.xml")
    DiscogsLake.writeDump(rel, base, "release", 1996, "03")
    val back = DiscogsLake.read(spark, base, "release")
    assert(back.schema("month").dataType.typeName == "string")
    assert(back.schema("year").dataType.typeName == "integer")
    import org.apache.spark.sql.functions._
    val m = back.select(col("month")).distinct().collect().map(_.getString(0)).toSeq
    assert(m == Seq("03"))
  }

  test("parseInputUrl derives partition from dump filename") {
    assert(DiscogsLake.parseInputUrl(
      "https://x/data/2019/discogs_20190115_artists.xml.gz") == ("2019", "01", "artists"))
  }
}
