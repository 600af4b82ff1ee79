package graft

import graft.sources.DiscogsXml
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** A9 fidelity: the reference parses each fragment with recover=True —
  * malformed records degrade, the stream continues. Spark's XML source in
  * PERMISSIVE mode (the default we rely on) must likewise keep parsing
  * subsequent records.
  */
class PermissiveXmlSpec extends AnyFunSuite {
  import TestSpark._

  test("a malformed record does not abort the scan; healthy records survive") {
    // The broken record is self-delimited (its </artist> close is intact);
    // the inner tag mismatch makes the fragment unparseable. A record
    // whose CLOSE tag is missing instead consumes its next sibling — same
    // as the reference's closing-tag fragment scanner (process.py:22-45).
    val xml =
      """<artists>
        |<artist><id>1</id><name>Good One</name></artist>
        |<artist><id>2</id><name>Broken</nam></artist>
        |<artist><id>3</id><name>Good Two</name></artist>
        |</artists>""".stripMargin
    val f = Files.createTempFile("graft_permissive", ".xml")
    Files.write(f, xml.getBytes("UTF-8"))
    try {
      // Strict path (native XML source): StAX dies at the malformed
      // record and the remainder of the split is LOST — only records
      // before it survive. Pin that behavior so the divergence is loud.
      val strict = DiscogsXml.artists(spark, f.toString).collect()
        .map(_.getAs[String]("name")).filter(_ != null).toSet
      assert(strict == Set("Good One"), strict.toString)

      // Recovering path: per-fragment parse — both healthy records
      // survive, the broken one drops. This matches the reference's
      // XMLPullParser(recover=True) semantics.
      val rec = DiscogsXml.readRawRecovering(spark, f.toString, "artist")
        .collect().map(_.getAs[String]("name")).filter(_ != null).toSet
      assert(Set("Good One", "Good Two").subsetOf(rec), rec.toString)
      assert(!rec.contains("Broken"))
    } finally Files.delete(f)
  }

  test("recovering scan splits an uncompressed dump across tasks") {
    // The strict XML source reads any file as ONE task; the lineSep-based
    // recovering scan must split. Pin it with a multi-split-sized file.
    val f = Files.createTempFile("graft_split", ".xml")
    val sb = new StringBuilder("<artists>\n")
    (1 to 20000).foreach(i => sb ++=
      s"<artist><id>$i</id><name>Artist $i padded with some words</name></artist>\n")
    sb ++= "</artists>\n"
    Files.write(f, sb.toString.getBytes("UTF-8"))
    val old = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    try {
      val strict = DiscogsXml.readRaw(spark, f.toString, "artist")
      val rec = DiscogsXml.readRawRecovering(spark, f.toString, "artist")
      assert(strict.rdd.getNumPartitions == 1)
      assert(rec.rdd.getNumPartitions > 1, s"expected a multi-split scan")
      assert(rec.count() == 20000)
    } finally {
      old match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
      Files.delete(f)
    }
  }

  test("recovering path matches the strict path on well-formed dumps") {
    val fx = "/root/repo/src/test/resources/fixtures"
    val strict = DiscogsXml.readRaw(spark, s"$fx/artists.xml", "artist")
      .collect().map(_.toString).sorted.toSeq
    val rec = DiscogsXml.readRawRecovering(spark, s"$fx/artists.xml", "artist")
      .collect().map(_.toString).sorted.toSeq
    assert(strict == rec)
  }
}
