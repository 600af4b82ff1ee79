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

  test("recovering path matches the strict path on well-formed dumps") {
    val fx = "/root/repo/src/test/resources/fixtures"
    val strict = DiscogsXml.readRaw(spark, s"$fx/artists.xml", "artist")
      .collect().map(_.toString).sorted.toSeq
    val rec = DiscogsXml.readRawRecovering(spark, s"$fx/artists.xml", "artist")
      .collect().map(_.toString).sorted.toSeq
    assert(strict == rec)
  }
}
