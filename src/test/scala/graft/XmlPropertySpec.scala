package graft

import graft.sources.DiscogsXml
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based fidelity checks (SURVEY.md §5.4): random artist records
  * — optional fields present/absent, whitespace-riddled text, non-numeric
  * ids — round-trip through the XML source + projection layer and must
  * satisfy the reference parser's invariants. Plain ScalaCheck generators
  * with fixed seeds (scalatestplus isn't in the offline cache).
  */
class XmlPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val word = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val wsText = for {
    ws <- Gen.listOfN(3, Gen.oneOf(" ", "  ", "\n", "\t", " \n "))
    w <- Gen.listOfN(3, word)
  } yield w.zip(ws).map { case (a, b) => a + b }.mkString

  private case class ArtistFix(
      id: Option[String], name: Option[String], urls: List[String], hasUrlsWrapper: Boolean)

  private val genArtist = for {
    id <- Gen.option(Gen.oneOf(Gen.choose(1L, 999999L).map(_.toString), Gen.const("notanum")))
    name <- Gen.option(wsText)
    hasWrapper <- Gen.oneOf(true, false)
    urls <- Gen.listOf(word).map(_.take(3))
  } yield ArtistFix(id, name, urls, hasWrapper)

  private def esc(s: String) =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def xml(artists: List[ArtistFix]): String = {
    val items = artists.map { a =>
      val id = a.id.map(i => s"<id>${esc(i)}</id>").getOrElse("")
      val nm = a.name.map(n => s"<name>${esc(n)}</name>").getOrElse("")
      val urls =
        if (a.hasUrlsWrapper) s"<urls>${a.urls.map(u => s"<url>${esc(u)}</url>").mkString}</urls>"
        else ""
      s"<artist>$id$nm$urls</artist>"
    }.mkString
    s"<artists>$items</artists>"
  }

  test("parsed artists satisfy the reference invariants on random input") {
    val gen = Gen.listOfN(6, genArtist)
    (0 until 20).foreach { trial =>
      val fixtures = gen.pureApply(Gen.Parameters.default, Seed(42L + trial))
      val f = java.nio.file.Files.createTempFile("graft_prop", ".xml")
      java.nio.file.Files.write(f, xml(fixtures).getBytes("UTF-8"))
      try {
        val rows = DiscogsXml.artists(spark, f.toString).collect()
        assert(rows.length == fixtures.length, s"trial $trial: row count")
        rows.foreach { r =>
          // id: always present, never null; non-numeric/absent => 0.
          val id = r.getAs[Long]("id")
          assert(id >= 0)
          // whitespace collapsed in name: no tab/newline, no 2+ space runs.
          Option(r.getAs[String]("name")).foreach { n =>
            assert(!n.exists(c => c == '\n' || c == '\t'), s"raw ws survived: '$n'")
            assert(!n.contains("  "), s"ws run survived: '$n'")
          }
          // lists are never null (absent wrapper => []).
          assert(r.getAs[scala.collection.Seq[String]]("urls") != null)
          assert(r.getAs[scala.collection.Seq[String]]("aliases") != null)
          assert(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("images") != null)
        }
        // numeric ids survive exactly.
        val wantIds = fixtures.flatMap(_.id).filter(_.forall(_.isDigit)).map(_.toLong).sorted
        val gotIds = rows.map(_.getAs[Long]("id")).filter(_ > 0).sorted.toSeq
        assert(gotIds == wantIds, s"trial $trial: ids")
        // urls round-trip for records with a wrapper.
        val wantUrls = fixtures.filter(_.hasUrlsWrapper).map(_.urls)
          .filter(_.nonEmpty).sortBy(_.mkString)
        val gotUrls = rows.map(_.getAs[scala.collection.Seq[String]]("urls").toList)
          .filter(_.nonEmpty).toList.sortBy(_.mkString)
        assert(gotUrls == wantUrls, s"trial $trial: urls")
      } finally java.nio.file.Files.delete(f)
    }
  }
}
