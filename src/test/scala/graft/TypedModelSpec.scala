package graft

import graft.sources.DiscogsXml
import org.scalatest.funsuite.AnyFunSuite

class TypedModelSpec extends AnyFunSuite {
  import TestSpark._

  private val fx = "/root/repo/src/test/resources/fixtures"

  test("typed datasets round-trip every entity with full nested fidelity") {
    val arts = DiscogsXml.artistsDs(spark, s"$fx/artists.xml").collect()
    assert(arts.nonEmpty)
    assert(arts.forall(_.urls != null))

    val labels = DiscogsXml.labelsDs(spark, s"$fx/labels.xml").collect()
    assert(labels.nonEmpty)
    // width-first label image struct: typed accessors see the same values
    // the frame does.
    labels.flatMap(_.images).foreach(im => assert(im.width >= 0 && im.height >= 0))

    val masters = DiscogsXml.mastersDs(spark, s"$fx/masters.xml").collect()
    assert(masters.nonEmpty)
    assert(masters.forall(_.id > 0)) // id is a required attribute
    masters.flatMap(_.videos).foreach(v => assert(v.duration >= 0))

    val rels = DiscogsXml.releasesDs(spark, s"$fx/releases.xml").collect()
    assert(rels.nonEmpty)
    // qty stays a STRING with default "1"
    rels.flatMap(_.formats).foreach(f => assert(f.qty != null && f.qty.nonEmpty))
  }

  test("typed dataset agrees with the DataFrame surface row for row") {
    val df = DiscogsXml.releases(spark, s"$fx/releases.xml")
      .orderBy("id").collect().map(_.toString).toSeq
    import TestSpark.spark.implicits._
    val ds = DiscogsXml.releasesDs(spark, s"$fx/releases.xml")
      .orderBy("id").toDF().collect().map(_.toString).toSeq
    assert(df == ds)
  }
}
