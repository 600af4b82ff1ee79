package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Discogs XML -> typed DataFrame ingest (reference parser.py:30-169),
  * Spark-first: the record split + parse is Spark 4's built-in XML source
  * (splittable scan), and the reference's per-entity projection semantics
  * become pure Column expressions — no UDFs, fully codegen'd.
  *
  * Fidelity rules reproduced (SURVEY.md §7 risk list):
  *  - absent/empty numeric element or attribute => 0 (parser.py:32,43-44,57,61,83-84,102)
  *  - absent text => null; present-but-empty text element => "" (findtext)
  *  - text items inside lists: empty => null (`.text` of an empty element)
  *  - absent list wrapper => [] (never null)
  *  - `formats.qty`: string, absent/empty attr => "1" (parser.py:137)
  *  - `videos.embed` == (attr == "true"), null-safe false (parser.py:93)
  *  - whitespace runs collapse to one space on the artist/master/release
  *    path (clean_xml_bytes, utils.py:7-37 via process.py:323) but NOT on
  *    the label path, which only scrubs invalid control chars
  *    (process.py:262-266) — handled by [[XmlCleaner]] pre-parse.
  */
object DiscogsXml {
  import DiscogsSchemas._

  /** Post-parse equivalent of the reference's pre-parse whitespace collapse:
    * `re.sub(r'\s+', ' ', fragment)` — Python `\s` is Unicode-aware, hence
    * the (?U) flag. No trim: the reference strips the fragment, not fields,
    * so interior leading/trailing spaces survive.
    */
  private val collapseWs: Column => Column =
    c => regexp_replace(c, "(?U)\\s+", " ")

  private val identity: Column => Column = c => c

  private def emptyToNull(c: Column): Column =
    when(length(c) === 0, lit(null).cast("string")).otherwise(c)

  /** int(x or 0): null/empty/non-numeric => 0. The rlike guard keeps the
    * cast lazy so ANSI mode (Spark 4 default) cannot throw.
    */
  private def numOr0(c: Column, t: String): Column =
    coalesce(when(c.rlike("^-?\\d+$"), c.cast(t)), lit(0).cast(t))

  /** [x.text for x in findall(...)]: absent wrapper => [], empty item => null. */
  private def textList(c: Column, clean: Column => Column): Column =
    coalesce(transform(c, x => clean(emptyToNull(x))),
      expr(s"CAST(array() AS $strArrDdl)"))

  private def imageList(c: Column, widthFirst: Boolean, clean: Column => Column): Column = {
    val ddl = if (widthFirst) labelImageOutDdl else imageOutDdl
    coalesce(
      transform(c, im => {
        val h = numOr0(im.getField("_height"), "int").as("height")
        val w = numOr0(im.getField("_width"), "int").as("width")
        val rest = Seq(clean(im.getField("_type")).as("type"),
          clean(im.getField("_uri")).as("uri"),
          clean(im.getField("_uri150")).as("uri150"))
        if (widthFirst) struct((Seq(w, h) ++ rest): _*)
        else struct((Seq(h, w) ++ rest): _*)
      }),
      expr(s"CAST(array() AS $ddl)"))
  }

  def readRaw(spark: SparkSession, path: String, entity: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTags(entity))
      .option("attributePrefix", "_")
      .option("ignoreSurroundingSpaces", "false")
      .schema(entity match {
        case "artist" => artistRaw
        case "label" => labelRaw
        case "master" => masterRaw
        case "release" => releaseRaw
      })
      .load(path)

  /** parser.py:146-169 */
  def artists(spark: SparkSession, path: String): DataFrame =
    artistProjection(readRaw(spark, path, "artist"))

  /** [[artists]] through the record-recovering scan. */
  def artistsRecovering(spark: SparkSession, path: String): DataFrame =
    artistProjection(readRawRecovering(spark, path, "artist"))

  private def artistProjection(raw: DataFrame): DataFrame = {
    val c = collapseWs
    raw.select(
      numOr0(col("id"), "bigint").as("id"),
      c(col("name")).as("name"),
      c(col("realname")).as("realname"),
      c(col("profile")).as("profile"),
      c(col("data_quality")).as("data_quality"),
      textList(col("urls.url"), c).as("urls"),
      textList(col("namevariations.name"), c).as("namevariations"),
      textList(col("aliases.name"), c).as("aliases"),
      textList(col("groups.name"), c).as("groups"),
      textList(col("members.name"), c).as("members"),
      imageList(col("images.image"), widthFirst = false, c).as("images"))
  }

  /** parser.py:30-52; label path has no whitespace collapse, only the
    * control-char scrub which [[XmlCleaner]] applies pre-parse.
    */
  def labels(spark: SparkSession, path: String): DataFrame =
    labelProjection(readRaw(spark, XmlCleaner.cleanToTemp(path), "label"))

  /** Labels CANNOT use the closing-tag fragment scan: `<sublabels>`
    * nests `<label>` elements inside each record, so splitting on
    * `</label>` shears records apart — the exact reason the reference
    * special-cases labels to a whole-document parse (process.py:241-283)
    * instead of its streaming splitter. This stays on the strict StAX
    * scan (whose rowTag matcher is nesting-aware). */
  def labelsRecovering(spark: SparkSession, path: String): DataFrame =
    labels(spark, path)

  private def labelProjection(raw: DataFrame): DataFrame = {
    val c = identity
    raw.select(
      numOr0(col("id"), "bigint").as("id"),
      col("name").as("name"),
      col("contactinfo").as("contactinfo"),
      col("profile").as("profile"),
      col("data_quality").as("data_quality"),
      imageList(col("images.image"), widthFirst = true, c).as("images"),
      textList(col("urls.url"), c).as("urls"),
      textList(col("sublabels.label"), c).as("sublabels"))
  }

  /** parser.py:54-98; id comes from the `id` attribute. */
  def masters(spark: SparkSession, path: String): DataFrame =
    masterProjection(readRaw(spark, path, "master"))

  /** [[masters]] through the record-recovering scan. */
  def mastersRecovering(spark: SparkSession, path: String): DataFrame =
    masterProjection(readRawRecovering(spark, path, "master"))

  private def masterProjection(raw: DataFrame): DataFrame = {
    val c = collapseWs
    raw.select(
      numOr0(col("_id"), "bigint").as("id"),
      numOr0(col("main_release"), "bigint").as("main_release"),
      coalesce(
        transform(col("artists.artist"), a => struct(
          numOr0(a.getField("id"), "bigint").as("id"),
          c(a.getField("name")).as("name"),
          c(a.getField("anv")).as("anv"),
          c(a.getField("join")).as("join"),
          c(a.getField("role")).as("role"),
          c(a.getField("tracks")).as("tracks"))),
        expr(s"CAST(array() AS $masterArtistOutDdl)")).as("artists"),
      textList(col("genres.genre"), c).as("genres"),
      textList(col("styles.style"), c).as("styles"),
      numOr0(col("year"), "int").as("year"),
      c(col("title")).as("title"),
      c(col("data_quality")).as("data_quality"),
      imageList(col("images.image"), widthFirst = false, c).as("images"),
      coalesce(
        transform(col("videos.video"), v => struct(
          numOr0(v.getField("_duration"), "int").as("duration"),
          coalesce(v.getField("_embed") === "true", lit(false)).as("embed"),
          c(v.getField("_src")).as("src"),
          c(v.getField("title")).as("title"),
          c(v.getField("description")).as("description"))),
        expr(s"CAST(array() AS $videoOutDdl)")).as("videos"))
  }

  /** parser.py:100-144; id/status are attributes; artists project to names
    * only (parser.py:125-126); formats.qty stays a string, default "1".
    */
  def releases(spark: SparkSession, path: String): DataFrame =
    releaseProjection(readRaw(spark, path, "release"))

  /** [[releases]] through the record-recovering scan. */
  def releasesRecovering(spark: SparkSession, path: String): DataFrame =
    releaseProjection(readRawRecovering(spark, path, "release"))

  private def releaseProjection(raw: DataFrame): DataFrame = {
    val c = collapseWs
    raw.select(
      numOr0(col("_id"), "bigint").as("id"),
      c(col("_status")).as("status"),
      c(col("title")).as("title"),
      c(col("country")).as("country"),
      c(col("released")).as("released"),
      c(col("notes")).as("notes"),
      imageList(col("images.image"), widthFirst = false, c).as("images"),
      coalesce(transform(col("artists.artist"), a => c(a.getField("name"))),
        expr(s"CAST(array() AS $strArrDdl)")).as("artists"),
      coalesce(
        transform(col("labels.label"), l => struct(
          c(l.getField("_name")).as("name"),
          c(l.getField("_catno")).as("catno"))),
        expr(s"CAST(array() AS $releaseLabelOutDdl)")).as("labels"),
      coalesce(
        transform(col("formats.format"), f => struct(
          c(f.getField("_name")).as("name"),
          coalesce(emptyToNull(f.getField("_qty")), lit("1")).as("qty"),
          textList(f.getField("descriptions").getField("description"), c)
            .as("descriptions"))),
        expr(s"CAST(array() AS $releaseFormatOutDdl)")).as("formats"),
      textList(col("genres.genre"), c).as("genres"),
      textList(col("styles.style"), c).as("styles"))
  }

  /** Entity read with the per-format scan choice: gzip dumps use the
    * strict StAX scan (single-split either way; StAX is ~1.8x faster
    * single-threaded), plain XML uses the record-recovering lineSep scan,
    * which is SPLITTABLE — measured 4.8x faster on a 216 MB dump at
    * local[32] — and degrades malformed records per row instead of
    * truncating the file. q01-q04 pin both paths against the oracle.
    */
  def read(spark: SparkSession, path: String, entity: String): DataFrame =
    if (path.endsWith(".gz")) readStrict(spark, path, entity)
    else readRecovering(spark, path, entity)

  def readStrict(spark: SparkSession, path: String, entity: String): DataFrame =
    entity match {
      case "artist" => artists(spark, path)
      case "label" => labels(spark, path)
      case "master" => masters(spark, path)
      case "release" => releases(spark, path)
    }

  def readRecovering(spark: SparkSession, path: String, entity: String): DataFrame =
    entity match {
      case "artist" => artistsRecovering(spark, path)
      case "label" => labelsRecovering(spark, path)
      case "master" => mastersRecovering(spark, path)
      case "release" => releasesRecovering(spark, path)
    }

  /** Salvage scan for a DAMAGED gzip dump (truncated transfer, corrupt
    * CRC trailer): lenient-gunzip the salvageable prefix to a local temp
    * file (reference process.py:47-64), then run the splittable
    * record-recovering scan over it — intact records survive, the torn
    * tail record nulls its own row only. The strict [[read]] path stays
    * the default: this is the explicit "the dump is broken, give me what
    * exists" entry. */
  def readGzLenient(spark: SparkSession, path: String, entity: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempFile("graft_lenient_", ".xml")
    tmp.toFile.deleteOnExit()
    Ingest.lenientGunzip(path, tmp.toString)
    readRecovering(spark, tmp.toString, entity)
  }

  /** Lenient record-recovering scan — the reference's
    * XMLFixerStreamReader + per-fragment recover=True (process.py:22-45,
    * 322-326) re-expressed on Spark: the native XML source tokenizes the
    * whole split with StAX, so ONE malformed record corrupts the stream
    * and loses the rest of the file; this path instead splits records by
    * the closing tag (`lineSep`), then parses each fragment independently
    * with `from_xml` — a bad fragment nulls ITS row only. Splittable for
    * uncompressed inputs (lineSep-delimited text scan), single-split for
    * .gz like the reference.
    *
    * Slower per record than StAX (per-fragment parser init) but
    * SPLITTABLE for uncompressed inputs — the strict XML source reads one
    * file as one task regardless of size, so on a 216 MB dump at
    * local[32] this path measured 4.8x faster end to end. [[read]]
    * dispatches: plain XML here, .gz to the strict scan.
    */
  def readRawRecovering(spark: SparkSession, path: String, entity: String): DataFrame = {
    val tag = rowTags(entity)
    val schema = entity match {
      case "artist" => artistRaw
      case "label" => labelRaw
      case "master" => masterRaw
      case "release" => releaseRaw
    }
    val frag = spark.read.option("lineSep", s"</$tag>").text(path)
      // Cut everything before this record's opening tag (document header /
      // inter-record whitespace), then restore the closing tag the
      // delimiter consumed.
      .select(regexp_extract(col("value"), s"(?s)<$tag(\\s[^>]*)?>.*", 0).as("frag"))
      .filter(length(col("frag")) > 0)
      .select(concat(col("frag"), lit(s"</$tag>")).as("record"))
    frag.select(from_xml(col("record"), schema,
      Map("attributePrefix" -> "_", "ignoreSurroundingSpaces" -> "false",
        "rowTag" -> tag).asJava).as("r"))
      .filter(col("r").isNotNull)
      .select("r.*")
  }

  // ---- Typed Dataset surface (graft.model) ----------------------------

  def artistsDs(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Artist] = {
    import spark.implicits._
    artists(spark, path).as[graft.model.Artist]
  }

  def labelsDs(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Label] = {
    import spark.implicits._
    labels(spark, path).as[graft.model.Label]
  }

  def mastersDs(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Master] = {
    import spark.implicits._
    masters(spark, path).as[graft.model.Master]
  }

  def releasesDs(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[graft.model.Release] = {
    import spark.implicits._
    releases(spark, path).as[graft.model.Release]
  }
}
