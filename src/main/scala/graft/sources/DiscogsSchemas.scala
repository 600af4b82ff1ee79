package graft.sources

import org.apache.spark.sql.types._

/** Schemas for the four Discogs entities.
  *
  * `*Raw` schemas describe the XML shape as Spark's XML source sees it
  * (wrapper structs around repeated elements, attributes prefixed `_`).
  * All leaves are read as StringType so the fidelity layer controls every
  * numeric default ("absent or empty numeric => 0" — reference
  * parser.py:32,57,61,102) without tripping ANSI cast errors.
  *
  * `*Out` DDLs pin the final field order exactly as the reference declares
  * it (schema.py:3-98) — including the label-images inconsistency where
  * label images are (width, height, ...) while the other three entities are
  * (height, width, ...) (schema.py:20-24 vs 42-46).
  */
object DiscogsSchemas {

  private def wrapArr(item: String, dt: DataType): StructType =
    StructType(Seq(StructField(item, ArrayType(dt))))

  private def strArr(item: String): StructType = wrapArr(item, StringType)

  val imageRaw: StructType = StructType(Seq(
    StructField("_height", StringType), StructField("_width", StringType),
    StructField("_type", StringType), StructField("_uri", StringType),
    StructField("_uri150", StringType)))

  val artistRaw: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("realname", StringType), StructField("profile", StringType),
    StructField("data_quality", StringType),
    StructField("urls", strArr("url")),
    StructField("namevariations", strArr("name")),
    StructField("aliases", strArr("name")),
    StructField("groups", strArr("name")),
    StructField("members", strArr("name")),
    StructField("images", wrapArr("image", imageRaw))))

  val labelRaw: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("contactinfo", StringType), StructField("profile", StringType),
    StructField("data_quality", StringType),
    StructField("images", wrapArr("image", imageRaw)),
    StructField("urls", strArr("url")),
    StructField("sublabels", strArr("label"))))

  val masterArtistRaw: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType),
    StructField("anv", StringType), StructField("join", StringType),
    StructField("role", StringType), StructField("tracks", StringType)))

  val videoRaw: StructType = StructType(Seq(
    StructField("_duration", StringType), StructField("_embed", StringType),
    StructField("_src", StringType), StructField("title", StringType),
    StructField("description", StringType)))

  val masterRaw: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("main_release", StringType),
    StructField("artists", wrapArr("artist", masterArtistRaw)),
    StructField("genres", strArr("genre")),
    StructField("styles", strArr("style")),
    StructField("year", StringType), StructField("title", StringType),
    StructField("data_quality", StringType),
    StructField("images", wrapArr("image", imageRaw)),
    StructField("videos", wrapArr("video", videoRaw))))

  val releaseLabelRaw: StructType = StructType(Seq(
    StructField("_name", StringType), StructField("_catno", StringType)))

  val releaseFormatRaw: StructType = StructType(Seq(
    StructField("_name", StringType), StructField("_qty", StringType),
    StructField("descriptions", strArr("description"))))

  val releaseArtistRaw: StructType = StructType(Seq(
    StructField("id", StringType), StructField("name", StringType)))

  val releaseRaw: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("_status", StringType),
    StructField("title", StringType), StructField("country", StringType),
    StructField("released", StringType), StructField("notes", StringType),
    StructField("images", wrapArr("image", imageRaw)),
    StructField("artists", wrapArr("artist", releaseArtistRaw)),
    StructField("labels", wrapArr("label", releaseLabelRaw)),
    StructField("formats", wrapArr("format", releaseFormatRaw)),
    StructField("genres", strArr("genre")),
    StructField("styles", strArr("style"))))

  // Final output element DDLs (for typed empty-array literals).
  val imageOutDdl = "array<struct<height:int,width:int,type:string,uri:string,uri150:string>>"
  val labelImageOutDdl = "array<struct<width:int,height:int,type:string,uri:string,uri150:string>>"
  val masterArtistOutDdl = "array<struct<id:bigint,name:string,anv:string,join:string,role:string,tracks:string>>"
  val videoOutDdl = "array<struct<duration:int,embed:boolean,src:string,title:string,description:string>>"
  val releaseLabelOutDdl = "array<struct<name:string,catno:string>>"
  val releaseFormatOutDdl = "array<struct<name:string,qty:string,descriptions:array<string>>>"
  val strArrDdl = "array<string>"

  val rowTags: Map[String, String] = Map(
    "artist" -> "artist", "label" -> "label",
    "master" -> "master", "release" -> "release")
}
