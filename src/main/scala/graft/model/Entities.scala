package graft.model

/** Typed entity model mirroring the reference schemas exactly
  * (schema.py:3-98; see SURVEY.md §1.2) — field ORDER inside the structs
  * is part of the contract (label images are width-first, all others
  * height-first, reproducing the reference's inconsistency).
  *
  * Use with `Dataset[T]` where compile-time safety helps; the DataFrame
  * surface remains primary (schema evolution, column pruning).
  */
final case class Image(
    height: Int, width: Int, `type`: String, uri: String, uri150: String)

final case class LabelImage(
    width: Int, height: Int, `type`: String, uri: String, uri150: String)

final case class MasterArtist(
    id: Long, name: String, anv: String, join: String, role: String, tracks: String)

final case class Video(
    duration: Int, embed: Boolean, src: String, title: String, description: String)

final case class ReleaseLabel(name: String, catno: String)

final case class ReleaseFormat(name: String, qty: String, descriptions: Seq[String])

final case class Artist(
    id: Long,
    name: String,
    realname: String,
    profile: String,
    data_quality: String,
    urls: Seq[String],
    namevariations: Seq[String],
    aliases: Seq[String],
    groups: Seq[String],
    members: Seq[String],
    images: Seq[Image])

final case class Label(
    id: Long,
    name: String,
    contactinfo: String,
    profile: String,
    data_quality: String,
    images: Seq[LabelImage],
    urls: Seq[String],
    sublabels: Seq[String])

final case class Master(
    id: Long,
    main_release: Long,
    artists: Seq[MasterArtist],
    genres: Seq[String],
    styles: Seq[String],
    year: Int,
    title: String,
    data_quality: String,
    images: Seq[Image],
    videos: Seq[Video])

final case class Release(
    id: Long,
    status: String,
    title: String,
    country: String,
    released: String,
    notes: String,
    images: Seq[Image],
    artists: Seq[String],
    labels: Seq[ReleaseLabel],
    formats: Seq[ReleaseFormat],
    genres: Seq[String],
    styles: Seq[String])
