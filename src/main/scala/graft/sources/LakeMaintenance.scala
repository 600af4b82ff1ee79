package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction for partitioned parquet.
  *
  * Streaming ingest (micro-batch sinks, per-dump writes, backfills) leaves
  * partitions with many small files; at lake scale that inflates task
  * counts, NameNode/listing pressure and parquet footer overhead. This
  * rewrites each leaf partition directory whose file count exceeds its
  * size-derived target (`ceil(bytes / targetBytes)`) into exactly that
  * many files.
  *
  * Mechanics per partition: read the leaf dir -> `coalesce(target)` (no
  * shuffle — compaction is a file-layout change, not a repartition) ->
  * write to a sibling temp dir -> atomic-ish swap (delete + rename).
  * Partitions already at or under target are left untouched, so repeated
  * runs are no-ops. The driver loops partitions; each rewrite is a
  * distributed job. At cluster scale the swap runs against an object
  * store via the committer instead of rename — the planning logic
  * (size-derived target, leaf-dir walk, skip-if-compact) is unchanged.
  */
object LakeMaintenance {

  final case class CompactStat(partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact every leaf partition under `root`. Returns one stat per leaf
    * (rewritten or not). */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024): Seq[CompactStat] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stats = leafDirs(fs, new Path(root)).map { dir =>
      val files = fs.listStatus(dir).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val target = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
      if (files.length <= target) {
        CompactStat(dir.toString, files.length, files.length, bytes)
      } else {
        val tmp = new Path(dir.getParent, s".${dir.getName}_compact_tmp")
        fs.delete(tmp, true)
        spark.read.parquet(dir.toString)
          .coalesce(target)
          .write.parquet(tmp.toString)
        // swap: drop originals, move compacted files in, drop tmp
        files.foreach(f => fs.delete(f.getPath, false))
        fs.listStatus(tmp).filter(_.isFile)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            fs.rename(f.getPath, new Path(dir, f"compact-$i%05d.parquet"))
          }
        fs.delete(tmp, true)
        val after = fs.listStatus(dir).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        CompactStat(dir.toString, files.length, after, bytes)
      }
    }
    // The session's InMemoryFileIndex caches listings; readers planned
    // after an in-place rewrite would otherwise chase deleted part files.
    spark.catalog.refreshByPath(root)
    stats
  }

  /** Directories under `root` that directly contain parquet files. */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val entries = fs.listStatus(root)
    val here =
      if (entries.exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
        Seq(root)
      else Seq.empty
    here ++ entries.filter(_.isDirectory)
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap(d => leafDirs(fs, d.getPath))
  }
}
