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
  * Mechanics per partition: read the leaf dir (with `mergeSchema` — a
  * schema-evolved partition mixing old and new footers must not lose the
  * evolved columns in the rewrite) -> `coalesce(target)` (no shuffle —
  * compaction is a file-layout change, not a repartition) -> write to a
  * sibling temp dir -> crash-safe swap.
  *
  * The swap is a two-phase move, never delete-then-hope:
  *   1. originals rename into a sibling `.<dir>_compact_old` aside dir;
  *   2. a `_committed` marker lands in the temp dir;
  *   3. compacted files rename into the partition;
  *   4. aside dir then temp dir are deleted, in that order.
  * Every interrupted state is recoverable by rerunning `compact`: an
  * aside dir with no marker rolls BACK (originals restored); an aside
  * dir with the marker rolls FORWARD (remaining compacted files moved
  * in). No window exists where the only copy of the data lives in a
  * dot-prefixed dir that a rerun ignores.
  *
  * Partitions already at or under target are left untouched, so repeated
  * runs are no-ops. The driver loops partitions; each rewrite is a
  * distributed job. At cluster scale the swap runs against an object
  * store via the committer instead of rename — the planning logic
  * (size-derived target, leaf-dir walk, skip-if-compact) is unchanged.
  */
object LakeMaintenance {

  final case class CompactStat(partition: String, filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Compact every leaf partition under `root`. Returns one stat per leaf
    * (rewritten or not).
    *
    * `writerOptions` carries per-column parquet writer config through the
    * rewrite — without it, compacting a bloom-enabled lake silently DROPS
    * the bloom filters (the rewrite is a fresh parquet write; filters are
    * write-time artifacts, not data), and point lookups degrade from
    * row-group skipping to full scans with no correctness signal. Pass
    * the same `parquet.bloom.filter.*` options the ingest writer used
    * (BloomLakeSpec pins survival through a compaction).
    */
  def compact(spark: SparkSession, root: String,
              targetBytes: Long = 128L * 1024 * 1024,
              writerOptions: Map[String, String] = Map.empty): Seq[CompactStat] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaves = leafDirs(fs, new Path(root))
    // Bucketed-table guard, as a PRE-PASS over every leaf before any
    // rewrite touches the lake: bucket identity lives in the FILE NAME
    // (`part-...-<uuid>_00003.c000...` — the _NNNNN is the bucket id,
    // resolved against the metastore spec). A coalesce rewrite would
    // produce unbucketed names and silently break every zero-exchange
    // join planned against the table. Guarding mid-loop would abort a
    // mixed root HALF-compacted; failing up front leaves it untouched.
    // Rewrite bucketed data through the table (INSERT OVERWRITE), never
    // through this file-level path.
    leaves.foreach { dir =>
      fs.listStatus(dir)
        .find(f => f.isFile && bucketedName.matches(f.getPath.getName))
        .foreach { f =>
          throw new IllegalArgumentException(
            s"compact: $dir holds bucketed-table files (${f.getPath.getName}) — " +
              "file-level compaction would destroy bucket identity")
        }
    }
    val stats = try leaves.map { dir =>
      recoverSwap(fs, dir)
      val files = fs.listStatus(dir).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val target = math.max(1, ((bytes + targetBytes - 1) / targetBytes).toInt)
      if (files.length <= target) {
        CompactStat(dir.toString, files.length, files.length, bytes)
      } else {
        val tmp = tmpDir(dir)
        val aside = asideDir(dir)
        fs.delete(tmp, true)
        // mergeSchema: a schema-evolved partition (old files missing columns
        // later ingests added) must rewrite with the UNION of footers, not
        // whichever single footer the reader happens to pick.
        spark.read.option("mergeSchema", "true").parquet(dir.toString)
          .coalesce(target)
          .write.options(writerOptions).parquet(tmp.toString)
        // Phase 1: move originals aside (recoverable — roll back restores them).
        fs.mkdirs(aside)
        files.foreach(f => require(fs.rename(f.getPath, new Path(aside, f.getPath.getName)),
          s"compact: failed to move ${f.getPath} aside"))
        // Commit point: from here a rerun rolls FORWARD.
        fs.create(new Path(tmp, CommitMarker)).close()
        // Phase 2: move compacted files in. Spark part-file names embed a job
        // UUID, so they can't collide with originals of any earlier run.
        fs.listStatus(tmp).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach(f => require(fs.rename(f.getPath, new Path(dir, f.getPath.getName)),
            s"compact: failed to move ${f.getPath} into $dir"))
        fs.delete(aside, true)
        fs.delete(tmp, true)
        val after = fs.listStatus(dir).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        CompactStat(dir.toString, files.length, after, bytes)
      }
    } finally {
      // The session's InMemoryFileIndex caches listings; readers planned
      // after an in-place rewrite would otherwise chase deleted part
      // files. In a finally: even a failure partway through a multi-leaf
      // run has already rewritten EARLIER leaves in place, and those
      // must not be served from the stale cache.
      spark.catalog.refreshByPath(root)
    }
    stats
  }

  /** Spark bucketed part files: `part-00000-<uuid>_00003.c000.snappy.parquet`
    * (bucket id `_NNNNN` before the `.c`); plain writes use `-c000`. */
  private val bucketedName = "part-\\d+-.*_\\d{5}\\.c\\d+.*\\.parquet".r

  private val CommitMarker = "_committed"
  private def tmpDir(dir: Path) = new Path(dir.getParent, s".${dir.getName}_compact_tmp")
  private def asideDir(dir: Path) = new Path(dir.getParent, s".${dir.getName}_compact_old")

  /** Repair a swap interrupted by a crash. Aside dir present + commit
    * marker in tmp => originals were fully moved aside and the compacted
    * set is complete: roll forward (finish moving compacted files in).
    * Aside dir present, no marker => roll back (restore originals).
    * Lone tmp dir (crash mid-write) is just deleted. */
  private def recoverSwap(fs: FileSystem, dir: Path): Unit = {
    val tmp = tmpDir(dir)
    val aside = asideDir(dir)
    if (fs.exists(aside)) {
      fs.mkdirs(dir) // the partition dir itself may have vanished mid-swap
      val committed = fs.exists(new Path(tmp, CommitMarker))
      val src = if (committed) tmp else aside
      if (!committed && fs.exists(tmp)) {
        // No marker => phase 2 never started, so the partition holds no
        // compacted files; discard the compacted copy and restore originals.
        fs.delete(tmp, true)
      }
      if (fs.exists(src)) {
        fs.listStatus(src).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            val dest = new Path(dir, f.getPath.getName)
            if (!fs.exists(dest)) require(fs.rename(f.getPath, dest),
              s"compact recovery: failed to restore ${f.getPath}")
          }
      }
      fs.delete(aside, true)
      fs.delete(tmp, true)
    } else if (fs.exists(tmp)) {
      fs.delete(tmp, true)
    }
  }

  /** Directories under `root` that directly contain parquet files — plus
    * any dir with a leftover swap aside/tmp sibling (a crash can leave a
    * partition momentarily empty of parquet; it still needs recovery). */
  private def leafDirs(fs: FileSystem, root: Path): Seq[Path] = {
    val entries = fs.listStatus(root)
    val here =
      if (entries.exists(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
        Seq(root)
      else Seq.empty
    val pendingSwap = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => n.startsWith(".") && (n.endsWith("_compact_old") || n.endsWith("_compact_tmp")))
      .map(n => new Path(root, n.stripPrefix(".").stripSuffix("_compact_old").stripSuffix("_compact_tmp")))
    here ++ (entries.filter(_.isDirectory)
      .filterNot(_.getPath.getName.startsWith("."))
      .map(_.getPath) ++ pendingSwap).distinct
      .flatMap { d =>
        val sub = if (fs.exists(d)) leafDirs(fs, d) else Seq.empty
        // a pending-swap dir may itself list as non-leaf (no parquet yet)
        if (sub.isEmpty && pendingSwap.contains(d)) Seq(d) else sub
      }
  }
}
