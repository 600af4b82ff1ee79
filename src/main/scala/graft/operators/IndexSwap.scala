package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The two-phase, marker-committed directory swap shared by the index
  * rebuild paths ([[Similarity.rebalanceIvfIndex]],
  * [[PQ.rebalancePqIndex]]): every rebuilt side writes COMPLETELY into
  * a dot-prefixed `.{side}_rebal_tmp` sibling, a `.rebal_committed`
  * marker lands, and only then do the live dirs swap (live -> .old
  * aside, tmp -> live, asides deleted, marker deleted). Every
  * interrupted state heals on [[recover]]: marker present rolls
  * FORWARD (finishes the swap), marker absent rolls BACK (drops the
  * tmp siblings; the live dirs were never touched) — no crash state
  * loses the only copy of the index. The `LakeMaintenance`
  * compact-swap discipline, at whole-index granularity.
  */
private[graft] object IndexSwap {

  def fsOf(s: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(s.sessionState.newHadoopConf())

  def marker(path: String): Path = new Path(s"$path/.rebal_committed")

  /** The staging sibling a rebuild writes `side` into before commit. */
  def tmp(path: String, side: String): Path =
    new Path(s"$path/.${side}_rebal_tmp")

  /** Commit a fully-staged rebuild: land the marker, then complete the
    * swap. Call only after EVERY side's tmp dir is completely written —
    * the marker is the point of no return. */
  def commit(s: SparkSession, path: String, sides: Seq[String]): Unit = {
    fsOf(s, path).create(marker(path), true).close()
    finish(s, path, sides)
  }

  /** Complete the marker-committed swap: idempotent per side, so a
    * crash at ANY rename resumes here. */
  def finish(s: SparkSession, path: String, sides: Seq[String]): Unit = {
    val fs = fsOf(s, path)
    sides.foreach { side =>
      val live = new Path(s"$path/$side")
      val tmpP = tmp(path, side)
      val old = new Path(s"$path/.${side}_rebal_old")
      if (fs.exists(tmpP)) {
        if (fs.exists(live)) {
          if (!fs.exists(old)) require(fs.rename(live, old), s"rebalance: aside of $live failed")
          else fs.delete(live, true): Unit // live was a partial tmp move of a resumed swap
        }
        require(fs.rename(tmpP, live), s"rebalance: swap-in of $tmpP failed")
      }
      if (fs.exists(old)) fs.delete(old, true): Unit
    }
    fs.delete(marker(path), false): Unit
  }

  /** Heal an interrupted swap: committed marker -> roll FORWARD (finish
    * the swap); no marker -> roll BACK (drop any half-written tmp
    * siblings; the live dirs were never touched). */
  def recover(s: SparkSession, path: String, sides: Seq[String]): Unit = {
    val fs = fsOf(s, path)
    if (fs.exists(marker(path))) finish(s, path, sides)
    else sides.foreach { side =>
      if (fs.exists(tmp(path, side))) fs.delete(tmp(path, side), true): Unit
    }
  }
}
