package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Crash-safe replace-in-place for a persisted parquet directory (r16,
  * ADVICE) — the [[graft.streaming.DocPipeline]] compact-swap pattern
  * factored out for the index artifacts.
  *
  * The hazard it replaces: `read → localCheckpoint(eager) → overwrite
  * own source`. A localCheckpoint block is UNREPLICATED executor
  * memory/disk state with truncated lineage — on a real cluster, any
  * executor loss (or dynamic-allocation reclaim) after the source
  * directory is deleted but before the rewrite commits loses the only
  * copy of the index irrecoverably. Here the rewrite lands in a
  * `.compact` sibling FIRST (reading straight from the durable source —
  * no checkpoint needed at all), and only then swaps in with renames:
  *
  *   write tmp → delete stale old → rename(live, old) →
  *   rename(tmp, live) → delete old
  *
  * Every crash window leaves a durable copy: before the first rename
  * the source is untouched; between the renames the live path is
  * absent but `.compact` (with its `_SUCCESS` marker proving the job
  * committed) or `.old` holds the data — [[recover]], called at the
  * head of every reader, heals that window by preferring the committed
  * `.compact` and falling back to `.old`. Same data either way, so
  * recovery never picks a half-written state.
  */
object AtomicSwap {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hadoop's FileSystem.rename signals failure by RETURNING FALSE
    * (destination exists after a failed delete, cross-FS move, …), not
    * by throwing (r17, ADVICE) — an unchecked rename lets a swap
    * "succeed" half-done and serve the stale layout silently. Every
    * rename in this file goes through here so a failed one fails loudly
    * at the swap, not as a wrong answer downstream.
    */
  private def renameOrDie(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst),
      s"AtomicSwap: rename($src, $dst) returned false — swap aborted")

  /** Heal an interrupted [[swapIn]], if one is detected: the live path
    * absent with a `.compact`/`.old` sibling on disk. Idempotent and
    * cheap (one exists() when healthy) — call before reading a
    * swappable artifact.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) {
      val tmp = new Path(path + ".compact")
      val old = new Path(path + ".old")
      if (fs.exists(new Path(tmp, "_SUCCESS"))) {
        renameOrDie(fs, tmp, p)
        fs.delete(old, true)
      } else if (fs.exists(old)) {
        renameOrDie(fs, old, p)
        fs.delete(tmp, true)
      }
    }
  }

  /** Replace the directory at `path` with whatever `write` produces at
    * the `.compact` sibling, atomically at rename granularity. `write`
    * receives the tmp path and must commit a complete parquet dir there
    * (including `_SUCCESS` — the recovery discriminator). Run between
    * appends, not concurrently with a reader.
    */
  def swapIn(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    recover(spark, path)
    val fs = fsOf(spark, path)
    val p = new Path(path)
    val tmp = new Path(path + ".compact")
    val old = new Path(path + ".old")
    fs.delete(tmp, true) // stale tmp from an abandoned attempt
    write(tmp.toString)
    fs.delete(old, true)
    renameOrDie(fs, p, old)
    renameOrDie(fs, tmp, p)
    fs.delete(old, true)
  }
}
