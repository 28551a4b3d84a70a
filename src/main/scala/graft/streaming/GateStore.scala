package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared append-only store plumbing for the streaming dedup gates: file
  * listing, atomic single-file batch append, compaction, and batch-counter
  * recovery. One implementation so a fix (filename parse, move ordering)
  * cannot drift between the three gates.
  *
  * Layout: `<dir>/<prefix>_NNNNN.parquet` per appended batch, plus
  * `<prefix>_NNNNN_c<nanos>.parquet` for compacted merges. The store
  * tolerates duplicated rows (every consumer anti-joins or DISTINCTs), so
  * compaction needs no manifest: the merged file lands before the old
  * files are unlinked, and a crash in between only re-reads bytes.
  */
private[streaming] object GateStore {

  def files(dir: Path): Array[String] = {
    val d = dir.toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)
  }

  /** Highest batch number recorded in the dir's filenames — compacted
    * files (`_c` suffix) count via their numeric prefix. */
  def maxBatch(dir: Path, prefix: String): Long = {
    val re = (java.util.regex.Pattern.quote(prefix) + "_(\\d+)").r
    files(dir).flatMap(f => re.findFirstMatchIn(new java.io.File(f).getName)
      .map(_.group(1).toLong)).foldLeft(0L)(math.max)
  }

  /** Write `rows` as ONE parquet file `<prefix>_<batch>.parquet` via
    * temp-write + atomic rename. */
  def append(rows: DataFrame, dir: Path, prefix: String, batch: Long): Unit = {
    val tmp = Files.createTempFile(dir, s".tmp_$prefix", ".inprogress")
    val stage = Files.createTempDirectory(dir, ".stage")
    try {
      rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Option(stage.toFile.listFiles())
        .getOrElse(Array.empty).find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no $prefix part written"))
      Files.move(part.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, dir.resolve(f"${prefix}%s_$batch%05d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
    } finally {
      Files.deleteIfExists(tmp)
      deleteRecursively(stage.toFile)
    }
  }

  /** Fold all store files into one (DISTINCT over `cols`). */
  def compact(spark: SparkSession, dir: Path, prefix: String,
      cols: Seq[String], batch: Long): Unit = {
    val fs = files(dir)
    if (fs.length > 1) {
      val stage = Files.createTempDirectory(dir, ".stage")
      val tmp = Files.createTempFile(dir, ".tmp_compact", ".inprogress")
      try {
        spark.read.parquet(fs: _*).select(cols.head, cols.tail: _*).distinct()
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = Option(stage.toFile.listFiles())
          .getOrElse(Array.empty).find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException("no compacted part written"))
        Files.move(part.toPath, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, dir.resolve(
          f"${prefix}%s_$batch%05d_c${System.nanoTime()}%d.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
        fs.foreach(f => Files.deleteIfExists(Paths.get(f)))
      } finally {
        Files.deleteIfExists(tmp)
        deleteRecursively(stage.toFile)
      }
    }
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
