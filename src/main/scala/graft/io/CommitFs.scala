package graft.io

import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** The storage COMMIT-POINT seam: every durable state transition in the
  * engine's store layer (CV matrel manifests, gate-store appends, the
  * exactly-once spool/marker protocol) funnels through these three
  * primitives. They are exactly where filesystem semantics differ between
  * deployment targets, so an object-store port swaps ONE implementation
  * instead of auditing java.nio call sites across ten files:
  *
  *  - `publish(tmp, dest)`: a fully-written temp file becomes visible
  *    under its final name, all-or-nothing. Local/HDFS: atomic rename
  *    (`durable` adds data-fsync before + dirent-fsync after — HDFS gets
  *    durability from pipeline replication instead and may no-op the
  *    syncs). S3 (no rename): upload the temp object, then commit with a
  *    conditional PUT (`If-None-Match: *`) of the final key — one extra
  *    PUT per publish, and the read side must tolerate eventual listing
  *    of the orphaned temp key.
  *  - `writeMarker(path)`: an empty file whose EXISTENCE is the fact
  *    (delivery watermarks). Local: create + fsync. S3: zero-byte PUT —
  *    already atomic, `durable` is free.
  *  - `rename(src, dest)`: non-commit housekeeping (quarantining a
  *    corrupt spool). Local: plain move. S3: copy + delete, and partial
  *    failure is acceptable — the caller treats it as best-effort.
  *
  * What this seam deliberately does NOT cover: bulk data reads/writes
  * (`spark.read.parquet` and DataFrame writes already speak any Hadoop
  * filesystem URI) and directory listings (`GateSpool.spoolEpochs`,
  * manifest bucket dirs — Hadoop `FileSystem.listStatus` is a drop-in
  * when the paths stop being `java.nio.Path`). The full byte/operation
  * math per target and the read-side invariants live in DESIGN_NOTES
  * "Shared-storage commit points".
  *
  * Reference anchor: the reference's matrels are ordinary heap tables on
  * the database's shared storage (pipeline_query.c:1600-1900) — storage
  * placement is never a correctness question there; this seam is where
  * the Spark re-expression keeps that property portable.
  */
trait CommitFs {

  /** Atomically publish fully-written `tmp` as `dest`. `durable`: the
    * commit must survive power loss, not just process crash (the
    * exactly-once spool pays this; store appends — the documented
    * at-least-once class — do not). `replace`: overwrite an existing
    * `dest` (manifest-pointer swaps); without it, publishing onto an
    * existing name may fail. */
  def publish(tmp: Path, dest: Path, durable: Boolean,
      replace: Boolean = false): Unit

  /** Create the empty marker file `path` (existence = the fact). */
  def writeMarker(path: Path, durable: Boolean): Unit

  /** Best-effort housekeeping move (quarantine); never a commit point. */
  def rename(src: Path, dest: Path): Unit
}

object CommitFs {
  /** Process-wide active implementation. Local-only today; an
    * object-store deployment installs its implementation at startup. */
  @volatile var current: CommitFs = LocalCommitFs
}

/** POSIX implementation — the semantics every store protocol was built
  * and spec-pinned against: atomic same-directory rename, fsync(file)
  * persists data, fsync(dir) persists the rename/create dirent. */
object LocalCommitFs extends CommitFs {

  override def publish(tmp: Path, dest: Path, durable: Boolean,
      replace: Boolean): Unit = {
    if (durable) fsyncFile(tmp)
    if (replace)
      Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    else Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    if (durable) fsyncDir(dest.getParent)
    ()
  }

  override def writeMarker(path: Path, durable: Boolean): Unit = {
    Files.write(path, Array.emptyByteArray)
    if (durable) {
      try fsyncFile(path) catch { case _: Throwable => () }
      fsyncDir(path.getParent)
    }
    ()
  }

  override def rename(src: Path, dest: Path): Unit = {
    try { Files.move(src, dest); () } catch { case _: Throwable => () }
  }

  /** fsync a file's data+metadata (the spool commit's durability half). */
  def fsyncFile(p: Path): Unit = {
    val ch = java.nio.channels.FileChannel.open(p, StandardOpenOption.WRITE)
    try ch.force(true) finally ch.close()
  }

  /** Best-effort directory fsync (persists renames/creates on Linux;
    * filesystems that refuse a read-open dir channel just skip it). */
  def fsyncDir(dir: Path): Unit =
    try {
      val ch = java.nio.channels.FileChannel.open(dir, StandardOpenOption.READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Throwable => () }
}
