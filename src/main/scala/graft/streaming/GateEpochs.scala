package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cv.ContViewEngine

/** The exactly-once epoch protocol for the near-dup / contamination gate
  * family — the [[StreamDedupGate]] spool generalized to gates whose store
  * records EVERY arrival (seen-based suppression), not just admitted
  * winners. The exact gate can rebuild its store from a survivors-only
  * spool (admitted keys ARE the store rows); a near-dup gate cannot — a
  * suppressed row still becomes a suppressor — so the spool here carries
  * the FULL prepared batch plus an `__admitted` flag, and recovery
  * re-derives every store append from it (bucket keys / sketches are pure
  * functions of the spooled payload, [[ShardableGateCore.commitRecovered]]).
  *
  * Per batch: decide as usual, then (1) spool `fwd_<E>.parquet` via
  * temp-write + atomic rename — THE commit point; (2) run the store
  * commits; (3) deliver the admitted subset to the sink; (4) drop the
  * `delivered_<E>` marker. Recovery finishes any epoch whose spool exists
  * but whose marker doesn't: rebuild whichever store appends are missing
  * (idempotent — duplicated store rows change nothing), deliver, mark.
  * A crash before the spool rename loses nothing (the upstream retry
  * re-decides identically); after it, the retry's re-fed content is fully
  * suppressed by the recovered store. Residual windows are the exact
  * gate's, documented not hidden: a crash between delivery and marker
  * re-delivers that epoch (the irreducible ack window of a
  * non-transactional sink), and null-order-id rows carry no identity and
  * stay at-least-once under upstream re-feed.
  *
  * Reference anchor: microbatch.h:33-56 — `sync_commit` applies to every
  * CQ kind, which is why the whole gate family carries the option.
  */
private[streaming] final class GateEpochs(
    eng: ContViewEngine,
    name: String,
    sink: String,
    spoolDir: Path,
    commitRecoveredHook: (DataFrame, Long) => Unit,
    dropCols: Seq[String]) {

  def this(eng: ContViewEngine, name: String, sink: String, spoolDir: Path,
      cores: Seq[ShardableGateCore], dropCols: Seq[String]) =
    this(eng, name, sink, spoolDir,
      (df: DataFrame, e: Long) => cores.foreach(_.commitRecovered(df, e)),
      dropCols)

  Files.createDirectories(spoolDir)

  // test failpoint: throws once when execution reaches the named point
  private[graft] var failAt: String = null
  @inline private[streaming] def failpoint(p: String): Unit =
    if (p == failAt) {
      failAt = null
      throw new IllegalStateException(s"failpoint:$p")
    }

  /** Highest epoch this spool has seen (bootstrap counter floor). */
  def maxEpoch(): Long = math.max(
    GateSpool.spoolEpochs(spoolDir).lastOption.map(_._1).getOrElse(0L),
    GateSpool.deliveredEpoch(spoolDir))

  /** THE commit point: the full prepared batch + `__admitted` lands as one
    * atomically-renamed parquet file, fsynced (data before the rename,
    * dirent after) so the commit survives power loss, not just process
    * crash. The flag (true unless `orderCol` is in `suppressed`; NULL
    * order ids always admitted) is built through
    * [[GateStore.withAdmittedFlag]], so a batch-sized suppressed set rides
    * the spool job as a broadcast join side instead of every task binary —
    * the same bound the survivor filters carry. */
  def spool(epoch: Long, keyed: DataFrame, orderCol: String,
      suppressed: java.util.HashSet[Any]): Unit =
    GateStore.append(
      GateStore.withAdmittedFlag(keyed, orderCol, suppressed.toArray,
        "__admitted"),
      spoolDir, "fwd", epoch, force = true)

  /** Deliver epoch `epoch`'s admitted subset to the sink and mark it.
    * `knownNonEmpty`: the batch path already knows whether any row was
    * admitted (n = total − suppressed) — passing it skips a whole
    * emptiness-probe job per batch; recovery, which doesn't know, omits
    * it and pays the probe. */
  def deliverAndMark(epoch: Long,
      knownNonEmpty: Option[Boolean] = None): Unit = {
    val spooled = eng.spark.read.parquet(
      spoolDir.resolve(f"fwd_$epoch%05d.parquet").toString)
    val admitted = spooled.where(col("__admitted"))
      .drop("__admitted").drop(dropCols: _*)
    if (knownNonEmpty.getOrElse(admitted.take(1).nonEmpty))
      eng.insertInto(sink, admitted)
    failpoint("after-deliver")
    GateSpool.markDelivered(spoolDir, epoch)
  }

  /** Store half of recovery — engine-API-free (file ops + reads + the
    * cores' commit hooks), safe under the registration lock the DDL-replay
    * path holds during bootstrap. Delivery completes at the next batch
    * head (or an explicit recover). */
  def recoverStores(): Unit = recoverEach(deliver = false)

  /** Finish every epoch whose spool committed but whose marker didn't:
    * rebuild missing store appends, deliver, mark. Runs at the head of
    * every exactly-once batch so restart-recovery and in-process retry
    * converge on the same state. */
  def recoverPending(): Unit = recoverEach(deliver = true)

  /** ONE recovery loop for both halves (restart bootstrap delivers at the
    * next batch head; in-process retry delivers inline) — a guard or
    * persist-semantics change cannot drift between them. An UNREADABLE
    * spool file (power loss persisted the rename but not the data) is
    * quarantined by [[GateSpool.readSpool]] instead of wedging every
    * future batch: that epoch's rows become the documented at-least-once
    * loss class (the upstream retry re-feeds them). */
  private def recoverEach(deliver: Boolean): Unit = {
    val delivered = GateSpool.deliveredEpoch(spoolDir)
    GateSpool.spoolEpochs(spoolDir).filter(_._1 > delivered).foreach {
      case (e, path) =>
        GateSpool.readSpool(eng.spark, path, s"gate $name epoch $e").foreach {
          df =>
            val spooled = df.persist()
            try commitRecoveredHook(spooled, e)
            finally { spooled.unpersist(); () }
            if (deliver) deliverAndMark(e)
        }
    }
  }
}

/** The spool/marker FILE PROTOCOL, shared by [[GateEpochs]] (the
  * seen-based gate family) and [[StreamDedupGate]]'s survivors-only spool
  * — one implementation so a fix to filename parsing, delete ordering, or
  * the marker convention cannot drift between them. */
private[streaming] object GateSpool {

  val spoolRe: scala.util.matching.Regex = """fwd_(\d+)\.parquet""".r
  val markerRe: scala.util.matching.Regex = """delivered_(\d+)""".r

  /** Pending + undelivered spool files, ascending by epoch. */
  def spoolEpochs(spoolDir: Path): Seq[(Long, Path)] = {
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      f.getName match {
        case spoolRe(e) => Some((e.toLong, f.toPath))
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** Highest delivered-marker epoch (0 when none — epochs start at 1). */
  def deliveredEpoch(spoolDir: Path): Long = {
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      f.getName match {
        case markerRe(e) => Some(e.toLong)
        case _ => None
      }
    }.foldLeft(0L)(math.max)
  }

  /** Drop the `delivered_<epoch>` marker (fsynced — a vanished marker
    * widens re-delivery past the documented ack window) and delete dead
    * spools/markers at or below the watermark. */
  def markDelivered(spoolDir: Path, epoch: Long): Unit = {
    val marker = spoolDir.resolve(s"delivered_$epoch")
    Files.write(marker, Array.emptyByteArray)
    try GateStore.fsyncFile(marker) catch { case _: Throwable => () }
    GateStore.fsyncDir(spoolDir)
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).foreach { g =>
      g.getName match {
        case spoolRe(e) if e.toLong <= epoch => g.delete(); ()
        case markerRe(e) if e.toLong < epoch => g.delete(); ()
        case _ =>
      }
    }
  }

  /** Open a spool file, quarantining an unreadable one (renamed to
    * `<name>.corrupt`, loudly logged) instead of letting a poison file
    * wedge every future recovery pass — None means "skip this epoch". */
  def readSpool(spark: org.apache.spark.sql.SparkSession, path: Path,
      what: String): Option[DataFrame] =
    try Some(spark.read.parquet(path.toString))
    catch {
      case e: Throwable =>
        val corrupt = path.resolveSibling(path.getFileName.toString + ".corrupt")
        try { Files.move(path, corrupt); () } catch { case _: Throwable => () }
        System.err.println(s"[graft] $what: spool file ${path.getFileName} " +
          s"is unreadable (${e.getClass.getSimpleName}: ${e.getMessage}) — " +
          s"quarantined to ${corrupt.getFileName}; that epoch's rows fall " +
          "to the at-least-once class (upstream retry re-feeds them)")
        None
    }
}
