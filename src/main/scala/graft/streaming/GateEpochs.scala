package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame}
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

  private val spoolRe = """fwd_(\d+)\.parquet""".r
  private val markerRe = """delivered_(\d+)""".r

  private def spoolEpochs(): Seq[(Long, Path)] = {
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      f.getName match {
        case spoolRe(e) => Some((e.toLong, f.toPath))
        case _ => None
      }
    }.sortBy(_._1)
  }

  private def deliveredEpoch(): Long = {
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      f.getName match {
        case markerRe(e) => Some(e.toLong)
        case _ => None
      }
    }.foldLeft(0L)(math.max)
  }

  /** Highest epoch this spool has seen (bootstrap counter floor). */
  def maxEpoch(): Long =
    math.max(spoolEpochs().lastOption.map(_._1).getOrElse(0L), deliveredEpoch())

  /** THE commit point: the full prepared batch + `__admitted` lands as one
    * atomically-renamed parquet file. The flag (true unless `orderCol` is
    * in `suppressed`; NULL order ids always admitted) is built through
    * [[GateStore.withAdmittedFlag]], so a batch-sized suppressed set rides
    * the spool job as a broadcast join side instead of every task binary —
    * the same bound the survivor filters carry. */
  def spool(epoch: Long, keyed: DataFrame, orderCol: String,
      suppressed: java.util.HashSet[Any]): Unit =
    GateStore.append(
      GateStore.withAdmittedFlag(keyed, orderCol, suppressed.toArray,
        "__admitted"),
      spoolDir, "fwd", epoch)

  /** Deliver epoch `epoch`'s admitted subset to the sink and mark it. */
  def deliverAndMark(epoch: Long): Unit = {
    val spooled = eng.spark.read.parquet(
      spoolDir.resolve(f"fwd_$epoch%05d.parquet").toString)
    val admitted = spooled.where(col("__admitted"))
      .drop("__admitted").drop(dropCols: _*)
    if (admitted.take(1).nonEmpty) eng.insertInto(sink, admitted)
    failpoint("after-deliver")
    markDelivered(epoch)
  }

  private def markDelivered(epoch: Long): Unit = {
    Files.write(spoolDir.resolve(s"delivered_$epoch"), Array.emptyByteArray)
    val d = spoolDir.toFile
    Option(d.listFiles()).getOrElse(Array.empty).foreach { g =>
      g.getName match {
        case spoolRe(e) if e.toLong <= epoch => g.delete(); ()
        case markerRe(e) if e.toLong < epoch => g.delete(); ()
        case _ =>
      }
    }
  }

  /** Store half of recovery — engine-API-free (file ops + reads + the
    * cores' commit hooks), safe under the registration lock the DDL-replay
    * path holds during bootstrap. Delivery completes at the next batch
    * head (or an explicit recover). */
  def recoverStores(): Unit = {
    val delivered = deliveredEpoch()
    spoolEpochs().filter(_._1 > delivered).foreach { case (e, path) =>
      val spooled = eng.spark.read.parquet(path.toString).persist()
      try commitRecoveredHook(spooled, e)
      finally { spooled.unpersist(); () }
    }
  }

  /** Finish every epoch whose spool committed but whose marker didn't:
    * rebuild missing store appends, deliver, mark. Runs at the head of
    * every exactly-once batch so restart-recovery and in-process retry
    * converge on the same state. */
  def recoverPending(): Unit = {
    val delivered = deliveredEpoch()
    spoolEpochs().filter(_._1 > delivered).foreach { case (e, path) =>
      val spooled = eng.spark.read.parquet(path.toString).persist()
      try commitRecoveredHook(spooled, e)
      finally { spooled.unpersist(); () }
      deliverAndMark(e)
    }
  }
}
