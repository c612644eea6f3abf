package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Cross-session registration for continuous materialized-view
  * refresh loops (`REFRESH MATERIALIZED VIEW ... CONTINUOUS`).
  *
  * A JVM-local map alone cannot arbitrate the loop across sessions:
  * a second session's START cannot see the first's running query, so
  * two sessions could double-drive one view, and `STOP REFRESH` from
  * anywhere but the starting session had nothing to stop. The
  * arbitration therefore lives WHERE everything else here lives — in
  * storage: a heartbeat LEASE file under the view root
  * (`_continuous_lease.json`, atomic tmp+move publish like every
  * other sidecar).
  *
  * Contract:
  *  - START takes the lease (refusing while another session's lease
  *    is FRESH — younger than the stale window) and re-asserts it on
  *    every refresh epoch (the heartbeat).
  *  - A crashed loop stops heartbeating; once the lease is stale a
  *    later START takes over cleanly — crash debris never wedges a
  *    restart.
  *  - STOP from the owning session stops the query and releases the
  *    lease. STOP from ANY OTHER session releases the lease file; the
  *    owner's next heartbeat sees the loss and self-terminates
  *    (refresh is watermark-idempotent, so the epoch boundary is a
  *    safe stop point). A zombie loop resuming after a stale takeover
  *    dies the same way — at worst one redundant refresh races, and
  *    the view's transactional watermark makes that a no-op.
  *
  * Locking (one registry per session process): check-then-act
  * sequences run under the registry lock, but the stream START itself
  * runs OUTSIDE it — a slow source start must not serialize every
  * other view's START/STOP — with a `Starting` sentinel holding the
  * slot.
  */
private[graft] final class ContinuousRegistry {
  import ContinuousRegistry._

  /** This registry's identity — one per session process. */
  val ownerId: String = java.util.UUID.randomUUID().toString

  private val local = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Start the continuous loop for the view at `root` (absolute
    * path). Refuses while a live local query or a fresh foreign
    * lease exists.
    */
  def start(spark: SparkSession, root: String,
      interval: String): StreamingQuery = {
    val stale = staleMs(spark, root)
    synchronized {
      local.get(root) match {
        case q: StreamingQuery if q.isActive =>
          throw new IllegalArgumentException(
            s"continuous refresh already running for $root; " +
              "STOP REFRESH MATERIALIZED VIEW first")
        case Starting =>
          throw new IllegalArgumentException(
            s"continuous refresh already starting for $root")
        case q: StreamingQuery =>
          // a dead registration (self-terminated zombie, crashed
          // epoch) must not wedge the view — drop it and proceed
          local.remove(root, q)
        case _ => ()
      }
      readLease(root) match {
        case Some((o, ts)) if o != ownerId &&
            System.currentTimeMillis() - ts < stale =>
          throw new IllegalArgumentException(
            s"continuous refresh already running for $root " +
              s"(lease held by session $o; STOP REFRESH releases it, " +
              s"or it expires ${stale} ms after the last heartbeat)")
        case _ => ()
      }
      local.put(root, Starting)
    }
    try {
      writeLease(root)
      val q = IncrementalMatView.continuous(spark, root,
        Paths.get(root, "_continuous_cp").toString,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(interval),
        beforeEpoch = Some(() => heartbeat(root)))
      local.put(root, q)
      q
    } catch {
      case e: Throwable =>
        local.remove(root)
        releaseIfOwned(root)
        throw e
    }
  }

  /** Per-epoch heartbeat: re-assert OUR lease, or — if it was
    * released (cross-session STOP) or taken over (stale expiry) —
    * throw, terminating this loop instead of double-driving the view.
    */
  private def heartbeat(root: String): Unit =
    readLease(root) match {
      case Some((o, _)) if o == ownerId => writeLease(root)
      case _ => throw new IllegalStateException(
        s"continuous-refresh lease for $root was released or taken " +
          "over by another session; stopping this loop")
    }

  /** Stop the loop for `root`. Owning session: synchronous stop +
    * lease release (returns true). Foreign fresh lease: release it —
    * the owner self-terminates at its next heartbeat (returns false:
    * asynchronous). No query and no lease: error.
    */
  def stop(root: String): Boolean = {
    val q = synchronized {
      local.get(root) match {
        case s: AnyRef if s eq Starting =>
          throw new IllegalArgumentException(
            s"continuous refresh for $root is still starting; retry")
        case query: StreamingQuery => Some(query)
        case _ => None
      }
    }
    q match {
      case Some(query) =>
        // deregister only AFTER a successful stop: a stop() that
        // throws leaves the registration in place, so a later START
        // still refuses while the stream may yet be running
        query.stop()
        synchronized { local.remove(root, query) }
        releaseIfOwned(root)
        true
      case None =>
        if (readLease(root).isEmpty) throw new IllegalArgumentException(
          s"no continuous refresh running for $root")
        Files.deleteIfExists(leasePath(root))
        false
    }
  }

  private def writeLease(root: String): Unit = {
    val target = leasePath(root)
    val tmp = target.resolveSibling(
      target.getFileName.toString + s".$ownerId.tmp")
    Files.writeString(tmp,
      s"""{"owner":"$ownerId","ts":${System.currentTimeMillis()}}""")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def releaseIfOwned(root: String): Unit =
    readLease(root) match {
      case Some((o, _)) if o == ownerId =>
        Files.deleteIfExists(leasePath(root))
      case _ => ()
    }
}

private[graft] object ContinuousRegistry {
  private case object Starting

  /** Lease freshness window: a lease older than this is crash debris
    * and a new START takes over. Overridable per view through
    * TBLPROPERTIES (`graft.mv.lease.staleMs`); the default outlasts
    * many missed 1-second heartbeats without making takeover slow.
    */
  val DefaultStaleMs = 60000L
  private[graft] val StaleMsProp = "graft.mv.lease.staleMs"

  private def leasePath(root: String): Path =
    Paths.get(root, "_continuous_lease.json")

  private def staleMs(spark: SparkSession, root: String): Long =
    try GraftTable.load(spark, root).properties.get(StaleMsProp)
      .map(_.trim.toLong).getOrElse(DefaultStaleMs)
    catch { case scala.util.control.NonFatal(_) => DefaultStaleMs }

  /** (owner, heartbeat millis), or None when no/unreadable lease —
    * an unreadable lease reads as absent (the writer's atomic move
    * means this is a vanished-mid-read race, not a torn file).
    */
  private def readLease(root: String): Option[(String, Long)] =
    try {
      val p = leasePath(root)
      if (!Files.exists(p)) None
      else {
        val s = Files.readString(p)
        for {
          o <- """"owner":"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
          t <- """"ts":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
        } yield (o, t)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
