package graft.sources.cdc

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/**
 * The WRITE half of the `graft-cdc` format — the feed PRODUCER as a real
 * DataSourceV2 sink, closing the round-trip: a batch job (or a running
 * stream) can emit add/remove deliveries into a feed directory that a
 * downstream [[CdcMicroBatchStream]] consumer paces through one delivery
 * per trigger. One COMMIT = one atomically-published `batch-<n>.cdc`
 * file (batch write: the whole job is one delivery; streaming write: one
 * delivery per epoch) — the delivery boundary every lifecycle maintainer
 * keys on.
 *
 * Two-phase protocol: each task's [[DataWriter]] writes its partition's
 * lines to a private temp file under `<path>/.staging/` (executor-side
 * IO on the shared feed filesystem, the same assumption every file sink
 * makes) and its commit message carries the temp path + line/byte
 * counts; the driver-side commit concatenates the temps IN PARTITION
 * ORDER into the next feed file and publishes it with the same
 * tmp+rename the producer helper uses — a reader can never observe a
 * half-written delivery. Aborts delete the temps. Concatenation is
 * driver-side but DELIVERY-sized (the lifecycle contract's cost class);
 * feed ORDER within a delivery is advisory anyway — consumers net
 * per-doc by `seq`.
 *
 * Contract: append-only (one producer per feed directory; the next
 * batch index is max-on-disk + 1 at commit time), schema must be
 * [[CdcFeed.schema]] by name (op, seq, doc_id, ts, text — `ts` is
 * floor-truncated to whole seconds, the feed's event-time grain), and
 * an EMPTY delivery commits an empty batch file (a heartbeat the
 * admission-controlled reader paces past like any other file).
 */
private[cdc] class CdcWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = {
    val s = info.schema()
    val exp = CdcFeed.schema
    require(s.fieldNames.toSeq == exp.fieldNames.toSeq &&
        exp.fieldNames.forall(n => s(n).dataType == exp(n).dataType),
      s"graft-cdc: write schema must be ${exp.simpleString}, got ${s.simpleString}")
    new CdcWrite(path, info.queryId())
  }
}

private[cdc] class CdcWrite(path: String, queryId: String) extends Write {
  override def toBatch: BatchWrite = new CdcBatchWrite(path)
  override def toStreaming: StreamingWrite = new CdcStreamingWrite(path, queryId)
  override def description(): String = s"graft-cdc(`$path`)"
}

/** Task-side commit evidence: where the temp landed and what it holds. */
private[cdc] case class CdcTaskCommit(tempPath: String, partitionId: Int,
                                      lines: Long)
  extends WriterCommitMessage

private[cdc] object CdcCommit {
  /** Concatenate the task temps (partition order) into the next feed
    * file and publish atomically; delete the temps and sweep the staging
    * directory. With `epochToken` set (streaming), the publish is
    * IDEMPOTENT per epoch: an epoch re-executed after a driver failure
    * between the sink publish and Spark's own commit-log write finds its
    * marker already on disk and no-ops instead of double-publishing the
    * delivery — downstream lifecycle consumers would otherwise
    * double-ingest it. The token is `<queryId>/<epochId>` — NAMESPACED
    * by the streaming query, because bare epoch ids collide: a producer
    * restarted with a FRESH checkpoint restarts epochs at 0, and
    * batch-00000 already carries marker 0, so its first deliveries would
    * silently no-op (data loss from a supported ops action). The query
    * id is stable across restarts of the SAME checkpoint (the legal
    * re-execution window) and fresh for a new checkpoint or a second
    * query, so exactly the re-executions no-op and nothing else. */
  def publish(path: String, messages: Array[WriterCommitMessage],
              epochToken: Option[String] = None): Option[File] = {
    CdcFeed.recoverPendingCompactions(path) // producer self-heal
    if (epochToken.exists(t => CdcFeed.epochPublished(path, t))) {
      discard(messages); sweepStaging(path); return None
    }
    val msgs = messages.collect { case m: CdcTaskCommit => m }
      .sortBy(_.partitionId)
    val d = new File(path)
    if (!d.exists()) d.mkdirs()
    val next = CdcFeed.listBatchFiles(path)
      .flatMap(f => CdcFeed.batchIndexOf(new File(f).getName))
      .foldLeft(-1)(math.max) + 1
    val tmp = new File(d, f".batch-$next%05d.cdc.tmp")
    val out = new FileOutputStream(tmp)
    try msgs.foreach { m =>
      Files.copy(Paths.get(m.tempPath), out)
      out.flush()
    } finally out.close()
    val dst = new File(d, f"batch-$next%05d.cdc")
    // index (and epoch marker) first, then the atomic data publish
    CdcFeed.publishWithIndex(tmp, dst, epochToken)
    msgs.foreach(m => new File(m.tempPath).delete())
    sweepStaging(path)
    Some(dst)
  }

  /** Grace window before a leftover staging temp is swept: young temps
    * may belong to a still-running speculative/zombie attempt of the
    * NEXT epoch, and unlink-mid-write is only harmless on POSIX
    * filesystems (dead inode); on object-store-backed or Windows
    * filesystems the delete can fail or corrupt the attempt. Temps of
    * the committing epoch are deleted explicitly (by temp path) before
    * the sweep, so the sweep only ever targets orphans. */
  private[cdc] val StagingSweepGraceMs: Long = 10L * 60 * 1000

  /** Clear ORPHANED staging temps — attempts that died without commit or
    * abort (killed executor, speculative duplicate) never delete their
    * file, so `.staging` would grow without bound. Scoped to temps older
    * than [[StagingSweepGraceMs]]: a live attempt's temp has a recent
    * mtime (it is being written) and is spared, so the sweep never
    * unlinks a file another writer still holds open — the feed directory
    * therefore needs no POSIX unlink-while-open semantics for
    * correctness, only atomic same-directory rename (the publish path's
    * documented requirement). */
  private def sweepStaging(path: String): Unit = {
    val st = new File(path, ".staging")
    val leftovers = st.listFiles()
    val cutoff = System.currentTimeMillis() - StagingSweepGraceMs
    if (leftovers != null)
      leftovers.filter(_.lastModified() < cutoff).foreach(_.delete())
  }

  def discard(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: CdcTaskCommit => m }
      .foreach(m => new File(m.tempPath).delete())
}

private[cdc] class CdcBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CdcWriterFactory(path)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    CdcCommit.publish(path, messages); ()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CdcCommit.discard(messages)
}

private[cdc] class CdcStreamingWrite(path: String, queryId: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new CdcWriterFactory(path)
  // one feed file per epoch: the epoch boundary IS the delivery boundary;
  // the queryId-namespaced epoch marker makes a re-executed epoch a no-op
  // (exactly-once publish) WITHOUT colliding with a fresh-checkpoint
  // restart or a second query whose epoch ids restart at 0
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    CdcCommit.publish(path, messages, Some(s"$queryId/$epochId")); ()
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    CdcCommit.discard(messages)
}

private[cdc] class CdcWriterFactory(path: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CdcDataWriter(path, partitionId)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new CdcDataWriter(path, partitionId)
}

/** Executor-side line writer: rows → the shared feed codec, into a
  * private staging temp (published only by the driver commit). */
private[cdc] class CdcDataWriter(path: String, partitionId: Int)
    extends DataWriter[InternalRow] {
  private val staging = new File(path, ".staging")
  locally { if (!staging.exists()) staging.mkdirs() }
  private val temp = new File(staging,
    s"part-$partitionId-${UUID.randomUUID()}.tmp")
  private val out = new OutputStreamWriter(new FileOutputStream(temp),
    StandardCharsets.US_ASCII)
  private var lines = 0L

  override def write(row: InternalRow): Unit = {
    // (op, seq, doc_id, ts micros, text) in CdcFeed.schema order;
    // ts floor-truncates to the feed's whole-second event-time grain
    out.write(CdcFeed.formatLine(
      row.getUTF8String(0).toString, row.getLong(1), row.getLong(2),
      Math.floorDiv(row.getLong(3), 1000000L), row.getUTF8String(4).toString))
    lines += 1L
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    CdcTaskCommit(temp.getAbsolutePath, partitionId, lines)
  }

  override def abort(): Unit = { out.close(); temp.delete(); () }
  override def close(): Unit = ()
}
