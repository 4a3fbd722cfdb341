package graft.sources.cdc

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `format("graft-cdc")` — a REAL DataSourceV2 streaming source for the
 * tagged add/remove CDC feed the lifecycle maintainers consume
 * ([[graft.queries.StreamingJobs.runBm25Lifecycle]] /
 * `runServingLifecycle` / `runCurationPress`), closing the pluggable-
 * source capability gap the Kafka contract leaves open (SURVEY §2.1
 * S2/S4 — the reference's feed utility `KafkaProducerUtil.java:22-47`
 * replays a file into a topic; this source IS that replay channel,
 * executed through Spark's own source API instead of an external
 * broker the sandbox cannot run).
 *
 * Feed layout: a directory of append-only batch files
 * `batch-<n>.cdc`, one micro-batch delivery per file, numeric batch-
 * index order = feed order (retention: [[CdcFeed.compact]] folds a
 * prefix of deliveries into one base snapshot). Each line is one event,
 * `op TAB seq TAB doc_id TAB ts_sec TAB base64(text)` — pure-ASCII
 * lines by construction (the payload rides base64), so byte offsets
 * and character offsets coincide and a reader can be handed an exact
 * byte range. Files are written ATOMICALLY (tmp + rename,
 * [[CdcFeed.writeBatch]]) so a live stream never observes a partial
 * delivery.
 *
 * Schema: (op STRING, seq LONG, doc_id LONG, ts TIMESTAMP,
 * text STRING) — `seq` is the per-doc netting order the lifecycle
 * contract consumes; `ts` is the event time (seconds since epoch in
 * the file), so watermark-driven consumers compose too.
 *
 * Exactly-once replay: the streaming OFFSET is the count of feed
 * files fully consumed (`{"files":N}` — checkpoint-serialized JSON).
 * `planInputPartitions(start, end)` re-derives the same partitions
 * for the same offset range deterministically from the on-disk files,
 * which is all Structured Streaming needs to re-deliver the last
 * uncommitted batch after a restart. Admission control
 * ([[SupportsAdmissionControl]]) paces the stream at
 * `filesPerTrigger` deliveries per micro-batch (default 1: one
 * delivery per trigger, the boundary every lifecycle maintainer
 * treats as the delivery boundary).
 *
 * Scale shape: each file is split into up to `maxSlicesPerFile`
 * line-aligned BYTE RANGES at planning time and every slice is read
 * ON THE EXECUTOR (open at `startByte`, read to `endByte`) — the
 * driver touches only line boundaries, never row payloads. Planning
 * scans the file once on the driver to find slice boundaries; a
 * production feed would persist a line index next to each batch file
 * (the parquet-footer discipline) to make planning O(slices) — noted
 * here because deliveries are batch-sized, not corpus-sized, so the
 * one driver pass is bounded by the same argument as the lifecycle
 * folds themselves.
 */
class CdcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdc"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcFeed.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CdcTable(new CaseInsensitiveStringMap(properties))
}

private[cdc] class CdcTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  private val path = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-cdc: option 'path' is required")
    p
  }
  private val filesPerTrigger = options.getInt("filesPerTrigger", 1)
  private val maxSlices = options.getInt("maxSlicesPerFile", 4)

  override def name(): String = s"graft-cdc($path)"
  override def schema(): StructType = CdcFeed.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new CdcScan(path, filesPerTrigger, maxSlices)
    }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new CdcWriteBuilder(path, info)
}

private[cdc] class CdcScan(path: String, filesPerTrigger: Int, maxSlices: Int)
    extends Scan {
  override def readSchema(): StructType = CdcFeed.schema
  override def toBatch: Batch = new CdcBatch(path, maxSlices)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(path, filesPerTrigger, maxSlices)
}

/** Offset = upper bound on consumed batch INDICES: every delivery with
  * index < `files` has been fully consumed. For the writer's contiguous-
  * from-0 feeds this equals the consumed-file COUNT (the original
  * semantics, so pre-existing checkpoints keep their meaning), and it
  * stays valid across [[CdcFeed.compact]] — folding indices < N into one
  * base file leaves every index ≥ N untouched, so a consumer
  * checkpointed at or past N resumes exactly. */
private[cdc] case class CdcOffset(files: Int) extends Offset {
  override def json(): String = s"""{"files":$files}"""
}

private[cdc] object CdcOffset {
  private val Re = """\{\s*"files"\s*:\s*(\d+)\s*\}""".r
  def fromJson(json: String): CdcOffset = json match {
    case Re(n) => CdcOffset(n.toInt)
    case other => throw new IllegalArgumentException(
      s"graft-cdc: unreadable offset '$other'")
  }
}

private[cdc] class CdcMicroBatchStream(path: String, filesPerTrigger: Int,
                                       maxSlices: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = CdcOffset(0)

  override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)

  // plain latestOffset is never called once SupportsAdmissionControl is
  // implemented (the rate-per-micro-batch source sets the precedent)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-cdc paces via SupportsAdmissionControl.latestOffset(start, limit)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    CdcFeed.requireNoPendingCompaction(path)
    val done = start.asInstanceOf[CdcOffset].files
    val listed = CdcFeed.listIndexed(path)
    // a checkpoint INSIDE a compacted prefix cannot resume: the base
    // holds the checkpointed position's deliveries merged with earlier
    // ones, so continuing would re-ingest them as duplicates — fail
    // loudly instead (fresh consumers, done == 0, legally read the base)
    listed.headOption.foreach { case (minIdx, _) =>
      require(done == 0 || done > minIdx,
        s"graft-cdc: offset $done lies inside the compacted prefix " +
          s"(base index $minIdx) — this checkpoint cannot resume without " +
          "re-ingesting folded deliveries; start a fresh consumer")
    }
    val take = listed.filter(_._1 >= done).take(math.max(filesPerTrigger, 1))
    if (take.isEmpty) CdcOffset(done) else CdcOffset(take.last._1 + 1)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset =
    CdcOffset(CdcFeed.listIndexed(path).lastOption.map(_._1 + 1).getOrElse(0))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].files
    val e = end.asInstanceOf[CdcOffset].files
    CdcFeed.listIndexed(path).filter(fi => fi._1 >= s && fi._1 < e)
      .flatMap(fi => CdcFeed.slicesOf(fi._2, maxSlices)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory

  override def commit(end: Offset): Unit = () // files are immutable; nothing to ack
  override def stop(): Unit = ()
}

private[cdc] class CdcBatch(path: String, maxSlices: Int) extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    CdcFeed.requireNoPendingCompaction(path)
    CdcFeed.listBatchFiles(path).flatMap(f => CdcFeed.slicesOf(f, maxSlices)).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = CdcReaderFactory
}

/** One line-aligned byte range of one feed file — the executor-side
  * work unit (serialized to the task). */
private[cdc] case class CdcSlice(file: String, startByte: Long, endByte: Long)
  extends InputPartition

private[cdc] object CdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcSliceReader(partition.asInstanceOf[CdcSlice])
}

/** Executor-side reader: opens the file at `startByte` and reads whole
  * ASCII lines until `endByte` — no driver involvement per row. Byte
  * accounting counts the terminator bytes ACTUALLY consumed (readLine
  * would hide whether a line ended in `\n` or `\r\n`, undercounting a
  * hand-written CRLF feed by one byte per line and letting a slice run
  * past `endByte` into its neighbor's rows — duplicates, not an error). */
private[cdc] class CdcSliceReader(slice: CdcSlice)
    extends PartitionReader[InternalRow] {
  private val in = new BufferedInputStream(new FileInputStream(slice.file))
  locally {
    // skip() may legally return 0 without reaching EOF; fall back to a
    // single-byte read to make progress, and fail loudly only on true
    // EOF (a slice always starts inside the file it was planned from)
    var toSkip = slice.startByte
    while (toSkip > 0) {
      val n = in.skip(toSkip)
      if (n > 0) toSkip -= n
      else {
        require(in.read() >= 0,
          s"graft-cdc: EOF before slice start ${slice.startByte} in ${slice.file}")
        toSkip -= 1
      }
    }
  }
  // lines are pure ASCII by the feed contract (payload rides base64), so
  // one char == one byte and the range check below is exact
  private val sb = new java.lang.StringBuilder(128)
  private var pos = slice.startByte
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (pos >= slice.endByte) return false
    sb.setLength(0)
    var c = in.read()
    if (c < 0) return false
    while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
    // consumed = content chars (incl. a CR we strip below) + the LF if present
    pos += sb.length() + (if (c == '\n') 1 else 0)
    if (sb.length() > 0 && sb.charAt(sb.length() - 1) == '\r')
      sb.setLength(sb.length() - 1) // tolerate CRLF framing in hand-written feeds
    row = CdcFeed.parseLine(sb.toString)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

/** Feed-format contract: schema, the atomic batch writer the producer
  * side uses, and the line codec + planning helpers the source shares
  * with it (one codec, both directions — a drifted writer could
  * otherwise produce files the reader mis-parses with no error). */
object CdcFeed {

  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** One CDC event: op ∈ 'add' | 'remove', `seq` the per-doc netting
    * order, `tsSec` the event time in epoch seconds. */
  case class CdcEvent(op: String, seq: Long, docId: Long, tsSec: Long,
                      text: String)

  /** The on-disk feed listing (sorted NUMERICALLY on the batch index =
    * feed order — lexicographic name order breaks when the index outgrows
    * its padding: `batch-100000.cdc` < `batch-99999.cdc` as strings) —
    * public so specs and ops tooling can observe published deliveries. */
  def listBatchFiles(path: String): Seq[String] = listIndexed(path).map(_._2)

  /** The feed listing with parsed batch indices — what the streaming
    * offset math keys on ([[CdcOffset]]: indices, not positions, so a
    * compacted feed's surviving checkpoints stay valid). */
  private[cdc] def listIndexed(path: String): Seq[(Int, String)] = {
    val files = new File(path).listFiles()
    if (files == null) Seq.empty
    else files.filter(_.isFile)
      .flatMap(f => batchIndexOf(f.getName).map(i => (i, f.getAbsolutePath)))
      .sortBy(_._1).toSeq
  }

  /** RETENTION: fold every published delivery with index < `upTo` into
    * ONE base snapshot named for the highest folded index — mirroring
    * the lifecycle consumers' own persisted-state discipline (base +
    * tail instead of an ever-growing file-per-delivery history). The
    * folded feed is byte-identical end-to-end (deliveries concatenate in
    * feed order), so a FRESH consumer reads exactly the events the full
    * history held; a checkpointed consumer at offset ≥ `upTo` resumes
    * exactly (indices ≥ `upTo` are untouched); a checkpoint INSIDE the
    * folded prefix is irrecoverable by construction — the retention
    * trade-off, stated here. Historical delivery boundaries within the
    * base collapse into one (a fresh paced consumer sees the base as its
    * first delivery).
    *
    * Single-producer OFFLINE maintenance op (run it from the producer,
    * not under a live reader's listing). Crash-safe in the writeBatch
    * style: the merged bytes build invisibly, flip atomically to a
    * `.ready` journal file, and only then do the folded inputs retire
    * and the base publish — a re-run of [[compact]] after a crash at any
    * point resumes from the journal and converges; re-running on an
    * already-compacted feed is a no-op. */
  def compact(dir: String, upTo: Int): Unit = {
    val d = new File(dir)
    require(d.isDirectory, s"graft-cdc: no feed directory at $dir")
    recoverPendingCompactions(dir)
    val prefix = listIndexed(dir).filter(_._1 < upTo)
    if (prefix.length <= 1) return // already a single base (or empty)
    val n = prefix.last._1
    val building = new File(d, f".compact-$n%05d.cdc.building")
    val out = new FileOutputStream(building)
    try prefix.foreach { case (_, p) =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(p), out)
    } finally out.close()
    val ready = new File(d, f".compact-$n%05d.cdc.ready")
    require(building.renameTo(ready),
      s"graft-cdc: atomic rename failed for $ready")
    finishCompact(d, ready)
  }

  /** Resume any interrupted compaction — the `.ready` journal only ever
    * exists fully written (its own atomic rename), and it holds every
    * folded byte, so finishing is always safe. Called by [[compact]]
    * itself AND by every PRODUCER publish path ([[writeBatch]], the
    * sink's [[CdcCommit.publish]]): a producer crash between the
    * journal's input retirement and the base publish would otherwise
    * leave the folded prefix unreadable until an operator re-ran
    * compact by hand — with this sweep the single producer self-heals on
    * its next delivery. Readers never run it (they must not mutate the
    * feed); they fail loudly instead ([[requireNoPendingCompaction]]). */
  private[cdc] def recoverPendingCompactions(dir: String): Unit = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.matches("""\.compact-\d+\.cdc\.ready"""))
      .foreach(r => finishCompact(d, r))
  }

  /** Reader-side guard: a pending compaction journal means the listing
    * may be missing the folded prefix (compaction is an OFFLINE op by
    * contract — a live reader observing one is either mid-crash state or
    * a contract violation, and silently serving the partial feed would
    * look exactly like a legitimately compacted one). */
  private[cdc] def requireNoPendingCompaction(dir: String): Unit = {
    val pending = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.matches("""\.compact-\d+\.cdc\.ready"""))
    require(pending.isEmpty,
      s"graft-cdc: interrupted compaction at $dir (${pending.head.getName}) — " +
        "the feed is missing its folded prefix; run CdcFeed.compact (or any " +
        "producer publish) to recover before reading")
  }

  /** Complete a journaled compaction: carry the folded deliveries'
    * epoch markers onto the merged base (so a re-executed epoch still
    * no-ops after retention), retire the folded inputs, then publish the
    * merged base with a fresh line index. Idempotent per journal file. */
  private def finishCompact(d: File, ready: File): Unit = {
    val n = ready.getName.stripPrefix(".compact-").stripSuffix(".cdc.ready").toInt
    val dst = new File(d, f"batch-$n%05d.cdc")
    // union of every folded (and previously-merged) epoch, collected
    // BEFORE any input retires — a crash after this write re-collects a
    // subset and the union re-derives identically
    val inputs = listIndexed(d.getAbsolutePath).filter(_._1 < n)
      .map(p => new File(p._2)) :+ dst
    val epochs = inputs.flatMap(epochLinesOf).distinct
    val ef = epochFileOf(dst)
    if (epochs.nonEmpty) {
      val etmp = new File(d, "." + ef.getName + ".tmp")
      val out = new OutputStreamWriter(new FileOutputStream(etmp),
        StandardCharsets.US_ASCII)
      try epochs.foreach(e => out.write(s"$e\n")) finally out.close()
      require(etmp.renameTo(ef), s"graft-cdc: atomic rename failed for $ef")
    }
    inputs.init.foreach { f =>
      f.delete(); indexFileOf(f).delete(); epochFileOf(f).delete()
      ()
    }
    publishWithIndex(ready, dst)
  }

  /** The batch index a feed file name carries, or None for anything that
    * is not a `batch-<digits>.cdc` data file — the ONE name parse shared
    * by the listing and the sink's next-index derivation. */
  private[cdc] def batchIndexOf(name: String): Option[Int] =
    if (name.startsWith("batch-") && name.endsWith(".cdc")) {
      val mid = name.stripPrefix("batch-").stripSuffix(".cdc")
      if (mid.nonEmpty && mid.length <= 9 && mid.forall(_.isDigit))
        Some(mid.toInt)
      else None
    } else None

  /** Append the next batch file ATOMICALLY (tmp + rename): a live
    * stream lists whole files only. The line-index sidecar is written
    * BEFORE the rename publishes the data file, so a published delivery
    * always has a complete index (a stray index without its data file —
    * a crash between the two steps — is inert: listBatchFiles ignores
    * it and the next write of that slot overwrites it). Returns the
    * file written. */
  def writeBatch(dir: String, index: Int, events: Seq[CdcEvent]): File = {
    val d = new File(dir)
    if (!d.exists()) d.mkdirs()
    recoverPendingCompactions(dir) // producer self-heal (see the method doc)
    val tmp = new File(d, f".batch-$index%05d.cdc.tmp")
    val out = new OutputStreamWriter(new FileOutputStream(tmp),
      StandardCharsets.US_ASCII)
    try events.foreach(e =>
      out.write(formatLine(e.op, e.seq, e.docId, e.tsSec, e.text)))
    finally out.close()
    val dst = new File(d, f"batch-$index%05d.cdc")
    publishWithIndex(tmp, dst)
    dst
  }

  /** Publish a staged data file: derive + write its line index (named
    * for the FINAL file) and, for a streaming epoch, the epoch marker,
    * then atomically rename the data into place — shared by
    * [[writeBatch]] and the sink's [[CdcCommit]]. Sidecars land BEFORE
    * the data rename, so a published delivery always carries complete
    * sidecars; a crash between the steps leaves stray sidecars without a
    * data file, which every reader of them ignores and the retry of that
    * slot overwrites. */
  private[cdc] def publishWithIndex(tmp: File, dst: File,
                                    epochToken: Option[String] = None): Unit = {
    writeIndex(tmp, indexFileOf(dst))
    epochToken.foreach { e =>
      val ef = epochFileOf(dst)
      val etmp = new File(ef.getParentFile, "." + ef.getName + ".tmp")
      val out = new OutputStreamWriter(new FileOutputStream(etmp),
        StandardCharsets.US_ASCII)
      try out.write(s"$e\n") finally out.close()
      require(etmp.renameTo(ef), s"graft-cdc: atomic rename failed for $ef")
    }
    require(tmp.renameTo(dst), s"graft-cdc: atomic rename failed for $dst")
  }

  private[cdc] def indexFileOf(cdc: File): File =
    new File(cdc.getParentFile, cdc.getName + ".idx")

  private[cdc] def epochFileOf(cdc: File): File =
    new File(cdc.getParentFile, cdc.getName + ".epoch")

  /** True iff a delivery that could legally RE-EXECUTE carries this
    * epoch's marker — the streaming sink's re-execution guard. The token
    * is `<queryId>/<epochId>` (see [[CdcCommit.publish]]): namespacing
    * by query id keeps a fresh-checkpoint restart (epoch ids restart at
    * 0) or a second query from matching an older query's markers — a
    * bare-id match there silently DROPPED the delivery. Spark
    * re-executes only the LATEST uncommitted epoch, so the epoch can
    * only be on the NEWEST published file (the normal crash window) or,
    * if retention folded it meanwhile, in the base's merged marker (the
    * OLDEST file — a compacted base carries every folded epoch, one per
    * line). Checking exactly those two sidecars keeps the guard O(1) per
    * commit instead of O(feed length) small-file reads (which would make
    * total commit overhead quadratic in feed age). Only data files on
    * disk count — a stray marker from a crashed publish is ignored. */
  private[cdc] def epochPublished(path: String, epochToken: String): Boolean = {
    val listed = listBatchFiles(path)
    (listed.lastOption.toSeq ++ listed.headOption.toSeq).distinct
      .exists(f => epochLinesOf(new File(f)).contains(epochToken))
  }

  private def epochLinesOf(cdc: File): Seq[String] = {
    val ef = epochFileOf(cdc)
    if (!ef.isFile) Seq.empty
    else {
      val src = scala.io.Source.fromFile(ef, "US-ASCII")
      try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    }
  }

  /** Write the sidecar: line 0 = total byte length (the staleness
    * guard), then one line-start offset per line — derived from the
    * staged bytes in the same single pass the planner would otherwise
    * pay per plan. */
  private def writeIndex(data: File, idx: File): Unit = {
    val starts = lineStarts(data)
    val tmp = new File(idx.getParentFile, "." + idx.getName + ".tmp")
    val out = new OutputStreamWriter(new FileOutputStream(tmp),
      StandardCharsets.US_ASCII)
    try {
      out.write(s"${data.length()}\n")
      starts.foreach(o => out.write(s"$o\n"))
    } finally out.close()
    require(tmp.renameTo(idx), s"graft-cdc: atomic rename failed for $idx")
  }

  /** Line-start byte offsets of a published index, IF one exists and its
    * recorded total length matches the file (a mismatched index — a
    * hand-edited feed — is ignored, falling back to the scan). */
  private def readIndex(f: File): Option[Seq[Long]] = {
    val idx = indexFileOf(f)
    if (!idx.isFile) return None
    val lines = scala.io.Source.fromFile(idx, "US-ASCII")
    try {
      val it = lines.getLines()
      if (!it.hasNext || it.next().toLong != f.length()) None
      else Some(it.map(_.toLong).toVector)
    } catch { case _: NumberFormatException => None }
    finally lines.close()
  }

  /** The one line codec, shared by every producer ([[writeBatch]], the
    * [[CdcDataWriter]] sink) and the reader's [[parseLine]]. `op` is the
    * only raw (un-base64'd) string field, so it is validated against the
    * feed contract here — an arbitrary op would otherwise corrupt the
    * TAB framing silently at write time and surface as a reader error
    * an arbitrary time later. */
  private[cdc] def formatLine(op: String, seq: Long, docId: Long,
                              tsSec: Long, text: String): String = {
    require(op == "add" || op == "remove",
      s"graft-cdc: op must be 'add' or 'remove', got '$op'")
    val b64 = Base64.getEncoder.encodeToString(
      text.getBytes(StandardCharsets.UTF_8))
    s"$op\t$seq\t$docId\t$tsSec\t$b64\n"
  }

  private[cdc] def parseLine(line: String): InternalRow = {
    // limit -1: a remove's empty payload is a trailing empty field, which
    // the limit-less split would silently DROP
    val p = line.split("\t", -1)
    require(p.length == 5, s"graft-cdc: malformed feed line '$line'")
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(p(0)), p(1).toLong, p(2).toLong,
      p(3).toLong * 1000000L, // epoch seconds → TimestampType micros
      UTF8String.fromString(new String(
        Base64.getDecoder.decode(p(4)), StandardCharsets.UTF_8))))
  }

  /** Line-start byte offsets of a data file via one buffered newline
    * scan — the publish-time index derivation, and the planner's
    * fallback for index-less feeds. */
  private def lineStarts(f: File): Seq[Long] = {
    val total = f.length()
    val starts = scala.collection.mutable.ArrayBuffer(0L)
    val in = new FileInputStream(f)
    try {
      val buf = new Array[Byte](1 << 16)
      var base = 0L
      var n = in.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) {
          if (buf(i) == '\n') starts += base + i + 1
          i += 1
        }
        base += n
        n = in.read(buf)
      }
    } finally in.close()
    if (starts.last >= total) starts.dropRightInPlace(1) // trailing newline
    starts.toSeq
  }

  /** Split one feed file into ≤ `maxSlices` line-aligned byte ranges of
    * near-equal line counts. Planning reads the PUBLISHED LINE INDEX
    * when one exists (O(lines) read of a sidecar the producer paid for
    * once — the parquet-footer discipline); an index-less or stale-index
    * file falls back to the one-pass scan, so hand-written feeds keep
    * working and the two paths provably slice identically (spec). */
  private[cdc] def slicesOf(file: String, maxSlices: Int): Seq[CdcSlice] = {
    val f = new File(file)
    val total = f.length()
    if (total == 0) return Seq.empty
    val starts = readIndex(f).getOrElse(lineStarts(f))
    val nLines = starts.length
    val nSlices = math.max(1, math.min(maxSlices, nLines))
    val per = (nLines + nSlices - 1) / nSlices
    // ceil-division can leave trailing slice indices past the last line
    // (5 lines / 4 slices → per=2 → slice 3 would index starts(6)): such
    // slices hold no lines and must simply not exist
    (0 until nSlices).flatMap { s =>
      val lo = s * per
      if (lo >= nLines) None
      else {
        val hi = (s + 1) * per
        val from = starts(lo)
        val to = if (hi >= nLines) total else starts(hi)
        if (to > from) Some(CdcSlice(file, from, to)) else None
      }
    }
  }
}
