package graft.sources

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Snort unified2 binary format: reader + record assembly.
  *
  * Format (public spec, snort.org "README.unified2"; the reference
  * consumes it via py-idstools — see /root/reference/charlotte/
  * __init__.py:28,108-120): a stream of length-prefixed records
  *   u32 type | u32 length | body          (all big-endian)
  * with record types
  *   7   IDS EVENT (v1, ipv4)      104 IDS EVENT V2 (ipv4)
  *   72  IDS EVENT IPV6 (v1)       105 IDS EVENT IPV6 V2
  *   2   PACKET                    110 EXTRA DATA
  *
  * Spark mapping: one task per spool file (`binaryFile` source, no
  * shuffle to parse); EVENT/PACKET/EXTRA_DATA records correlate by
  * (sensor_id, event_id, event_second) — a declarative join + group,
  * not an order-dependent scan, so assembly parallelizes over any
  * partitioning at 100 TB.
  */
object Unified2 {

  /** One parsed unified2 record (flat; type-dependent nullables). */
  case class U2Record(
      src_file: String,
      rec_index: Int,
      rec_type: Int,
      // event fields (types 7/72/104/105)
      sensor_id: Option[Long] = None,
      event_id: Option[Long] = None,
      event_second: Option[Long] = None,
      event_microsecond: Option[Long] = None,
      signature_id: Option[Long] = None,
      generator_id: Option[Long] = None,
      signature_revision: Option[Long] = None,
      classification_id: Option[Long] = None,
      priority_id: Option[Long] = None,
      ip_source: Option[Array[Byte]] = None,
      ip_destination: Option[Array[Byte]] = None,
      sport_itype: Option[Int] = None,
      dport_icode: Option[Int] = None,
      protocol: Option[Int] = None,
      impact_flag: Option[Int] = None,
      blocked: Option[Int] = None,
      mpls_label: Option[Long] = None,
      vlan_id: Option[Int] = None,
      // packet fields (type 2)
      packet_second: Option[Long] = None,
      packet_microsecond: Option[Long] = None,
      linktype: Option[Long] = None,
      packet_data: Option[Array[Byte]] = None,
      // extra-data fields (type 110)
      extra_type: Option[Long] = None,
      extra_data_type: Option[Long] = None,
      extra_blob: Option[Array[Byte]] = None)

  object U2Record {
    def empty(file: String, idx: Int, recType: Int): U2Record =
      U2Record(file, idx, recType)
  }

  val EventV1 = 7
  val EventIp6V1 = 72
  val EventV2 = 104
  val EventIp6V2 = 105
  val Packet = 2
  val ExtraData = 110

  private def u32(b: ByteBuffer): Long = b.getInt() & 0xffffffffL
  private def u16(b: ByteBuffer): Int = b.getShort() & 0xffff
  private def u8(b: ByteBuffer): Int = b.get() & 0xff

  /** Parse one spool file's bytes into records. Tolerates a truncated
    * trailing record (files are read while snort appends — the
    * reference's SpoolEventReader does the same). NOTE: with the
    * once-per-file stream source a dropped tail is dropped forever —
    * use [[graft.streaming.SpoolTail]] to follow growing files.
    */
  def parseFile(file: String, bytes: Array[Byte]): Seq[U2Record] =
    parseRange(file, bytes, 0)

  /** Stream records straight off a file channel over
    * `[startOff, endOff)`, numbering from `baseIdx` — the executor-side
    * read path for byte-offset bookmark resumes ([[graft.streaming
    * .SpoolTail]]). Reads ONE record at a time (8-byte framing header,
    * then the body), so memory stays O(max record) no matter how large
    * the span — a single file growing >2 GiB between micro-batches
    * (ADVICE r3) just streams through. Stops early on a truncated tail
    * (file shrunk/rewritten after offset planning) like [[parseRange]].
    */
  def readRange(ch: java.nio.channels.FileChannel, file: String,
      startOff: Long, endOff: Long, baseIdx: Int): Iterator[U2Record] =
    new Iterator[U2Record] {
      private var off = startOff
      private var idx = baseIdx
      private var nextRec: U2Record = _
      private def readFully(buf: ByteBuffer, pos: Long): Boolean = {
        var p = pos
        while (buf.hasRemaining) {
          val r = ch.read(buf, p)
          if (r < 0) return false
          p += r
        }
        true
      }
      private def advance(): Unit = {
        nextRec = null
        if (off + 8 <= endOff) {
          val hdr = ByteBuffer.allocate(8)
          if (readFully(hdr, off)) {
            hdr.flip()
            val recType = hdr.getInt()
            val len = hdr.getInt() & 0xffffffffL
            // a record body can't exceed the planned span; anything
            // bigger is a torn/garbage header — stop, a later batch
            // re-reads from the committed boundary
            if (len <= endOff - off - 8 && len <= Int.MaxValue - 8) {
              val body = ByteBuffer.allocate(len.toInt)
              if (readFully(body, off + 8)) {
                nextRec = parseRecord(file, idx, recType, body.array())
                off += 8 + len
                idx += 1
              }
            }
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): U2Record = {
        val r = nextRec; advance(); r
      }
    }

  /** As [[parseFile]] but numbering records from `baseIdx` — the entry
    * point for resumed mid-file reads (byte-offset bookmarks).
    */
  def parseRange(file: String, bytes: Array[Byte], baseIdx: Int): Seq[U2Record] = {
    val buf = ByteBuffer.wrap(bytes)
    val out = Seq.newBuilder[U2Record]
    var idx = baseIdx
    while (buf.remaining() >= 8) {
      val recType = buf.getInt()
      val len = buf.getInt()
      if (len < 0 || buf.remaining() < len) {
        buf.position(buf.limit()) // truncated tail: stop
      } else {
        val body = new Array[Byte](len)
        buf.get(body)
        out += parseRecord(file, idx, recType, body)
        idx += 1
      }
    }
    out.result()
  }

  private def parseRecord(file: String, idx: Int, recType: Int,
      body: Array[Byte]): U2Record = {
    val b = ByteBuffer.wrap(body)
    val base = U2Record.empty(file, idx, recType)
    recType match {
      case EventV1 | EventV2 | EventIp6V1 | EventIp6V2 =>
        val ipLen = if (recType == EventIp6V1 || recType == EventIp6V2) 16 else 4
        val v2 = recType == EventV2 || recType == EventIp6V2
        val sensor = u32(b); val eid = u32(b); val esec = u32(b)
        val eusec = u32(b); val sig = u32(b); val gen = u32(b)
        val rev = u32(b); val cls = u32(b); val prio = u32(b)
        val src = new Array[Byte](ipLen); b.get(src)
        val dst = new Array[Byte](ipLen); b.get(dst)
        val sport = u16(b); val dport = u16(b)
        val proto = u8(b); val impact = u8(b); val _ = u8(b) // impact (v2)
        val blocked = u8(b)
        val (mpls, vlan) =
          if (v2 && b.remaining() >= 6) (Some(u32(b)), Some(u16(b)))
          else (None, None)
        base.copy(sensor_id = Some(sensor), event_id = Some(eid),
          event_second = Some(esec), event_microsecond = Some(eusec),
          signature_id = Some(sig), generator_id = Some(gen),
          signature_revision = Some(rev), classification_id = Some(cls),
          priority_id = Some(prio), ip_source = Some(src),
          ip_destination = Some(dst), sport_itype = Some(sport),
          dport_icode = Some(dport), protocol = Some(proto),
          impact_flag = Some(impact), blocked = Some(blocked),
          mpls_label = mpls, vlan_id = vlan)
      case Packet =>
        val sensor = u32(b); val eid = u32(b); val esec = u32(b)
        val psec = u32(b); val pusec = u32(b); val link = u32(b)
        val plen = u32(b)
        val n = math.min(plen, b.remaining().toLong).toInt
        val data = new Array[Byte](n); b.get(data)
        base.copy(sensor_id = Some(sensor), event_id = Some(eid),
          event_second = Some(esec), packet_second = Some(psec),
          packet_microsecond = Some(pusec), linktype = Some(link),
          packet_data = Some(data))
      case ExtraData =>
        val _etype = u32(b); val _elen = u32(b)
        val sensor = u32(b); val eid = u32(b); val esec = u32(b)
        val xtype = u32(b); val dtype = u32(b); val blobLen = u32(b)
        val n = math.min(blobLen, b.remaining().toLong).toInt
        val blob = new Array[Byte](n); b.get(blob)
        base.copy(sensor_id = Some(sensor), event_id = Some(eid),
          event_second = Some(esec), extra_type = Some(xtype),
          extra_data_type = Some(dtype), extra_blob = Some(blob))
      case _ => base // unknown record type: keep framing info only
    }
  }

  /** All records of a spool: one directory (or glob) of `prefix.*`
    * files, one parse task per file. `sensor` is the logical sensor
    * name the directory belongs to (multiple dirs may share it — the
    * reference's multi-instance-per-sensor deployment model,
    * __init__.py:253-283).
    */
  def records(spark: SparkSession, dirs: Seq[String], prefix: String,
      sensor: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"$prefix*")
      .load(dirs: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    raw.flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF()
      .withColumn("sensor", lit(sensor))
  }

  /** Assemble alerts: each event row + its packets + extra-data blobs.
    * Correlation keys include the logical sensor AND the source file —
    * snort emits an event's PACKET/EXTRA_DATA records into the same
    * spool file, and (sensor_id, event_id) sequences are NOT unique
    * across snort instances or logical sensors (each instance restarts
    * its counter; the reference avoids collisions only because it runs
    * one reader per spool). Packets keep record order inside the
    * collected list via sort_array on the rec_index-led struct.
    */
  def alerts(records: DataFrame): DataFrame = {
    val keys = Seq("sensor", "src_file", "sensor_id", "event_id",
      "event_second")
    val ev = records.filter(col("rec_type").isin(EventV1, EventV2,
        EventIp6V1, EventIp6V2))
      .select(col("sensor"), col("src_file"), col("rec_index"),
        col("sensor_id"), col("event_id"), col("event_second"),
        col("event_microsecond"), col("signature_id"), col("generator_id"),
        col("signature_revision"), col("classification_id"),
        col("priority_id"), col("ip_source"), col("ip_destination"),
        col("sport_itype"), col("dport_icode"), col("protocol"),
        col("impact_flag"), col("blocked"))
    val pk = records.filter(col("rec_type") === Packet)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("rec_index"), col("packet_second"), col("packet_microsecond"),
        col("linktype"), col("packet_data")))).as("packets"))
    val xd = records.filter(col("rec_type") === ExtraData)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col("rec_index"), col("extra_type"), col("extra_data_type"),
        col("extra_blob")))).as("extra"))
    ev.join(pk, keys, "left_outer")
      .join(xd, keys, "left_outer")
      .withColumn("event_ts", timestamp_seconds(
        col("event_second") + col("event_microsecond") / lit(1000000.0)))
  }

  /** A packet slot inside an assembled alert (field order matches the
    * `collect_list(struct(...))` build in [[alerts]]).
    */
  case class U2PacketSlot(rec_index: Int, packet_second: Option[Long],
      packet_microsecond: Option[Long], linktype: Option[Long],
      packet_data: Option[Array[Byte]])

  /** An extra-data slot inside an assembled alert. */
  case class U2ExtraSlot(rec_index: Int, extra_type: Option[Long],
      extra_data_type: Option[Long], extra_blob: Option[Array[Byte]])

  /** One assembled alert (field order matches the [[alerts]] output:
    * join keys first, then the remaining event columns, then the
    * correlated slots; `event_ts` is appended declaratively so both
    * paths share the exact same seconds→timestamp expression).
    */
  case class U2Alert(sensor: String, src_file: String,
      sensor_id: Option[Long], event_id: Option[Long],
      event_second: Option[Long], rec_index: Int,
      event_microsecond: Option[Long], signature_id: Option[Long],
      generator_id: Option[Long], signature_revision: Option[Long],
      classification_id: Option[Long], priority_id: Option[Long],
      ip_source: Option[Array[Byte]], ip_destination: Option[Array[Byte]],
      sport_itype: Option[Int], dport_icode: Option[Int],
      protocol: Option[Int], impact_flag: Option[Int],
      blocked: Option[Int], packets: Option[Seq[U2PacketSlot]],
      extra: Option[Seq[U2ExtraSlot]])

  /** Assemble one file's parsed records into alerts in a single local
    * pass. Exactly equivalent to [[alerts]] over the same records:
    * the correlation key includes `src_file` (snort writes an event's
    * PACKET/EXTRA_DATA into the same spool file), so grouping never
    * crosses a file boundary and the groupBy+join topology degenerates
    * to this in-task hash correlation. Packets/extras accumulate in
    * record order (= ascending `rec_index`, [[alerts]]' sort_array
    * order); events with no packets get NULL, not an empty list, like
    * the left join; duplicate event keys each see the full slot list,
    * like the join fan-out; orphan slots (no event row) drop, like the
    * inner side of the left join.
    */
  def assembleFile(sensor: String, recs: Seq[U2Record]): Seq[U2Alert] = {
    type Key = (Option[Long], Option[Long], Option[Long])
    def key(r: U2Record): Key = (r.sensor_id, r.event_id, r.event_second)
    val pk = scala.collection.mutable.HashMap
      .empty[Key, scala.collection.mutable.ArrayBuffer[U2PacketSlot]]
    val xd = scala.collection.mutable.HashMap
      .empty[Key, scala.collection.mutable.ArrayBuffer[U2ExtraSlot]]
    recs.foreach { r =>
      r.rec_type match {
        case Packet =>
          pk.getOrElseUpdate(key(r),
            scala.collection.mutable.ArrayBuffer.empty) += U2PacketSlot(
            r.rec_index, r.packet_second, r.packet_microsecond,
            r.linktype, r.packet_data)
        case ExtraData =>
          xd.getOrElseUpdate(key(r),
            scala.collection.mutable.ArrayBuffer.empty) += U2ExtraSlot(
            r.rec_index, r.extra_type, r.extra_data_type, r.extra_blob)
        case _ => ()
      }
    }
    recs.collect {
      case r if r.rec_type == EventV1 || r.rec_type == EventV2 ||
          r.rec_type == EventIp6V1 || r.rec_type == EventIp6V2 =>
        U2Alert(sensor, r.src_file, r.sensor_id, r.event_id,
          r.event_second, r.rec_index, r.event_microsecond,
          r.signature_id, r.generator_id, r.signature_revision,
          r.classification_id, r.priority_id, r.ip_source,
          r.ip_destination, r.sport_itype, r.dport_icode, r.protocol,
          r.impact_flag, r.blocked,
          pk.get(key(r)).map(_.toSeq), xd.get(key(r)).map(_.toSeq))
    }
  }

  /** The high-throughput ingest path: parse AND assemble each spool
    * file in its one read task — a map-only stage. [[records]] +
    * [[alerts]] scans the parse three times (event/packet/extra
    * branches) and pays two shuffle groupBys plus two shuffle joins;
    * at 100 TB of spools that is three reads of every byte and four
    * corpus shuffles for correlation that never leaves a file. Output
    * is column-for-column identical to `alerts(records(...))`
    * (pinned by SnortSpec). The join-based [[alerts]] remains the
    * general form for records that arrive pre-shuffled (e.g. a
    * micro-batch whose file spans split across partitions).
    */
  def alertsAssembled(spark: SparkSession, dirs: Seq[String],
      prefix: String, sensor: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"$prefix*")
      .load(dirs: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    raw.flatMap { case (path, bytes) =>
        assembleFile(sensor, parseFile(path, bytes)) }
      .toDF()
      .withColumn("event_ts", timestamp_seconds(
        col("event_second") + col("event_microsecond") / lit(1000000.0)))
  }
}
