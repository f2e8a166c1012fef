package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths}

/** Deterministic unified2 spool generator — demo/verification input for
  * the Snort operators (the driver's test tables carry no unified2
  * files). Byte layouts follow the public unified2 spec exactly, so the
  * fixture doubles as a format golden test: SnortSpec asserts the
  * parser recovers every planted field.
  */
object Unified2Fixture {

  /** Minimal ethernet/IPv4 packet builder. */
  def ipv4Packet(proto: Int, srcIp: Array[Byte], dstIp: Array[Byte],
      sport: Int, dport: Int, payload: Array[Byte]): Array[Byte] = {
    val l4 = proto match {
      case 6 => // TCP: 20-byte header
        val b = ByteBuffer.allocate(20 + payload.length)
        b.putShort(sport.toShort).putShort(dport.toShort)
        b.putInt(1000).putInt(2000) // seq, ack
        b.put(0x50.toByte) // data offset 5
        b.put(0x18.toByte) // flags PSH|ACK
        b.putShort(8192.toShort) // window
        b.putShort(0xbeef.toShort) // csum
        b.putShort(0) // urg
        b.put(payload); b.array()
      case 17 => // UDP
        val b = ByteBuffer.allocate(8 + payload.length)
        b.putShort(sport.toShort).putShort(dport.toShort)
        b.putShort((8 + payload.length).toShort).putShort(0xcafe.toShort)
        b.put(payload); b.array()
      case 1 => // ICMP echo request (type 8)
        val b = ByteBuffer.allocate(8 + payload.length)
        b.put(8.toByte).put(0.toByte).putShort(0x1234.toShort)
        b.putShort(42.toShort).putShort(7.toShort) // id, seq
        b.put(payload); b.array()
      case _ => payload
    }
    val ip = ByteBuffer.allocate(20 + l4.length)
    ip.put(0x45.toByte) // v4, ihl 5
    ip.put(0.toByte) // tos
    ip.putShort((20 + l4.length).toShort)
    ip.putShort(0x0101.toShort) // id
    ip.putShort(0x4000.toShort) // flags DF, off 0
    ip.put(64.toByte) // ttl
    ip.put(proto.toByte)
    ip.putShort(0xdead.toShort) // csum
    ip.put(srcIp).put(dstIp)
    ip.put(l4)
    val eth = ByteBuffer.allocate(14 + ip.position())
    eth.put(Array[Byte](2, 0, 0, 0, 0, 1)) // dst mac
    eth.put(Array[Byte](2, 0, 0, 0, 0, 2)) // src mac
    eth.putShort(0x0800.toShort) // ethertype IPv4
    eth.put(ip.array(), 0, ip.position())
    eth.array()
  }

  private def record(recType: Int, body: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + body.length)
    b.putInt(recType).putInt(body.length).put(body)
    b.array()
  }

  def eventV2(sensor: Int, eventId: Int, second: Long, sig: Int, gen: Int,
      rev: Int, cls: Int, prio: Int, src: Array[Byte], dst: Array[Byte],
      sport: Int, dport: Int, proto: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(60)
    b.putInt(sensor).putInt(eventId).putInt(second.toInt).putInt(500000)
    b.putInt(sig).putInt(gen).putInt(rev).putInt(cls).putInt(prio)
    b.put(src).put(dst)
    b.putShort(sport.toShort).putShort(dport.toShort)
    b.put(proto.toByte).put(1.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0).putShort(0).putShort(0) // mpls, vlan, pad
    record(Unified2.EventV2, b.array())
  }

  def eventIp6V2(sensor: Int, eventId: Int, second: Long, sig: Int, gen: Int,
      rev: Int, cls: Int, prio: Int, src: Array[Byte], dst: Array[Byte],
      sport: Int, dport: Int, proto: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(84)
    b.putInt(sensor).putInt(eventId).putInt(second.toInt).putInt(500000)
    b.putInt(sig).putInt(gen).putInt(rev).putInt(cls).putInt(prio)
    b.put(src).put(dst) // 16 bytes each
    b.putShort(sport.toShort).putShort(dport.toShort)
    b.put(proto.toByte).put(1.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0).putShort(0).putShort(0) // mpls, vlan, pad
    record(Unified2.EventIp6V2, b.array())
  }

  /** Minimal ethernet/IPv6/TCP packet. */
  def ipv6Packet(srcIp: Array[Byte], dstIp: Array[Byte], sport: Int,
      dport: Int, payload: Array[Byte]): Array[Byte] = {
    val tcp = ByteBuffer.allocate(20 + payload.length)
    tcp.putShort(sport.toShort).putShort(dport.toShort)
    tcp.putInt(7000).putInt(8000)
    tcp.put(0x50.toByte).put(0x18.toByte)
    tcp.putShort(4096.toShort).putShort(0xfeed.toShort).putShort(0)
    tcp.put(payload)
    val ip6 = ByteBuffer.allocate(40 + tcp.position())
    ip6.putInt(0x60000000) // v6, tc 0, flow 0
    ip6.putShort(tcp.position().toShort) // payload length
    ip6.put(6.toByte) // next header TCP
    ip6.put(64.toByte) // hop limit
    ip6.put(srcIp).put(dstIp)
    ip6.put(tcp.array(), 0, tcp.position())
    val eth = ByteBuffer.allocate(14 + ip6.position())
    eth.put(Array[Byte](2, 0, 0, 0, 0, 1))
    eth.put(Array[Byte](2, 0, 0, 0, 0, 2))
    eth.putShort(0x86dd.toShort)
    eth.put(ip6.array(), 0, ip6.position())
    eth.array()
  }

  def packet(sensor: Int, eventId: Int, second: Long,
      data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(28 + data.length)
    b.putInt(sensor).putInt(eventId).putInt(second.toInt)
    b.putInt(second.toInt).putInt(600000).putInt(1) // DLT_EN10MB
    b.putInt(data.length).put(data)
    record(Unified2.Packet, b.array())
  }

  def extraData(sensor: Int, eventId: Int, second: Long, xtype: Int,
      blob: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(32 + blob.length)
    b.putInt(1).putInt(24 + blob.length) // hdr: event_type, event_length
    b.putInt(sensor).putInt(eventId).putInt(second.toInt)
    b.putInt(xtype).putInt(1).putInt(blob.length).put(blob)
    record(Unified2.ExtraData, b.array())
  }

  private def ip(a: Int, b: Int, c: Int, d: Int) =
    Array[Byte](a.toByte, b.toByte, c.toByte, d.toByte)

  /** Write a deterministic 2-file spool; returns the spool directory.
    * 6 alerts across 2 files: TCP / UDP / ICMP packets, an alert with
    * two packets, one with extra data, one with no packets at all (the
    * reference's "alert with no packet data" warning path,
    * __init__.py:470-475).
    */
  def writeSpool(baseDir: String): String = {
    val dir = Paths.get(baseDir)
    Files.createDirectories(dir)
    val t0 = 1700000000L
    val f1 = ByteBuffer.allocate(1 << 16)
    f1.put(eventV2(1, 1, t0, 1000001, 1, 3, 2, 1, ip(10, 0, 0, 1),
      ip(192, 168, 1, 10), 12345, 80, 6))
    f1.put(packet(1, 1, t0, ipv4Packet(6, ip(10, 0, 0, 1),
      ip(192, 168, 1, 10), 12345, 80, "GET / HTTP/1.0".getBytes)))
    f1.put(eventV2(1, 2, t0 + 10, 1000002, 1, 1, 3, 2, ip(10, 0, 0, 2),
      ip(192, 168, 1, 53), 5353, 53, 17))
    f1.put(packet(1, 2, t0 + 10, ipv4Packet(17, ip(10, 0, 0, 2),
      ip(192, 168, 1, 53), 5353, 53, Array.fill(12)(0x41.toByte))))
    f1.put(eventV2(1, 3, t0 + 20, 9999999, 1, 0, 0, 10, ip(10, 0, 0, 3),
      ip(192, 168, 1, 1), 0, 0, 1)) // unmapped sig -> fallback path
    f1.put(packet(1, 3, t0 + 20, ipv4Packet(1, ip(10, 0, 0, 3),
      ip(192, 168, 1, 1), 0, 0, Array.fill(8)(0x42.toByte))))
    Files.write(dir.resolve("snort.log.1700000000"),
      java.util.Arrays.copyOf(f1.array(), f1.position()))

    val f2 = ByteBuffer.allocate(1 << 16)
    f2.put(eventV2(1, 4, t0 + 30, 1000001, 1, 3, 2, 1, ip(10, 0, 1, 1),
      ip(192, 168, 2, 10), 54321, 443, 6))
    f2.put(packet(1, 4, t0 + 30, ipv4Packet(6, ip(10, 0, 1, 1),
      ip(192, 168, 2, 10), 54321, 443, "TLS".getBytes)))
    f2.put(packet(1, 4, t0 + 30, ipv4Packet(6, ip(10, 0, 1, 1),
      ip(192, 168, 2, 10), 54321, 443, "TLS2".getBytes)))
    f2.put(eventV2(1, 5, t0 + 40, 1000003, 1, 2, 1, 3, ip(172, 16, 0, 9),
      ip(192, 168, 2, 20), 1024, 8080, 6))
    f2.put(extraData(1, 5, t0 + 40, 9, "http://evil.example/".getBytes))
    f2.put(eventV2(1, 6, t0 + 50, 1000002, 1, 1, 3, 2, ip(10, 0, 1, 3),
      ip(192, 168, 2, 30), 2222, 22, 6)) // no packet, no extra
    val v6src = Array[Byte](0x20, 0x01, 0x0d, 0xb8.toByte, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1)
    val v6dst = Array[Byte](0x20, 0x01, 0x0d, 0xb8.toByte, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 2)
    f2.put(eventIp6V2(1, 7, t0 + 70, 1000001, 1, 3, 2, 1, v6src, v6dst,
      40000, 443, 6)) // ipv6 alert
    f2.put(packet(1, 7, t0 + 70,
      ipv6Packet(v6src, v6dst, 40000, 443, "V6DATA".getBytes)))
    Files.write(dir.resolve("snort.log.1700000060"),
      java.util.Arrays.copyOf(f2.array(), f2.position()))
    baseDir
  }

  /** Reference-style map files (sid-msg.map / gen-msg.map /
    * classification.config) matching the spool's signature ids.
    */
  def writeMaps(baseDir: String): (String, String, String) = {
    val dir = Paths.get(baseDir)
    Files.createDirectories(dir)
    val sid = dir.resolve("sid-msg.map")
    Files.writeString(sid,
      """|# sid-msg.map fixture
         |1000001 || WEB-MISC test http alert || url,example.com
         |1000002 || DNS suspicious query
         |1000003 || POLICY http proxy connect
         |""".stripMargin)
    val gen = dir.resolve("gen-msg.map")
    Files.writeString(gen,
      """|# gen-msg.map fixture
         |1 || 1 || snort general alert
         |116 || 1 || snort decoder alert
         |""".stripMargin)
    val cls = dir.resolve("classification.config")
    Files.writeString(cls,
      """|# classification.config fixture
         |config classification: not-suspicious,Not Suspicious Traffic,3
         |config classification: attempted-recon,Attempted Information Leak,2
         |config classification: web-application-attack,Web Application Attack,1
         |""".stripMargin)
    (sid.toString, gen.toString, cls.toString)
  }

  /** Fixture root for runtime demo entries (driver-run queries). */
  def defaultRoot(): String = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"), "graft-u2-fixture")
    Files.createDirectories(d)
    d.toString
  }

  /** Bulk spool for ingest throughput benchmarking: `nAlerts` TCP
    * alerts (event + packet records) spread over `nFiles` files.
    * Deterministic; written once and reused (size-stamped marker).
    */
  def writeBulkSpool(baseDir: String, nAlerts: Int, nFiles: Int): String = {
    val dir = Paths.get(baseDir)
    Files.createDirectories(dir)
    val marker = dir.resolve(s".complete-$nAlerts-$nFiles")
    if (Files.exists(marker)) return baseDir
    val perFile = math.max(nAlerts / nFiles, 1)
    val t0 = 1700000000L
    var id = 0
    for (f <- 0 until nFiles) {
      val buf = ByteBuffer.allocate(perFile * 256)
      for (_ <- 0 until perFile) {
        id += 1
        val src = ip(10, (id >> 16) & 0xff, (id >> 8) & 0xff, id & 0xff)
        val dst = ip(192, 168, (id >> 8) & 0xff, id & 0xff)
        buf.put(eventV2(1, id, t0 + id, 1000001 + (id % 3), 1, 3,
          1 + (id % 3), 1 + (id % 4), src, dst, 1024 + (id % 60000),
          80, 6))
        buf.put(packet(1, id, t0 + id, ipv4Packet(6, src, dst,
          1024 + (id % 60000), 80, s"payload-$id".getBytes)))
      }
      Files.write(dir.resolve(f"snort.log.${t0 + f}%d"),
        java.util.Arrays.copyOf(buf.array(), buf.position()))
    }
    Files.createFile(marker)
    baseDir
  }
}
