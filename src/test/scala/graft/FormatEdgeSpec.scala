package graft

import java.nio.ByteBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DecodePacket
import graft.sources.{Unified2, Unified2Fixture}

/** Edge cases of the binary formats, tested at the pure-function level
  * (no Spark session needed).
  */
class FormatEdgeSpec extends AnyFunSuite {

  private def ip(a: Int, b: Int, c: Int, d: Int) =
    Array[Byte](a.toByte, b.toByte, c.toByte, d.toByte)

  private def idx(n: String) = DecodePacket.schema.fieldIndex(n)

  test("DecodePacket skips an 802.1Q VLAN tag") {
    val plain = Unified2Fixture.ipv4Packet(6, ip(10, 0, 0, 1),
      ip(10, 0, 0, 2), 1234, 80, "HI".getBytes)
    // splice a VLAN tag (tpid 0x8100, vid 100) between macs and ethertype
    val tagged = ByteBuffer.allocate(plain.length + 4)
    tagged.put(plain, 0, 12)
    tagged.putShort(0x8100.toShort).putShort(100.toShort)
    tagged.put(plain, 12, plain.length - 12)
    val r = DecodePacket.decode(tagged.array())
    assert(r.getInt(idx("vlan")) == 100)
    assert(r.getInt(idx("eth_type")) == 0x0800)
    assert(r.getInt(idx("ip_ver")) == 4)
    assert(r.getUTF8String(idx("ip_src")).toString == "10.0.0.1")
    assert(r.getInt(idx("sport")) == 1234)
    assert(r.getInt(idx("dport")) == 80)
  }

  test("DecodePacket yields nulls for runt and non-IP frames") {
    val runt = DecodePacket.decode(Array[Byte](1, 2, 3))
    assert(runt.isNullAt(idx("eth_type")))
    assert(runt.isNullAt(idx("ip_ver")))
    val arp = ByteBuffer.allocate(20)
    arp.position(12); arp.putShort(0x0806.toShort) // ARP ethertype
    val r = DecodePacket.decode(arp.array())
    assert(r.getInt(idx("eth_type")) == 0x0806)
    assert(r.isNullAt(idx("ip_ver")))
  }

  test("parseFile tolerates a truncated trailing record") {
    val full = Unified2Fixture.eventV2(1, 1, 1700000000L, 100, 1, 1, 1, 1,
      ip(1, 1, 1, 1), ip(2, 2, 2, 2), 1, 2, 6)
    val bytes = full ++ full.take(full.length / 2) // second record cut off
    val recs = Unified2.parseFile("f", bytes)
    assert(recs.length == 1)
    assert(recs.head.event_id.contains(1L))
  }

  test("parseFile keeps framing for unknown record types") {
    val body = Array[Byte](1, 2, 3, 4)
    val rec = ByteBuffer.allocate(8 + body.length)
    rec.putInt(999).putInt(body.length).put(body)
    val known = Unified2Fixture.eventV2(1, 2, 1700000000L, 100, 1, 1, 1, 1,
      ip(1, 1, 1, 1), ip(2, 2, 2, 2), 1, 2, 6)
    val recs = Unified2.parseFile("f", rec.array() ++ known)
    assert(recs.length == 2)
    assert(recs.head.rec_type == 999)
    assert(recs.head.event_id.isEmpty)
    assert(recs(1).event_id.contains(2L)) // parsing resumes after unknown
  }
}
