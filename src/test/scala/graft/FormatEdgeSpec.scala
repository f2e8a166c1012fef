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

  test("readRange streams records and stops on torn/oversized/shrunk input") {
    import java.nio.channels.FileChannel
    import java.nio.file.{Files, StandardOpenOption}
    val full = Unified2Fixture.eventV2(1, 7, 1700000000L, 100, 1, 1, 1, 1,
      ip(1, 1, 1, 1), ip(2, 2, 2, 2), 1, 2, 6)
    def withFile[T](bytes: Array[Byte])(f: (FileChannel, Long) => T): T = {
      val p = Files.createTempFile("graft_rr", ".u2")
      Files.write(p, bytes)
      val ch = FileChannel.open(p, StandardOpenOption.READ)
      try f(ch, Files.size(p)) finally { ch.close(); Files.delete(p) }
    }
    // clean span: both records stream out with continued numbering
    withFile(full ++ full) { (ch, size) =>
      val recs = Unified2.readRange(ch, "f", 0, size, 5).toSeq
      assert(recs.map(_.rec_index) == Seq(5, 6))
      assert(recs.forall(_.event_id.contains(7L)))
    }
    // torn tail inside the span: parses the whole record, stops at tear
    withFile(full ++ full.take(full.length / 2)) { (ch, size) =>
      assert(Unified2.readRange(ch, "f", 0, size, 0).size == 1)
    }
    // garbage length field larger than the remaining span: stops
    withFile {
      val b = ByteBuffer.allocate(8)
      b.putInt(104).putInt(Int.MaxValue)
      full ++ b.array()
    } { (ch, size) =>
      assert(Unified2.readRange(ch, "f", 0, size, 0).size == 1)
    }
    // planned span longer than the file (file shrunk after planning):
    // short read ends the iterator instead of failing
    withFile(full) { (ch, size) =>
      assert(Unified2.readRange(ch, "f", 0, size + 64, 0).size == 1)
    }
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
