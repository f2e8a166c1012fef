package graft

import org.apache.spark.sql.functions._

import graft.functions.{ExprKernels, Net}

/** RFC 5952 rendering proofs for the native Inet6Ntoa expression:
  * zero-run compression picks the longest run, leftmost on ties, never
  * compresses a single zero group, and non-16-byte blobs stay NULL.
  */
class Inet6Spec extends SparkSuite {

  private def v6(groups: Int*): Array[Byte] = {
    require(groups.length == 8)
    groups.flatMap(g => Seq(((g >> 8) & 0xff).toByte, (g & 0xff).toByte))
      .toArray
  }

  private def render(bytes: Array[Byte]): String = {
    val u = ExprKernels.inet6(bytes)
    if (u == null) null else u.toString
  }

  test("kernel: canonical RFC 5952 forms") {
    assert(render(v6(0, 0, 0, 0, 0, 0, 0, 0)) == "::")
    assert(render(v6(0, 0, 0, 0, 0, 0, 0, 1)) == "::1")
    assert(render(v6(0x2001, 0xdb8, 0, 0, 0, 0, 0, 1)) == "2001:db8::1")
    assert(render(v6(1, 0, 0, 0, 0, 0, 0, 0)) == "1::")
    // longest run wins even when a shorter one comes first
    assert(render(v6(0x2001, 0, 0, 0xdb8, 0, 0, 0, 1)) == "2001:0:0:db8::1")
    // equal-length runs: leftmost compressed
    assert(render(v6(0x2001, 0, 0, 1, 0, 0, 1, 1)) == "2001::1:0:0:1:1")
    // a single zero group is NOT compressed
    assert(render(v6(0x2001, 0xdb8, 0, 1, 1, 1, 1, 1)) == "2001:db8:0:1:1:1:1:1")
    // no leading zeros, lowercase
    assert(render(v6(0xfe80, 0, 0, 0, 0x202, 0xb3ff, 0xfe1e, 0x8329)) ==
      "fe80::202:b3ff:fe1e:8329")
    assert(render(Array.fill[Byte](4)(1)) == null)
    assert(render(Array.fill[Byte](17)(1)) == null)
  }

  test("kernel: IPv4-mapped addresses use the RFC 5952 §5 mixed notation") {
    val mapped = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0xff.toByte, 0xff.toByte, 192.toByte, 0, 2, 1)
    assert(render(mapped) == "::ffff:192.0.2.1")
    // v4-COMPATIBLE (::x.y.z.w, deprecated) stays hex-grouped
    assert(render(v6(0, 0, 0, 0, 0, 0, 0xc000, 0x201)) == "::c000:201")
  }

  test("expression matches the kernel through codegen and handles NULLs") {
    import spark.implicits._
    val df = Seq(
      (1L, v6(0x2001, 0xdb8, 0, 0, 0, 0, 0, 2)),
      (2L, Array.fill[Byte](3)(7)), // wrong length -> NULL
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "b")
    val out = df.select(col("id"), Net.inet6_ntoa(col("b")).as("ip"))
      .orderBy(col("id")).collect()
    assert(out(0).getString(1) == "2001:db8::2")
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    // ipToString dispatches 4/16/other correctly
    val disp = df.select(Net.ipToString(col("b")).as("s"))
      .orderBy(col("id")).collect()
    assert(disp(0).getString(0) == "2001:db8::2")
    assert(disp(1).getString(0) == "070707")
  }
}
