package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Network address helpers composed from built-in (whole-stage
  * codegen'd) functions — the MySQL `inet_aton`/`inet_ntoa` the
  * reference leans on in SQL (/root/reference/charlotte/
  * __init__.py:487-488) plus `hexlify` (ibid:503).
  */
object Net {
  /** u32 → dotted quad, like MySQL INET_NTOA. */
  def inet_ntoa(c: Column): Column = {
    val v = c.cast("long")
    concat_ws(".",
      shiftright(v, 24).bitwiseAND(255).cast("string"),
      shiftright(v, 16).bitwiseAND(255).cast("string"),
      shiftright(v, 8).bitwiseAND(255).cast("string"),
      v.bitwiseAND(255).cast("string"))
  }

  /** dotted quad → u32, like MySQL INET_ATON. */
  def inet_aton(c: Column): Column = {
    val p = split(c, "\\.")
    (element_at(p, 1).cast("long") * 16777216L) +
      (element_at(p, 2).cast("long") * 65536L) +
      (element_at(p, 3).cast("long") * 256L) +
      element_at(p, 4).cast("long")
  }

  /** 4-byte address (as stored in unified2 records) → u32. */
  def bytesToU32(c: Column): Column =
    conv(hex(c), 16, 10).cast("long")

  /** binascii.hexlify equivalent: binary → lowercase hex string. */
  def hexlify(c: Column): Column = lower(hex(c))

  /** Render a unified2 address blob: dotted quad for 4-byte IPv4,
    * lowercase hex for 16-byte IPv6 (keeps ANSI-mode arithmetic off
    * the 128-bit path).
    */
  def ipToString(c: Column): Column =
    when(length(c) === 4, inet_ntoa(bytesToU32(c))).otherwise(hexlify(c))
}
