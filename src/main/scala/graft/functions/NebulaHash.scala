package graft.functions

import org.apache.spark.sql.Column

/** The reference's `hash()` builtin: MurmurHash2-64A with seed
  * 0xc70f6907 (src/common/base/MurmurHash2.h:45-85). Int-vid spaces
  * derive every vertex id as `hash(<string key>)` (importer
  * `function: hash`, tests/data/nba_int_vid/config.yaml), so matching
  * the reference's goldens bit-for-bit requires the same function.
  * MurmurHash2 is a public-domain algorithm (Austin Appleby).
  *
  * Scala `Long` arithmetic is two's-complement mod 2^64 — identical to
  * the C++ uint64_t ops; the result is the signed view the reference's
  * own TCK harness uses (tests/tck/utils/mmh2.py `signed=True`).
  */
object NebulaHash {

  private val M = 0xc6a4a7935bd1e995L
  private val R = 47
  private val Seed = 0xc70f6907L

  def hash64(bytes: Array[Byte]): Long = {
    val size = bytes.length
    var h = Seed ^ (size.toLong * M)
    val end = size & 0xfffffff8
    var pos = 0
    while (pos < end) {
      // little-endian 8-byte load, like the C++ uint64_t* read
      var k = 0L
      var i = 7
      while (i >= 0) { k = (k << 8) | (bytes(pos + i) & 0xffL); i -= 1 }
      k *= M
      k ^= k >>> R
      k *= M
      h ^= k
      h *= M
      pos += 8
    }
    val left = size & 7
    if (left >= 7) h ^= (bytes(end + 6) & 0xffL) << 48
    if (left >= 6) h ^= (bytes(end + 5) & 0xffL) << 40
    if (left >= 5) h ^= (bytes(end + 4) & 0xffL) << 32
    if (left >= 4) h ^= (bytes(end + 3) & 0xffL) << 24
    if (left >= 3) h ^= (bytes(end + 2) & 0xffL) << 16
    if (left >= 2) h ^= (bytes(end + 1) & 0xffL) << 8
    if (left >= 1) { h ^= bytes(end) & 0xffL; h *= M }
    h ^= h >>> R
    h *= M
    h ^= h >>> R
    h
  }

  def hash64(s: String): Long = hash64(s.getBytes("UTF-8"))

  /** std::hash<double> (libstdc++ _Hash_bytes = the same murmur over
    * the 8-byte little-endian bit pattern; Value::hash FLOAT arm). */
  def hash64(d: Double): Long = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(d)
    hash64(bb.array())
  }

  /** Reference hash() over a constant (FunctionManager.cpp:1689 via
    * std::hash<Value>): identity on ints, 0/1 on bools, bit-pattern
    * murmur on floats, UTF-8 murmur on strings. */
  def hashValue(v: Any): Long = v match {
    case n: Long => n
    case n: Int => n.toLong
    case b: Boolean => if (b) 1L else 0L
    case d: Double => hash64(d)
    case s: String => hash64(s)
    case null => -1L // std::hash NULLVALUE arm: ~0UL
    case other => hash64(other.toString)
  }

  /** Column form for non-constant arguments: a native Catalyst
    * expression (NebulaHashExpression) that dispatches on the child's
    * RESOLVED type at analysis — identity on integral columns, 0/1 on
    * booleans, bit-pattern murmur on floats, UTF-8 murmur on strings
    * (FunctionManager.cpp "hash": std::hash over the value). Replaces
    * the round-4 UDF, which stringified unconditionally and so
    * diverged on hash(<int column>). */
  def hashCol(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NebulaHashExpression(ColumnBridge.expression(c)))
  }
}
