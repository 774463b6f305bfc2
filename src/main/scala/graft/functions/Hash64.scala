package graft.functions

/** 64-bit hashing used by the sketch kernels (MinHash, SimHash, LSH).
  *
  * These run inside typed mapPartitions hot loops — millions of calls
  * per partition — so they are plain static JVM code the JIT inlines,
  * not Catalyst expressions. The SQL-facing operators that need
  * oracle parity (fingerprints, exact dedup) keep using Spark's
  * builtin md5/xxhash64 instead.
  */
object Hash64 {

  /** splitmix64 finalizer (Steele et al., "Fast splittable pseudorandom
    * number generators", OOPSLA'14 — public domain reference constants).
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, splitmix-finalized for avalanche. */
  def strHash(s: String): Long = {
    var h = 0xCBF29CE484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001B3L
      i += 1
    }
    mix(h)
  }
}
