package graft.engine.format

/** Streaming 128-bit NON-cryptographic fingerprint (r20, advisor r19):
  * two independent 64-bit lanes, each FNV-style byte folds finished
  * with a splitmix64 avalanche per added string. Replaces the MD5
  * digests the scan identity and rewrite provenance previously used —
  * `MessageDigest.getInstance("MD5")` throws on FIPS-hardened JVMs,
  * which would have failed every scan even though the digest is
  * purely an equality token, never a security boundary.
  *
  * Collision posture: 128 bits of well-avalanched state over
  * structured metadata strings (paths, ids) — an accidental collision
  * between two DIFFERENT segment states of one table remains a
  * non-concern at the 2^-64 birthday scale the r19 MD5 design argued.
  *
  * STABILITY CONTRACT: [[graft.engine.format.SegmentMeta.contentFp]]
  * persists these values in the commit log (`rewriteFp`/`rewriteOf`),
  * so the mixing constants and fold order below are FROZEN — changing
  * them silently invalidates recorded rewrite provenance (readers
  * degrade to the conservative full scan, correct but slow). */
final class Fp128 {
  private var h1 = 0x9E3779B97F4A7C15L
  private var h2 = 0xC2B2AE3D27D4EB4FL

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Fold one string (as UTF-16 code units — identity only, no
    * transcoding cost) into both lanes. */
  def add(s: String): this.type = {
    var a = 0xCBF29CE484222325L ^ s.length
    var b = 0x100000001B3L + s.length
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      a = (a ^ c) * 0x100000001B3L
      b = b * 0x9E3779B97F4A7C15L + (c + 1)
      i += 1
    }
    h1 = mix(h1 ^ mix(a))
    h2 = mix(h2 + mix(b) + 0x632BE59BD9B4E019L)
    this
  }

  /** Structural separator (field/record boundary) so `["ab","c"]` and
    * `["a","bc"]` fold differently at every nesting level. */
  def mark(tag: Int): this.type = {
    h1 = mix(h1 ^ (0x5851F42D4C957F2DL + tag))
    h2 = mix(h2 + (0x14057B7EF767814FL * (tag + 1)))
    this
  }

  /** The two lanes — an O(1)-comparable value type. */
  def result: (Long, Long) = (h1, h2)

  /** 32-hex-char rendering for persisted provenance tokens. */
  def hex: String = f"$h1%016x$h2%016x"
}
