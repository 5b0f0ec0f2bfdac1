package graft

/** Shared independent replay of the DP release tier's noise for specs:
  * ONE spelling of the exact-rational inverse-CDF threshold table
  * (rebuilt with BigInt arithmetic spelled differently from
  * `Stats.geometricThresholds` — ceil via `(x + d - 1) / d` — so the
  * tests stay an independent derivation, not a call into the code under
  * test) and of the 60-bit md5-uniform noise draw. Every DP spec reads
  * its expected noise from here; a convention change is one edit. */
object DpReplay {
  /** Thresholds for alpha = 1/2, clamp 32 — the defaults every DP spec
    * exercises. */
  val thresholds: Seq[Long] = {
    val two60 = BigInt(1) << 60
    (32 to 1 by -1).map(m => (two60 / (BigInt(2).pow(m - 1) * 3)).toLong) ++
      (0 until 32).map { j =>
        val den = BigInt(2).pow(j) * 3
        (two60 - (two60 + den - 1) / den).toLong
      }
  }

  /** Two-sided truncated-geometric noise for the draw keyed by
    * `keyTag` — the full sentinel-joined md5 input (e.g.
    * `s"$key\u0001$seed"` or `s"$key\u0001$bin\u0001$seed:$idx:hist"`). */
  def noise(keyTag: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(keyTag.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u = java.lang.Long.parseLong(md.take(15), 16)
    thresholds.count(_ <= u).toLong - 32L
  }
}
