package graft.core

/** Machine-level disk-read counter for I/O-attributing timed passes.
  *
  * Why it exists (VERDICT r12 "What's wrong #3"): wall-clock rows that
  * stream multi-GB staged tables swing multiples with PAGE-CACHE state —
  * a bench run recorded minutes after a cache-rotating probe session
  * carried a 2.4× phantom regression on a plan that bisected flat. Deltas
  * of this counter around each timed pass make a polluted row
  * self-identify in the committed record: a pass whose read-bytes
  * collapse to ~0 ran against a primed cache; a pass reading the table's
  * full size from disk explains its own wall-clock.
  */
object DiskStats {

  /** Σ sectors_read × 512 over whole block devices in `/proc/diskstats`.
    * Partition rows (names ending in a digit) are skipped — they would
    * double-count their parent device; loop/ram devices are noise.
    * Returns -1 where the file is unreadable (non-Linux), so callers can
    * record "unattributed" instead of crashing. */
  def readBytes(): Long =
    scala.util.Try {
      scala.io.Source.fromFile("/proc/diskstats").getLines()
        .map(_.trim.split("\\s+"))
        .filter(f => f.length > 5 && f(2).matches("[a-z]+") &&
          !f(2).startsWith("loop") && !f(2).startsWith("ram"))
        .map(f => f(5).toLong * 512L)
        .sum
    }.getOrElse(-1L)

  /** Recursive byte size of this session's Spark scratch dirs (blockmgr +
    * spark-* under java.io.tmpdir) — the "scratch stays flat" witness the
    * magnitude probes print per stage. */
  def scratchBytes(): Long = {
    def size(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.iterator.map(size).sum).getOrElse(0L)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"))
    Option(tmp.listFiles).map(_.iterator
      .filter(f => f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
      .map(size).sum).getOrElse(0L)
  }
}
