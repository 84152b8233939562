package graft

/** Data-size-derived session dials. Round-10's scale ladder showed the
  * fixed `spark.sql.shuffle.partitions = cpus` starving wide shuffles
  * at the next decade (WCC at sf3: ~1.3 M rows per task on 41 M edges
  * → a 4× hop that vanished with more partitions). The dial: one
  * shuffle task per 16 MB of COMPRESSED input (≈ the classic ~100 MB
  * of in-flight data after the 4-6× decode/shuffle expansion — see
  * shufflePartitions), floored at
  * the core count (never under-parallelize), capped at 4096 (AQE
  * coalesces small partitions back together, so over-provisioning is
  * cheap — under-provisioning is not recoverable at runtime). */
object Tune {

  /** Total bytes of parquet under a dataset dir (local FS walk —
    * the harness datasets; a cluster deployment would read the
    * FileSystem's content summary the same way). */
  def datasetBytes(sfDir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length else 0L }
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(sfDir))
  }

  /** shuffle.partitions for a dataset: max(cpus, bytes / 16 MB),
    * capped at 4096. 16 MB of COMPRESSED parquet expands ~4-5× in a
    * shuffle (and graph loops shuffle multiples of their input —
    * messages per edge per round), so this lands near the classic
    * ~100 MB-per-task of in-flight data. At sf0.1 (≈17 MB) this is
    * just `cpus` — driver-bench behavior unchanged; at sf3+ it grows
    * with the data, which is what keeps per-task shuffle volume flat
    * across scale decades (round-10's WCC sf3 hop, round-11's sf10
    * hop at the 64 MB divisor — both partition starvation). */
  def shufflePartitions(sfDir: String, cpus: Int): Int = {
    val perTask = 16L << 20
    val fromData = (datasetBytes(sfDir) / perTask).toInt
    math.min(4096, math.max(cpus, fromData))
  }
}
