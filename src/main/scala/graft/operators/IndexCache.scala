package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-lifetime memo for DRIVER-SIDE persisted-index sidecar reads
  * (coarse centroids, PQ codebooks/meta, sign meta, BM25 stats, cluster
  * meta — the r15 verdict's "fixed per-probe driver overhead": each
  * probe re-ran 2–4 tiny parquet jobs, most of x175's ~4 s toy-scale
  * floor over its in-memory twin and a per-microbatch tax in the
  * foreachBatch serving paths).
  *
  * Keyed by (logical key, FILESYSTEM SIGNATURE of the sidecar dirs):
  * the signature is the sorted (path, length, mtime) listing of every
  * file under the given directories — listed through the Hadoop FS API,
  * so any scheme the session can read works, and listing is a metadata
  * call (no Spark job, no file contents). An in-place rewrite (Spark
  * overwrite emits fresh part-file names), a crashed half-write, or any
  * other content change misses the cache, so the probe re-reads and
  * re-VALIDATES — the staleness-refusal laws (mis-stamped index
  * refused, rewritten index re-read) hold exactly as before, while
  * repeated probes of an unchanged index skip the driver-side parquet
  * jobs entirely. Refusals are never cached: a `require` throw inside
  * `load` leaves no entry, so a corrupt index refuses on EVERY probe.
  *
  * Memory: one small driver object per distinct index path — the
  * bounded-collect class the loaders already hold transiently
  * (nCentroids·dim floats, ksub·dim longs, 1-row stamps).
  */
private[graft] object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, AnyRef)]()

  /** The sidecar dirs' listing signature — sorted so iteration order
    * cannot flap the key; an absent dir signs as `absent` (the probe's
    * own read then fails with the engine's normal missing-path error).
    */
  private def dirSignature(spark: SparkSession, dirs: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    dirs.sorted.map { d =>
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(conf)
      if (!fs.exists(path)) s"$d=absent"
      else {
        val it = fs.listFiles(path, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          buf += s"${s.getPath}:${s.getLen}:${s.getModificationTime}"
        }
        buf.sorted.mkString(",")
      }
    }.mkString(";")
  }

  /** Return the cached value for `key` if the sidecar dirs are
    * byte-for-byte the ones it was loaded from; otherwise run `load`
    * (re-read + re-validate) and cache the result. `load` runs OUTSIDE
    * any map lock (the broadcastIfMeasuredUnder rule — a driver-side
    * Spark job must not run under a ConcurrentHashMap bin lock); a lost
    * race loads twice, which is harmless and idempotent.
    */
  def cached[T <: AnyRef](
      spark: SparkSession, key: String, dirs: Seq[String])(load: => T): T = {
    val sig = dirSignature(spark, dirs)
    val hit = cache.get(key)
    if (hit != null && hit._1 == sig) hit._2.asInstanceOf[T]
    else {
      val v = load
      cache.put(key, (sig, v))
      v
    }
  }
}
