package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** One-shot scale smoke (SCALING.md): runs the named queries ONCE each
  * against a (scaled-up) sf dir and reports wall seconds plus the
  * aggregate task metrics that flag memory cliffs before a cluster
  * does — shuffle read/write bytes, memory/disk spill, and peak
  * per-task execution memory. No medians, no warm repeats: this hunts
  * OOMs and shuffle blow-ups, not microseconds.
  *
  * Usage: runMain graft.ScaleSmoke <sfDir> <q1,q2,...>
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleSmoke <sfDir> <q1,q2,...>")
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = BenchSession.build()

    val shuffleRead = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val peakTaskMem = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })
    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f"

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      Seq(shuffleRead, shuffleWrite, memSpill, diskSpill, peakTaskMem)
        .foreach(_.set(0))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(300)
      println(f"SMOKE $name rows=$rows sec=$sec%.1f " +
        s"shuffle_read_mb=${mb(shuffleRead.get)} " +
        s"shuffle_write_mb=${mb(shuffleWrite.get)} " +
        s"mem_spill_mb=${mb(memSpill.get)} " +
        s"disk_spill_mb=${mb(diskSpill.get)} " +
        s"peak_task_mem_mb=${mb(peakTaskMem.get)}")
    }
    spark.stop()
  }
}
