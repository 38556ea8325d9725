package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Action-attribution profiler for the optimization rounds: runs one
  * named query (warm — one untimed pass first, so codegen/JIT noise is
  * excluded exactly like the bench) and prints every Spark ACTION the
  * gate executes, in order, with its wall duration and a physical-plan
  * digest. Gates run their actions sequentially on the driver, so the
  * chronological log attributes the seconds to gate phases exactly —
  * the headless twin of the UI's SQL tab (optimization guide §7.1).
  *
  * Usage: runMain graft.StageProfile <sfDir> <query> [reps]
  * Diagnostic main, same family as [[BenchProbe]]/[[LifecycleProbe]].
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <query> [reps]")
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = BenchSession.build()
    val fn = SparkEntry.queries(name)

    def releaseAll(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }

    // warm pass (untimed, unprofiled): same steady-state posture as Bench
    fn(spark, dir).count()
    releaseAll()
    System.gc()
    Thread.sleep(100)

    val taskMs = new AtomicLong(0L)
    @volatile var tZero = System.nanoTime()
    def mark(): Double = (System.nanoTime() - tZero) / 1e9
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageListener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val name = Option(e.properties.getProperty("callSite.short"))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        val frame = e.stageInfos.lastOption
          .flatMap(_.details.linesIterator.find(l =>
            l.contains("graft.") && !l.contains("StageProfile")))
          .map(_.trim).getOrElse("")
        jobStarts.put(e.jobId, (System.nanoTime(), s"$name  $frame"))
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val s = jobStarts.remove(e.jobId)
        if (s != null) {
          val secs = (System.nanoTime() - s._1) / 1e9
          if (secs >= 0.02)
            println(f"[job] t=${mark()}%7.2f $secs%7.3fs  ${s._2}")
        }
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = ()
    }
    val t0 = System.nanoTime()
    tZero = t0
    val qeListener = new QueryExecutionListener {
      private def digest(qe: QueryExecution): String = {
        val hist = scala.collection.mutable.Map.empty[String, Int]
        def visit(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
          val key = p.nodeName.split("[ (]")(0)
          hist(key) = hist.getOrElse(key, 0) + 1
          p match {
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => visit(a.executedPlan)
            case s: org.apache.spark.sql.execution.adaptive
                .QueryStageExec => visit(s.plan)
            case _ => ()
          }
          p.children.foreach(visit)
        }
        try { visit(qe.executedPlan) } catch { case _: Throwable => () }
        hist.toSeq.sortBy(-_._2).take(6)
          .map { case (k, v) => s"$k=$v" }.mkString(",")
      }
      override def onSuccess(
          funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        println(f"[act] t=${mark()}%7.2f ${durationNs / 1e9}%7.3fs " +
          f"cumTask=${taskMs.get() / 1e3}%8.2fs $funcName%-18s ${digest(qe)}")
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit =
        println(f"[act] t=${mark()}%7.2f FAILED $funcName")
    }
    spark.sparkContext.addSparkListener(stageListener)
    spark.listenerManager.register(qeListener)
    (1 to reps).foreach { _ => fn(spark, dir).count() }
    val totalSec = mark()
    Thread.sleep(500) // let the async listener bus drain
    spark.listenerManager.unregister(qeListener)
    println(f"PROFILE $name reps=$reps total=$totalSec%.2f s " +
      f"taskTime=${taskMs.get() / 1e3}%.2f s")
    spark.stop()
  }
}
