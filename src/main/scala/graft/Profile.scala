package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job profiling main (optimization guide §1): runs the named
  * SparkEntry queries once on `sfDir` with a listener that records every
  * Spark job's wall time, stage task-time and shuffle bytes, then prints
  * a per-query breakdown sorted by cost. The gaps between Spark jobs are
  * driver-side work (commit I/O, footer stats, planning) — printed as
  * `driver-gap` so commit overhead is visible next to executor time.
  *
  * Usage: runMain graft.Profile <sfDir> <prefix,prefix,...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefixes = if (args.length > 1) args(1).split(',').toSeq else Nil
    val spark = graft.core.GraftSession.get("graft-profile")
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L,
                      var taskTimeMs: Long = 0L,
                      var shuffleRead: Long = 0L,
                      var shuffleWrite: Long = 0L,
                      var stages: List[String] = Nil)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(e.jobId, JobRec(e.jobId, desc, e.time))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        // attribute the stage to the most recent job (approximation:
        // stages of concurrent jobs may interleave; profiling only)
        val last = if (order.isEmpty) -1 else order.get(order.size - 1)
        Option(jobs.get(last)).foreach { j =>
          j.taskTimeMs += m.executorRunTime
          j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
          j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          j.stages ::= f"${e.stageInfo.name.take(46)}[${e.stageInfo.numTasks}t ${m.executorRunTime / 1000.0}%.1fs]"
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // driver-gap attribution: sample the main thread's stack at 50 ms and
    // bucket by the deepest graft/spark frame — tells us what the driver
    // is doing when no Spark job runs (guide §7.3's thread-dump loop,
    // automated)
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val execSamples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          // executor task threads: bucket the top interesting frame of
          // every running task (local mode: same JVM)
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, est) =>
            if (t.getName.startsWith("Executor task launch worker")) {
              est.find { e =>
                val c = e.getClassName
                !c.startsWith("java.lang.Thread") && !c.contains("Unsafe") &&
                  (c.startsWith("org.apache.") || c.startsWith("graft.") ||
                    c.startsWith("java.") || c.startsWith("sun.") ||
                    c.startsWith("com.github."))
              }.foreach { e =>
                val f = s"${e.getClassName.split('.').takeRight(2).mkString(".")}.${e.getMethodName}:${e.getLineNumber}"
                execSamples.merge(f, 1, (a, b) => a + b)
              }
              // SPARK_GRAFT_PROFILE_STACK=<substr>: record the FULL
              // stack of any executor thread whose frames mention the
              // substring — attribution for opaque JDK frames (GZIP,
              // Cleaner) the one-frame bucket can't explain
              sys.env.get("SPARK_GRAFT_PROFILE_STACK").foreach { pat =>
                if (est.exists(_.getClassName.contains(pat))) {
                  val full = est.take(24).map(x =>
                    s"${x.getClassName}.${x.getMethodName}:${x.getLineNumber}")
                    .mkString(" | ")
                  execSamples.merge("FULLSTACK " + full, 1, (a, b) => a + b)
                }
              }
            }
          }
          val st = mainThread.getStackTrace
          def fmt(e: StackTraceElement) =
            s"${e.getClassName.split('.').takeRight(2).mkString(".")}.${e.getMethodName}:${e.getLineNumber}"
          // top-most spark/jdk frame = WHAT runs; top-most graft frame
          // (excluding the entry lambda) = WHERE it was called from
          val what = st.find { e =>
            val c = e.getClassName
            (c.startsWith("org.apache.spark.") || c.startsWith("java.nio.") ||
              c.startsWith("java.io.")) && !c.contains("Profile")
          }.map(fmt).getOrElse("?")
          val where = st.find { e =>
            e.getClassName.startsWith("graft.") &&
              !e.getClassName.contains("Profile")
          }.map(fmt).getOrElse("-")
          samples.merge(s"$what  <=  $where", 1, (a, b) => a + b)
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => prefixes.isEmpty || prefixes.exists(q._1.startsWith))
      .foreach { case (name, fn) =>
        jobs.clear(); order.clear(); samples.clear(); execSamples.clear()
        sampling = true
        val t0 = System.currentTimeMillis()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          println(s"[profile] $name failed: ${e.getMessage}") }
        val t1 = System.currentTimeMillis()
        sampling = false
        spark.catalog.clearCache()
        Thread.sleep(300) // let listener events drain
        val recs = order.toArray.map(id => jobs.get(id.asInstanceOf[Int]))
          .filter(_ != null).toSeq
        println(f"\n==== $name total ${(t1 - t0) / 1000.0}%.2f s, " +
          s"${recs.size} jobs ====")
        var prevEnd = t0
        var gapTotal = 0L
        recs.foreach { j =>
          val gap = j.start - prevEnd
          gapTotal += math.max(0L, gap)
          if (gap > 200)
            println(f"  driver-gap ${gap / 1000.0}%6.2f s (before job ${j.id})")
          val dur = (j.end - j.start) / 1000.0
          if (dur >= 0.2)
            println(f"  job ${j.id}%4d ${dur}%6.2f s  task ${j.taskTimeMs / 1000.0}%7.1f s  " +
              f"shR ${j.shuffleRead / 1e6}%8.1f MB shW ${j.shuffleWrite / 1e6}%8.1f MB  " +
              s"${j.stages.reverse.mkString(" | ").take(140)}  ${j.desc.take(60)}")
          prevEnd = math.max(prevEnd, j.end)
        }
        val tailGap = t1 - prevEnd
        gapTotal += math.max(0L, tailGap)
        println(f"  driver gaps total ${gapTotal / 1000.0}%.2f s of ${(t1 - t0) / 1000.0}%.2f s")
        import scala.jdk.CollectionConverters._
        println("  main-thread samples (50 ms each, top 18):")
        samples.asScala.toSeq.sortBy(-_._2).take(18).foreach { case (f, n) =>
          println(f"    ${n * 0.05}%6.2f s  $f")
        }
        println("  executor-thread samples (50 ms each, top 18; sums over concurrent tasks):")
        execSamples.asScala.toSeq.sortBy(-_._2).take(18).foreach { case (f, n) =>
          println(f"    ${n * 0.05}%6.2f s  $f")
        }
      }
    spark.stop()
  }
}
