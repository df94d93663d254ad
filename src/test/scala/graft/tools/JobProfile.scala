package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Decompose one bench query's wall time into its constituent Spark JOBS
  * (Test/runMain graft.tools.JobProfile <queryName> [sfDir]): runs the
  * query exactly like [[graft.Bench]] (noop sink, warm session) under a
  * listener that records each job's duration and call site, then prints
  * jobs sorted by total seconds grouped by call site. The protocol gates
  * (manifest maintenance, stores) spend their time across dozens of small
  * jobs — this shows WHERE, which `.explain` on the final frame cannot
  * (the work happens inside the gate body, not in the returned plan).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // experiment knob: override shuffle partitions independently of cores
    val shuffleP = sys.env.getOrElse("SPARK_GRAFT_PROFILE_SHUFFLE", cpus)
    // experiment knob: extra session confs, "k=v;k=v"
    val extra = sys.env.get("SPARK_GRAFT_PROFILE_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).map(a => (a(0), a(1)))
    val spark = extra.foldLeft(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleP))(
      (b, kv) => b.config(kv._1, kv._2))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    // SQL executionId → the ROOT action's description (the user call site)
    // — broadcast/subquery jobs run in the SQL thread pool where the job's
    // own callSite is useless, but they carry the execution id property
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(s.executionId,
              Option(s.description).getOrElse("?").takeWhile(_ != '\n'))
          case _ =>
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        def prop(k: String) = p.flatMap(x => Option(x.getProperty(k)))
        val site = prop("spark.sql.execution.root.id")
          .orElse(prop("spark.sql.execution.id"))
          .flatMap(id => Option(execDesc.get(id.toLong)))
          .orElse(prop("callSite.short"))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          rows.add((site, (System.nanoTime() - t0) / 1e9))
        }
      }
    }

    def once(run: Int): Double = {
      rows.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val bySite = rows.asScala.toSeq.groupBy(_._1)
        .map { case (site, xs) => (site, xs.map(_._2).sum, xs.size) }
        .toSeq.sortBy(-_._2)
      println(f"\n===== $name run $run: $total%.2f s wall, " +
        f"${rows.size} jobs, ${bySite.map(_._2).sum}%.2f s job-sum =====")
      bySite.takeWhile(_._2 >= 0.05).foreach { case (site, sec, n) =>
        println(f"  $sec%8.2f s  $n%4d jobs  $site")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      total
    }

    spark.sparkContext.addSparkListener(listener)
    val t = Seq(once(1), once(2))
    println(f"\n$name: runs ${t.map(x => f"$x%.2f").mkString(", ")} s")
    spark.stop()
  }
}
