package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** One-off: surface the exact failure of the 256-layer literal fold. */
object K256Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val m = (0 until 256).map(i => (s"x$i", s"y$i"))
    try {
      Seq("hello").toDF("text")
        .select(sum(BpeTrain.tokenCount(col("text"), m)).alias("n")).collect()
      println("OK")
    } catch { case e: Throwable =>
      println(s"CLASS=${e.getClass.getName}")
      println(s"MSG=${Option(e.getMessage).getOrElse("").take(400)}")
      var c = e.getCause
      while (c != null) {
        println(s"CAUSE=${c.getClass.getName}: " +
          Option(c.getMessage).getOrElse("").take(200))
        c = c.getCause
      }
    }
    spark.stop()
  }
}
