package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Print formatted physical plans for the headline queries
  * (Test/runMain graft.tools.PlanAudit [queryName...]).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_agg", "q_cdc_delta_fold", "q3_order_revenue",
        "q5_nation_revenue")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
