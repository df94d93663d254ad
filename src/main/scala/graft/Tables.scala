package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The driver's `events.ts` has shipped as both a µs TIMESTAMP_NTZ and
    * (pre-refresh, under `nanosAsLong`) an int64 of epoch-nanos; the r8
    * bench run hit the long shape and every ts-dependent query reported
    * -1. Normalize to the µs TIMESTAMP_NTZ contract at the loader so no
    * query carries per-shape branches. Session tz is UTC in Bench/Verify,
    * making the LTZ→NTZ cast wall-clock exact.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.LongType
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
