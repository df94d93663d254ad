package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Ad-hoc stage timing for the MinHash pipeline (Test/runMain graft.tools.DedupProbe). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = time("signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text").cache())
    time("signatures count")(println("sigs=" + sigs.count()))
    val cands = time("candidates")(
      Dedup.minhashCandidates(sigs, "doc_id").cache())
    time("candidates count")(println("cands=" + cands.count()))
    val verified = time("verify")(
      Dedup.jaccardVerify(cands, docs, "doc_id", "text", threshold = 0.2))
    time("verify count")(println("verified=" + verified.count()))
    spark.stop()
  }
}
