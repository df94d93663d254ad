package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Overlapping word-window document chunking — the step between curation
  * and embedding in a retrieval/training pipeline (fixed-size windows
  * with stride, so every token is covered and boundary context is shared
  * between neighboring chunks).
  *
  * 100 TB design: a pure map + explode — no shuffle, no UDF; windowing is
  * all array higher-order functions over the per-row token list, and the
  * output streams straight to the next stage's partitioning. The real
  * cost is the deliberate write amplification of overlap (~width/stride
  * ×), which is a corpus-size knob, not an execution concern.
  */
object Chunker {

  /** Chunk each document into word windows of `width`, starting every
    * `stride` words (stride ≤ width ⇒ full coverage; the final window is
    * the remaining tail, possibly shorter). Empty/whitespace-only
    * documents produce no chunks. Returns
    * `(idCol, chunk_idx, chunk_text, n_words)`.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in 1..width (gaps would drop tokens), got $stride")
    val ws = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    // sequence() refuses an ascending step over an empty range, so the
    // no-words case short-circuits to no start positions at all
    val starts = when(size(ws) < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(ws), lit(stride)))
    docs.select(col(idCol), posexplode(
        transform(starts, s => slice(ws, s, lit(width)))))
      .select(col(idCol),
        col("pos").cast(LongType).alias("chunk_idx"),
        array_join(col("col"), " ").alias("chunk_text"),
        size(col("col")).cast(LongType).alias("n_words"))
  }
}
