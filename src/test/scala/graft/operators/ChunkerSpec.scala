package graft.operators

import graft.SparkSpec

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping windows cover the doc; final window is the shorter tail") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = Chunker.chunks(docs, "doc_id", "text", width = 4, stride = 2)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b c d", 4L),
      (1L, 1L, "c d e f", 4L),
      (1L, 2L, "e f g", 3L),
      (1L, 3L, "g", 1L)))
  }

  test("stride == width tiles without overlap; empty docs chunk to nothing") {
    val docs = Seq((1L, "a b c d e"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    val got = Chunker.chunks(docs, "doc_id", "text", width = 2, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b", 2L),
      (1L, 1L, "c d", 2L),
      (1L, 2L, "e", 1L)))
  }

  test("a gapped stride is refused (it would drop tokens)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.chunks(docs, "doc_id", "text", width = 2, stride = 3)
    }
  }
}
