package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GraftExpressions._

/** Session-extension entry point: registers every engine kernel as a SQL
  * function at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * so `spark.sql("SELECT simhash64(...)")` works on every session of a
  * cluster without per-session `registerAll` calls. The same builders back
  * [[graft.functions.GraftExpressions.registerAll]] for ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.GraftExpressions", null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    inject("to_alphanum", "HANA ALPHANUM zero-pad semantics") {
      xs => ToAlphanum(xs.head, if (xs.size > 1) intArg(xs(1)) else 10)
    }
    inject("minhash_signature", "k-minima MinHash signature of a hash set") {
      xs => MinHashSignature(xs.head, intArg(xs(1)))
    }
    inject("simhash64", "64-bit SimHash of pre-hashed tokens") {
      xs => SimHash64(xs.head)
    }
    inject("cosine_sim", "cosine similarity of two float vectors") {
      xs => CosineSim(xs.head, xs(1))
    }
    inject("hamming64", "Hamming distance of two 64-bit fingerprints") {
      xs => Hamming64(xs.head, xs(1))
    }
    inject("jaccard_sorted", "exact Jaccard of two sorted distinct arrays") {
      xs => JaccardSorted(xs.head, xs(1))
    }
    inject("shingle_hashes", "distinct hashed character n-grams") {
      xs => ShingleHashes(xs.head, intArg(xs(1)))
    }
    inject("word_ngram_hashes", "distinct hashed word n-grams") {
      xs => WordNgramHashes(xs.head, intArg(xs(1)))
    }
    inject("rolling_fingerprint", "winnowing min rolling hash fingerprint") {
      xs => RollingFingerprint(xs.head, intArg(xs(1)))
    }
    inject("st_point", "little-endian WKB 2-D point") {
      xs => StPoint(xs.head, xs(1))
    }
    inject("st_x", "x coordinate of a WKB point") { xs => StCoord(xs.head, 0) }
    inject("st_y", "y coordinate of a WKB point") { xs => StCoord(xs.head, 1) }
  }
}
