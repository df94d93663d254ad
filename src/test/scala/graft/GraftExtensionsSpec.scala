package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions injection path: a session built with
  * GraftExtensions resolves every kernel by name in plain SQL.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  /** Suites share one JVM, so a SparkContext usually already exists — and
    * the `spark.sql.extensions` STRING is only honored when the builder
    * creates the context itself (it is read from the context conf, not
    * from builder options). `withExtensions` applies the same injector
    * unconditionally, so this exercises GraftExtensions either way. The
    * session is isolated (cleared then restored default/active) so other
    * suites keep their own session state.
    */
  private lazy val spark: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    prevDefault.foreach(SparkSession.setDefaultSession)
    prevActive.foreach(SparkSession.setActiveSession)
    s
  }

  test("kernels resolve as SQL functions via spark.sql.extensions") {
    val r = spark.sql(
      """SELECT
        |  to_alphanum('42', 6) AS a,
        |  hamming64(7L, 4L) AS h,
        |  st_x(st_point(3.5D, -1.25D)) AS x,
        |  size(shingle_hashes('hello world', 5)) AS ns,
        |  size(word_ngram_hashes('one two three four', 2)) AS nw
        |""".stripMargin).head()
    assert(r.getString(0) == "000042")
    assert(r.getInt(1) == 2) // 7 xor 4 = 3 → two bits
    assert(r.getDouble(2) == 3.5)
    assert(r.getInt(3) == 7) // 11 chars → 7 distinct 5-grams
    assert(r.getInt(4) == 3) // 4 words → 3 bigrams
  }

  test("top_ngram_fraction resolves in SQL (r8 kernel)") {
    val r = spark.sql(
      """SELECT top_ngram_fraction('a b a b a b', 2) AS boiler,
        |       top_ngram_fraction('w x y z', 2) AS clean,
        |       top_ngram_fraction('solo', 3) AS short""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.0)
  }

  test("simhash/jaccard compose in SQL") {
    val j = spark.sql(
      """SELECT jaccard_sorted(shingle_hashes('abcdef', 3),
        |                      shingle_hashes('abcdef', 3)) AS j""".stripMargin)
      .head().getDouble(0)
    assert(j == 1.0)
  }
}
