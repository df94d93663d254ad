package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the Gopher rule-set flags and the C4 line/page cleaner on
  * synthetic multi-line punctuated pages — the behaviors the single-line
  * unpunctuated gate corpus cannot reach (bullet/ellipsis line fractions,
  * terminal-punctuation line retention, page-level drops).
  */
class GopherC4Spec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String): Row =
    Seq(text).toDF("text")
      .select(TextAnalysis.gopherFlags(col("text")).alias("g"))
      .select("g.*").head()

  test("gopher: prose passes every rule") {
    val prose = Seq.fill(5)(
      "the quick brown fox jumps over that lazy dog and runs off to be " +
        "with the pack for a while").mkString(" ")
    val r = flags(prose)
    assert(r.getAs[Boolean]("pass"),
      s"prose should pass, got $r")
    assert(r.getAs[Long]("n_words") >= 50)
    assert(r.getAs[Long]("n_stop") >= 2)
  }

  test("gopher: word-count bounds") {
    val short = "the cat sat on that mat with joy"
    assert(!flags(short).getAs[Boolean]("flag_words")) // < 50 words
    assert(!flags(short).getAs[Boolean]("pass"))
  }

  test("gopher: mean word length out of [3, 10] fails") {
    val tiny = Seq.fill(60)("a b").mkString(" ") // mean length 1
    assert(!flags(tiny).getAs[Boolean]("flag_mean_len"))
    val huge = Seq.fill(60)("pneumonoultramicroscopics").mkString(" ")
    assert(!flags(huge).getAs[Boolean]("flag_mean_len"))
  }

  test("gopher: symbol-to-word ratio counts # and both ellipsis forms") {
    val hashy = Seq.fill(60)("word #").mkString(" ") // 60 '#' / 120 words
    val r = flags(hashy)
    assert(math.abs(r.getAs[Double]("symbol_ratio") - 0.5) < 1e-12)
    assert(!r.getAs[Boolean]("flag_symbol"))
    val dots = Seq.fill(60)("word now...").mkString(" ") // one "..." per 2
    assert(!flags(dots).getAs[Boolean]("flag_symbol"))
    val uni = Seq.fill(60)("word now…").mkString(" ")
    assert(!flags(uni).getAs[Boolean]("flag_symbol"))
  }

  test("gopher: alphabetic-word fraction") {
    val nums = (Seq.fill(30)("123 456") ++ Seq.fill(60)("word")).mkString(" ")
    val r = flags(nums) // 60 numeric / 120 words → 0.5 < 0.8
    assert(math.abs(r.getAs[Double]("alpha_frac") - 0.5) < 1e-12)
    assert(!r.getAs[Boolean]("flag_alpha"))
  }

  test("gopher: bullet and ellipsis line fractions on multi-line text") {
    val bullets = (Seq.fill(19)("• item one here") :+ "a closing line")
      .mkString("\n")
    val rb = flags(bullets) // 19/20 = 0.95 > 0.9
    assert(math.abs(rb.getAs[Double]("bullet_frac") - 0.95) < 1e-12)
    assert(!rb.getAs[Boolean]("flag_bullet"))

    val ells = (Seq.fill(2)("teaser text here...") :+ "one plain line")
      .mkString("\n")
    val re = flags(ells) // 2/3 > 0.3
    assert(re.getAs[Double]("ellipsis_frac") > 0.3)
    assert(!re.getAs[Boolean]("flag_ellipsis"))
  }

  test("gopher: distinct stop-word requirement") {
    val noStop = Seq.fill(60)("quick brown fox").mkString(" ")
    val r = flags(noStop)
    assert(r.getAs[Long]("n_stop") === 0L)
    assert(!r.getAs[Boolean]("flag_stop"))
    // repeated single stop word still counts once
    val oneStop = Seq.fill(60)("the fox").mkString(" ")
    assert(flags(oneStop).getAs[Long]("n_stop") === 1L)
  }

  private def clean(text: String, minWords: Int = 5, punct: Boolean = true,
      minSent: Int = 3): String =
    Seq(text).toDF("text")
      .select(TextAnalysis.c4Clean(col("text"), minWords, punct, minSent)
        .alias("c"))
      .head().getString(0)

  test("c4: keeps only terminal-punctuated lines of enough words") {
    val page = Seq(
      "This is a proper sentence with enough words here.",
      "short line.", // < 5 words → dropped
      "no terminal punctuation on this line at all", // dropped
      "Another good sentence follows right here now!",
      "And a third full sentence completes the page?").mkString("\n")
    val got = clean(page)
    assert(got === Seq(
      "This is a proper sentence with enough words here.",
      "Another good sentence follows right here now!",
      "And a third full sentence completes the page?").mkString("\n"))
  }

  test("c4: javascript lines drop; lorem ipsum and brace pages drop") {
    val js = Seq(
      "Please enable JavaScript to view this site.",
      "A real sentence stands alone here today.",
      "More real content continues in this line.",
      "Even more real content closes it out here.").mkString("\n")
    assert(!clean(js).toLowerCase.contains("javascript"))

    val lorem = "A fine page until lorem ipsum dolor sit amet arrives here.\n" +
      "Second sentence is fine.\nThird sentence is fine too."
    assert(clean(lorem) === "")

    val brace = "A config page { with code } inside it somehow appears.\n" +
      "Second sentence is fine.\nThird sentence is fine too."
    assert(clean(brace) === "")
  }

  test("c4: pages with fewer than minSentences kept sentence marks empty") {
    val thin = "Only one proper sentence survives this page today."
    assert(clean(thin) === "") // 1 sentence mark < 3
    assert(clean(thin, minSent = 1) === thin)
  }

  test("c4: untouched page passes through verbatim") {
    val page = Seq(
      "First full sentence with plenty of words here.",
      "Second full sentence with plenty of words too.",
      "Third full sentence rounds out the entire page.").mkString("\n")
    assert(clean(page) === page)
  }
}
