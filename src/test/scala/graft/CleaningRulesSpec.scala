package graft

import org.apache.spark.sql.Row

import graft.text.TextAnalysis

/** C4 line rules + Gopher document rules (q_c4_filter /
  * q_gopher_rules): the oracle equality pins engine agreement; these
  * pin each RULE at its boundary.
  */
class CleaningRulesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def c4(text: String): Row =
    TextAnalysis.c4Clean(docs(0L -> text), "doc_id", "text").collect().head

  private def gopher(text: String): Row =
    TextAnalysis.gopherRules(docs(0L -> text), "doc_id", "text").collect().head

  test("c4: a line survives only with terminal punctuation AND enough words") {
    val r = c4(Seq(
      "one two three four five.",   // kept
      "one two three four five",    // no terminal mark
      "too short.",                 // < 5 words
      "does it work with marks?",   // kept (question mark)
      "\"a quoted five word line.\"").mkString("\n")) // kept (quote)
    assert(r.getAs[Int]("n_lines") === 5)
    assert(r.getAs[Int]("n_lines_kept") === 3)
    assert(r.getAs[String]("text_clean").split("\n").length === 3)
  }

  test("c4: lorem ipsum and curly braces kill the page regardless of lines") {
    val good = "one two three four five. six seven eight nine ten. " +
      "eleven twelve thirteen fourteen fifteen."
    assert(c4(good).getAs[Boolean]("keep"))
    assert(!c4(good + "\nsee lorem ipsum here.").getAs[Boolean]("keep"))
    assert(!c4(good + "\ntemplate { residue } here.").getAs[Boolean]("keep"))
    // either bracket alone is code residue (Raffel et al.: any curly)
    assert(!c4(good + "\nend of function } here.").getAs[Boolean]("keep"))
  }

  test("c4: the sentence floor counts the KEPT text only") {
    // three sentences exist on the page, but two sit on dropped lines
    val r = c4(Seq(
      "one two three four five.",
      "short. lines",
      "also. dropped").mkString("\n"))
    assert(r.getAs[Int]("n_sentences") === 1)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("c4: empty page degenerates to empty clean text, keep false") {
    val r = c4("")
    assert(r.getAs[String]("text_clean") === "")
    assert(r.getAs[Int]("n_lines_kept") === 0)
    assert(!r.getAs[Boolean]("keep"))
  }

  private val passing: String =
    (Seq.fill(13)("the jolly weather holds") :+ "and that have with").mkString(" ")

  test("gopher: the passing document passes, and each rule flips it alone") {
    assert(gopher(passing).getAs[Boolean]("keep"), gopher(passing).toString)
    // word-count floor
    assert(!gopher("the and that have with").getAs[Boolean]("keep"))
    // stopword probe: strip the planted stopwords
    val noStops = Seq.fill(20)("jolly weather holds firm").mkString(" ")
    val r = gopher(noStops)
    assert(r.getAs[Int]("stop_hits") === 0 && !r.getAs[Boolean]("keep"))
    // symbol ratio: a hash run on a passing doc
    assert(!gopher(passing + (" #" * 20)).getAs[Boolean]("keep"))
    // mean word length: short-word spam
    val shorts = (Seq.fill(60)("a b") :+ "the and that").mkString(" ")
    assert(gopher(shorts).getAs[Double]("mean_word_len") < 3.0)
    assert(!gopher(shorts).getAs[Boolean]("keep"))
    // ellipsis lines over 30%
    val dots = passing + "\nso it trails...\nand again...\nonce more..."
    assert(gopher(dots).getAs[Double]("ellipsis_ratio") > 0.3)
    assert(!gopher(dots).getAs[Boolean]("keep"))
    // the unicode ellipsis counts as a symbol, same as the ASCII one
    val uniDots = passing + (" …" * 20)
    assert(gopher(uniDots).getAs[Double]("symbol_ratio") > 0.1)
    assert(!gopher(uniDots).getAs[Boolean]("keep"))
  }

  test("gopher: token-less document reports zero ratios, keep false (not null)") {
    val r = gopher("")
    assert(r.getAs[Long]("n_words") === 0 || r.getAs[Int]("n_words") === 0)
    assert(r.getAs[Double]("mean_word_len") === 0.0)
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(!r.isNullAt(r.fieldIndex("keep")) && !r.getAs[Boolean]("keep"))
  }

  test("gopher: bullet-dominated pages fail the 90% line rule") {
    val bullets = (passing +: Seq.fill(30)("- a bullet list item")).mkString("\n")
    val r = gopher(bullets)
    assert(r.getAs[Double]("bullet_ratio") > 0.9)
    assert(!r.getAs[Boolean]("keep"))
  }
}
