package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, UrlOps}
import graft.text.TextAnalysis
import graft.vector.KnnSearch

/** Edge-case pins for the round-9 operators: unicode normalization,
  * URL canonicalization/dedup, per-domain token-budget truncation,
  * hard-negative mining. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ normalizeText

  test("normalizeText: folding, stripping, collapsing, and totality on NULL") {
    val docs = Seq(
      (1L, "\u201Cquoted\u201D and \u2018single\u2019"),
      (2L, "a\u200Bb\u200Cc\u200Dd\uFEFFe"), // zero-width glued
      (3L, "tabs\t\tand   spaces"),
      (4L, "dash – and — here"),
      (5L, "  outer  \t "),
      (6L, null.asInstanceOf[String]),
      (7L, "line\nbreaks\nsurvive"),
      (8L, "already clean")).toDF("id", "text")
    val out = TextAnalysis.normalizeText(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(out(1L) == ("\"quoted\" and 'single'", true))
    assert(out(2L) == ("abcde", true))
    assert(out(3L) == ("tabs and spaces", true))
    assert(out(4L) == ("dash - and - here", true))
    assert(out(5L) == ("outer", true), "outer whitespace trims away")
    assert(out(6L) == ("", false), "NULL folds to '' and counts as unchanged")
    assert(out(7L) == ("line\nbreaks\nsurvive", false), "newlines are content")
    assert(out(8L) == ("already clean", false))
    // idempotence: a normalized corpus re-normalizes to itself
    val again = TextAnalysis.normalizeText(
      TextAnalysis.normalizeText(docs, "id", "text")
        .select(col("id"), col("text_norm").as("text")), "id", "text")
      .collect()
    assert(again.forall(!_.getBoolean(2)), "normalizeText must be idempotent")
  }

  // ------------------------------------------------------ URL dedup

  test("canonicalize: rule-by-rule pins") {
    val cases = Seq(
      // host+scheme lowercase, path case preserved
      ("HTTPS://WWW.Ex.COM/Page/One", "https://www.ex.com/Page/One"),
      // fragment drops
      ("https://ex.com/a#section-2", "https://ex.com/a"),
      // tracking params drop, survivors keep order
      ("https://ex.com/a?utm_source=x&id=3&gclid=9&b=2", "https://ex.com/a?id=3&b=2"),
      // all params stripped -> no '?'
      ("https://ex.com/a?utm_campaign=c&fbclid=z", "https://ex.com/a"),
      // trailing slash drops on non-root paths only
      ("https://ex.com/a/b/", "https://ex.com/a/b"),
      ("https://ex.com/", "https://ex.com/"),
      // PATHLESS urls: the host ends at the earliest of /, ?, # — a
      // fragment or query straight after the host must still drop
      ("https://ex.com#frag", "https://ex.com"),
      ("https://EX.com?utm_source=X", "https://ex.com"),
      ("https://ex.com?id=7&utm_source=x", "https://ex.com?id=7"),
      // schemeless input: UNCHANGED (no scheme ⇒ the host/path boundary
      // is ambiguous and path case is significant — r9 advice)
      ("Just-Text", "Just-Text"))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((raw, want), i) =>
      assert(got(i.toLong) == want, s"canonicalize($raw) = ${got(i.toLong)}, want $want")
    }
  }

  test("urlDedup: case/tracking/fragment variants collapse, min id survives") {
    val docs = Seq(
      (10L, "https://ex.com/p/1?utm_source=a"),
      (3L, "HTTPS://EX.com/p/1#frag"),
      (7L, "https://ex.com/p/1/"),
      (5L, "https://ex.com/p/2")).toDF("id", "url")
    val out = UrlOps.urlDedup(docs, "id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (3L, "https://ex.com/p/1"), (5L, "https://ex.com/p/2")))
  }

  // ------------------------------------------------------ tokenBudget

  test("tokenBudget: inclusive prefix rule, per-domain independence, monotone in budget") {
    val docs = Seq(
      (1L, "a b c", "x"), (2L, "d e", "x"), (3L, "f g h i", "x"),
      (4L, "j", "y"), (5L, null.asInstanceOf[String], "y")).toDF("id", "text", "dom")
    def kept(b: Long) = Curation.tokenBudget(docs, "id", "text", "dom", b)
      .where(col("keep")).collect().map(_.getLong(0)).toSet
    val all = Curation.tokenBudget(docs, "id", "text", "dom", 100L).collect()
    // totality: every doc reported, null text = 1 token ('' splits to [''])
    assert(all.length == 5)
    assert(all.find(_.getLong(0) == 5L).get.getInt(2) == 1)
    // per-domain cumulative totals are domain-local
    val cumByDom = all.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(3)).max).toMap
    assert(cumByDom("x") == 9L && cumByDom("y") == 2L)
    // budget 0 keeps nothing, a covering budget keeps everything
    assert(kept(0L).isEmpty)
    assert(kept(100L) == Set(1L, 2L, 3L, 4L, 5L))
    // monotone: a bigger budget keeps a superset (same content order)
    assert(kept(3L).subsetOf(kept(5L)) && kept(5L).subsetOf(kept(9L)))
    // deterministic under re-partitioning (content-addressed order)
    val repart = Curation.tokenBudget(docs.repartition(7), "id", "text", "dom", 5L)
      .where(col("keep")).collect().map(_.getLong(0)).toSet
    assert(repart == kept(5L))
  }

  // ------------------------------------------------- cross-doc span dedup

  test("repeatedSpans/stripRepeatedSpans: keep-first rule, overlap doom, short docs pass through") {
    val docs = Seq(
      (1L, "A. B. C. tail one"),        // first occurrence of (A,B,C)
      (2L, "head two. A. B. C"),        // duplicate at a different offset
      (3L, "A. B. C"),                  // duplicate, nothing else
      (4L, "unique. sentences. here"),  // unique span — untouched
      (5L, "too. short"),               // < 3 sentences — no spans
      (6L, null.asInstanceOf[String]))  // total on NULL
      .toDF("id", "text")
    val rep = graft.dedup.Dedup.repeatedSpans(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
    // (A,B,C) occurs in docs 1 (pos 1), 2 (pos 2), 3 (pos 1); doc 1 is
    // the lexicographically first and the only is_first
    assert(rep.toSet == Set((1L, 1, true), (2L, 2, false), (3L, 1, false)))
    val out = graft.dedup.Dedup.stripRepeatedSpans(docs, "id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((4L, 0L, "A. B. C. tail one")), "first occurrence keeps its text")
    assert(out(2L) == ((4L, 3L, "head two")))
    assert(out(3L) == ((3L, 3L, "")), "a doc that WAS the span empties out")
    assert(out(4L) == ((3L, 0L, "unique. sentences. here")))
    assert(out(5L) == ((2L, 0L, "too. short")), "short docs reconstruct unchanged")
    assert(out(6L) == ((0L, 0L, "")), "NULL text reports zero sentences")
  }

  test("stripRepeatedSpans: a first-occurrence sentence still drops under ANOTHER span's duplicate") {
    // doc 20 holds the first occurrence of (X,Y,Z) but its Y,Z,W tail
    // is a NON-first occurrence of (Y,Z,W) (first lives in doc 10) —
    // the overlap resolution dooms Y,Z,W in doc 20 while X survives
    val docs = Seq(
      (10L, "Y. Z. W"),
      (20L, "X. Y. Z. W"),
      (30L, "X. Y. Z. pad"))            // makes (X,Y,Z) duplicated too
      .toDF("id", "text")
    val out = graft.dedup.Dedup.stripRepeatedSpans(docs, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    // doc 20: (X,Y,Z) first occurrence is doc 20 pos 1 (doc 10 has no X)
    // but (Y,Z,W) first is doc 10 pos 1, so doc 20's pos-2 occurrence
    // dooms Y, Z, W — only X survives
    assert(out(20L) == ((3L, "X")), s"got ${out(20L)}")
    assert(out(10L) == ((0L, "Y. Z. W")), "doc 10 is (Y,Z,W)'s first occurrence")
    // doc 30's (X,Y,Z) at pos 1 is a non-first duplicate -> drops
    assert(out(30L) == ((3L, "pad")))
  }

  // ------------------------------------------------------ lexicalSpectrum

  test("lexicalSpectrum: exact counts on a known fixture") {
    val docs = Seq(
      (1L, "a a b c", "x"),
      (2L, "a d", "x"),
      (3L, "q q q", "y"),
      (4L, null.asInstanceOf[String], "y")).toDF("id", "text", "dom")
    val out = graft.ops.Curation.lexicalSpectrum(docs, "text", "dom")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // x: tokens a,a,b,c,a,d -> 6 tokens, 4 types (a:3,b:1,c:1,d:1),
    // 3 hapax, top type count 3
    assert(out("x") == ((6L, 4L, 3L, 3L)))
    // y: q,q,q -> 3 tokens, 1 type, 0 hapax, top 3 (NULL text adds nothing)
    assert(out("y") == ((3L, 1L, 0L, 3L)))
  }

  // ------------------------------------------------------ hardNegatives

  test("hardNegatives: never the anchor's own label, never self, null-safe labels") {
    val rnd = new scala.util.Random(3)
    val rows: Seq[(Long, Seq[Double], Option[Int])] = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()),
        if (i % 10 == 9) None else Some((i % 3).toInt)))
    val data = rows.toDF("vec_id", "vec", "label")
    val q = data.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlab"))
    val out = KnnSearch.hardNegatives(data, "vec_id", "vec", "label",
      q, "qid", "qvec", "qlab", "cosine", 5).collect()
    val labelOf = rows.map(r => r._1 -> r._3).toMap
    out.foreach { r =>
      val (qid, id) = (r.getLong(0), r.getLong(2))
      assert(id != qid, s"anchor $qid mined itself")
      assert(labelOf(id) != labelOf(qid),
        s"anchor $qid (label ${labelOf(qid)}) mined same-label $id")
    }
    // every anchor gets its k rows on this corpus, ranks contiguous
    out.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.length == 5)
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5))
    }
    // a NULL-label anchor excludes exactly the other NULL-label docs
    val qNull = data.where(col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlab"))
    val nullOut = KnnSearch.hardNegatives(data, "vec_id", "vec", "label",
      qNull, "qid", "qvec", "qlab", "cosine", 40).collect()
    assert(nullOut.map(_.getLong(2)).toSet ==
      rows.filter(_._3.isDefined).map(_._1).toSet,
      "NULL-label anchor must mine every labeled doc and no NULL-label doc")
  }
}
