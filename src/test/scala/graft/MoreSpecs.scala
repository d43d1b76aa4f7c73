package graft

import org.apache.spark.sql.functions._

import graft.hybrid.Fusion
import graft.multimodal.Multimodal
import graft.sparse.Bm25
import graft.text.TextEmbed

class SqlExtensionSpec extends SparkSpec {
  test("vec_* functions are registered for SQL users") {
    val row = spark.sql(
      """SELECT vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       vec_ip(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS i,
        |       vec_l2(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l""".stripMargin).head()
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 11.0 && row.getDouble(2) == 5.0)
  }

  test("topk aggregate is registered for SQL users") {
    val out = spark.sql(
      """SELECT g, topk(s, id, 2, false) AS t FROM VALUES
        |  (1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.7D, 12L), (2, 0.1D, 20L)
        |  AS v(g, s, id) GROUP BY g ORDER BY g""".stripMargin).collect()
    val t1 = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(t1.map(_.getLong(1)) == Seq(11L, 12L))
    assert(out(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(20L))
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")
  ).toDF("doc_id", "text")

  test("encode produces one row per (doc, term) with idf-downweighted common terms") {
    val enc = Bm25.encode(docs, "doc_id", "text").cache()
    assert(enc.count() == 6) // distinct (doc,term) pairs
    val w = enc.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // 'apple' (df=1) in doc1 should outweigh 'banana' (df=2) in doc1
    assert(w((1L, "apple")) > w((1L, "banana")))
    // tf=2 of apple beats tf=1 cherry in doc2's banana... same doc comparisons only
    assert(w((3L, "cherry")) > w((3L, "date")) * 0.5)
  }

  test("fulltext ranks the doc with more matching terms first") {
    val res = Bm25.fulltext(docs, "doc_id", "text", Seq("apple", "banana"), 10)
      .collect()
    assert(res.head.getLong(1) == 1L) // doc1 matches both terms
    assert(res.map(_.getLong(1)).toSet == Set(1L, 2L))
  }

  test("cutoff_frequency drops ubiquitous terms") {
    val res = Bm25.fulltext(docs, "doc_id", "text", Seq("cherry"), 10,
      cutoffFrequency = 0.5) // cherry df=2/3 > 0.5 -> dropped
    assert(res.count() == 0)
  }

  test("docFilter restricts BEFORE ranking: contiguous ranks, no truncation loss") {
    // 30 docs all matching "zzz"; k = 5 would truncate to ids 1..5
    // before a post-filter — the docFilter path must instead rank the
    // FILTERED set, returning ids 25..29 at contiguous ranks 1..5
    val many = (1L to 30L).map(i => (i, s"zzz w$i")).toDF("doc_id", "text")
    val keep = Seq.range(25L, 31L).toDF("doc_id")
    val res = Bm25.fulltext(many, "doc_id", "text", Seq("zzz"), 5,
        docFilter = Some(keep)).collect()
    assert(res.map(_.getLong(1)).toSet == Set(25L, 26L, 27L, 28L, 29L),
      s"got ${res.map(_.getLong(1)).toSeq}")
    assert(res.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4, 5),
      "filtered ranks must be contiguous from 1")
    // batch form: same pre-ranking filter per query
    val idx = Bm25.buildIndex(many, "doc_id", "text")
    val kw = Seq((7L, "zzz")).toDF("query_id", "term")
    val b = Bm25.fulltextBatch(idx, kw, 5, docFilter = Some(keep)).collect()
    assert(b.map(_.getLong(2)).toSet == Set(25L, 26L, 27L, 28L, 29L))
  }
}

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fuses two ranked lists with k=60") {
    val a = Seq((1L, 100L, 1), (1L, 101L, 2)).toDF("q", "id", "rank")
    val b = Seq((1L, 101L, 1), (1L, 102L, 2)).toDF("q", "id", "rank")
    val out = Fusion.rrf(Seq(a, b), Seq("q"), "id", "rank", k = 60, topN = 10).collect()
    // 101 appears in both lists -> highest rrf
    assert(out.head.getLong(2) == 101L)
    val expected = BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(out.head.getDouble(3)) == expected)
  }

  test("weighted fusion respects weights") {
    val dense = Seq((1L, 100L, 1.0), (1L, 101L, 0.5)).toDF("q", "id", "score")
    val sparse = Seq((1L, 101L, 1.0)).toDF("q", "id", "score")
    val out = Fusion.weighted(Seq((dense, 0.9), (sparse, 0.1)), Seq("q"), "id", "score", 10)
      .collect()
    assert(out.head.getLong(2) == 100L) // 0.9 > 0.45+0.1
    assert(math.abs(out(1).getDouble(3) - 0.55) < 1e-9)
  }
}

class TextEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("hash embeddings are unit-normalized and deterministic") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta")).toDF("id", "text")
    val v = TextEmbed.hashEmbed(docs, "id", "text").orderBy("id")
      .select("vec").as[Seq[Double]].collect()
    assert(v(0) == v(1)) // same text, same vector
    assert(math.abs(v(0).map(x => x * x).sum - 1.0) < 1e-9)
    assert(v(0) != v(2))
  }

  test("search_by_text ranks the identical doc first") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta")).toDF("doc_id", "text")
    val res = TextEmbed.searchByText(docs, "doc_id", "text", Seq("alpha beta gamma"), k = 2)
      .collect()
    assert(res.head.getLong(2) == 1L && res.head.getDouble(3) == 1.0)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("pack + extract round-trips deterministic features") {
    val docs = Seq((1L, "hello", "png"), (2L, "", "jpg")).toDF("doc_id", "text", "source")
    val out = Multimodal.extractFeatures(
      Multimodal.pack(docs, "doc_id", "text", "source")).collect().sortBy(_.doc_id)
    assert(out(0).n_bytes == 5)
    assert(out(0).checksum == "hello".getBytes("UTF-8").map(_ & 0xFF).sum)
    assert(out(0).feature(0) == 'h'.toInt / 255.0)
    assert(out(1).n_bytes == 0 && out(1).checksum == 0L)
    assert(out(1).feature.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  /** The planted-pixel formulas, host-side (the oracle's spelling). */
  private def chan(id: Long, f: Long, x: Long, y: Long): (Long, Long, Long) = (
    (id * 31 + f * 101 + x * 7 + y * 13) % 256,
    (id * 17 + f * 101 + x * 5 + y * 11) % 256,
    (id * 23 + f * 101 + x * 3 + y * 19) % 256)

  test("real PNG decode: planted image round-trips integer-exactly through the codec") {
    val docs = Seq((0L, "x"), (1L, "x"), (7L, "x"), (1000003L, "x"))
      .toDF("doc_id", "text")
    val media = Multimodal.plantPng(docs, "doc_id")
    // the payload is a REAL png (magic bytes), not a synthetic blob
    val raw = media.collect().sortBy(_.doc_id)
    assert(raw.forall(m => (m.payload(1) & 0xff) == 'P'.toInt &&
      (m.payload(2) & 0xff) == 'N'.toInt && (m.payload(3) & 0xff) == 'G'.toInt))
    val got = Multimodal.decodeImageStats(media).collect().sortBy(_.doc_id)
    got.foreach { s =>
      val w = 8 + (s.doc_id % 4) * 4; val h = 6 + (s.doc_id % 3) * 4
      assert(s.width == w && s.height == h && s.n_pixels == w * h)
      val exp = (for (y <- 0L until h; x <- 0L until w) yield chan(s.doc_id, 0, x, y))
      assert(s.sum_r == exp.map(_._1).sum && s.sum_g == exp.map(_._2).sum &&
        s.sum_b == exp.map(_._3).sum,
        s"decoded pixel sums must equal the planted formula for doc ${s.doc_id}")
    }
  }

  test("real resize: nearest-neighbor resample through two codec passes matches the integer formula") {
    val docs = Seq((3L, "x"), (5L, "x")).toDF("doc_id", "text")
    val out = Multimodal.decodeImageStats(
      Multimodal.resizeNearest(Multimodal.plantPng(docs, "doc_id"), 10, 7))
      .collect().sortBy(_.doc_id)
    out.foreach { s =>
      assert(s.width == 10 && s.height == 7 && s.n_pixels == 70)
      val w = 8 + (s.doc_id % 4) * 4; val h = 6 + (s.doc_id % 3) * 4
      val exp = (for (y <- 0L until 7; x <- 0L until 10)
        yield chan(s.doc_id, 0, x * w / 10, y * h / 7))
      assert(s.sum_r == exp.map(_._1).sum && s.sum_b == exp.map(_._3).sum)
    }
  }

  test("real WAV decode: planted PCM16 round-trips integer-exactly through AudioSystem") {
    val docs = Seq((0L, "x"), (3L, "x"), (7L, "x"), (1000001L, "x"))
      .toDF("doc_id", "text")
    val media = Multimodal.plantWav(docs, "doc_id")
    // the payload is a REAL RIFF/WAVE container, not a synthetic blob
    val raw = media.collect()
    assert(raw.forall(m => new String(m.payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(m.payload, 8, 4, "US-ASCII") == "WAVE"))
    val got = Multimodal.decodeWavStats(media).collect().sortBy(_.doc_id)
    got.foreach { s =>
      val n = 50 + (s.doc_id % 5) * 25
      assert(s.n_samples == n && s.sample_rate == 8000)
      val vals = (0L until n).map(i => ((s.doc_id * 37 + i * 17) % 4096) - 2048)
      assert(s.sum_amp == vals.sum && s.sum_abs == vals.map(math.abs).sum,
        s"decoded sample sums must equal the planted formula for doc ${s.doc_id}")
    }
  }

  test("real frame sampling: stacked-PNG bands slice to per-frame sums under the everyN/maxFrames contract") {
    val docs = Seq((0L, "x"), (1L, "x"), (2L, "x")).toDF("doc_id", "text")
    val got = Multimodal.frameStats(
        Multimodal.plantFramePng(docs, "doc_id"), everyN = 2, maxFrames = 8)
      .collect().groupBy(_.doc_id)
    // frames = 2 + id%3: id 0 → {0}; id 1 (3 frames) → {0,2}; id 2 (4) → {0,2}
    assert(got(0L).map(_.frame_idx).sorted.toSeq == Seq(0))
    assert(got(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(got(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    got.values.flatten.foreach { fs =>
      val exp = (for (y <- 0L until 8; x <- 0L until 12)
        yield chan(fs.doc_id, fs.frame_idx, x, y))
      assert(fs.sum_r == exp.map(_._1).sum && fs.sum_g == exp.map(_._2).sum &&
        fs.sum_b == exp.map(_._3).sum)
    }
    // maxFrames caps the fan-out: everyN=1, maxFrames=2 on a 4-frame doc
    val capped = Multimodal.frameStats(
        Multimodal.plantFramePng(Seq((2L, "x")).toDF("doc_id", "text"), "doc_id"),
        everyN = 1, maxFrames = 2)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(capped == Seq(0, 1))
  }
}
