package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.GraftClient

/** Round-4 regressions: incremental index maintenance on upsert.
  * Every maintained family (fulltext postings, LSH buckets, IVF cell
  * assignment) must serve results IDENTICAL to a from-scratch rebuild
  * on the post-upsert corpus, across repeated upserts and re-upserts
  * of the same ids (multi-segment ledger last-wins). */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  test("LSH index stays live across upsert; results equal a from-scratch rebuild") {
    val root = Files.createTempDirectory("graft-lshinc").toString
    val rnd = new scala.util.Random(17)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 150L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildLshIndex(nBits = 16, bands = 4)

    // a later batch: two NEW ids and one REPLACED id (9 moves far away)
    val moved: Seq[Double] = Seq.fill(8)(rnd.nextGaussian())
    coll.upsert(Seq(
      (200L, rows(9)._2), (201L, Seq.fill(8)(rnd.nextGaussian())), (9L, moved))
      .toDF("id", "vector"))
    assert(coll.describe.contains("index.lsh.nbits"), "upsert must keep the LSH index live")

    val q = Seq((0L, rows(9)._2)).toDF("qid", "qvec")
    val incremental = coll.searchLsh(q, "qid", "qvec", limit = 5).collect().toSeq
    // the new doc 200 carries doc 9's OLD vector — it must be findable,
    // and doc 9's STALE bucket rows must be masked by the ledger
    assert(incremental.head.getLong(2) == 200L)

    coll.rebuildLshIndex(nBits = 16, bands = 4)
    val rebuilt = coll.searchLsh(q, "qid", "qvec", limit = 5).collect().toSeq
    assert(incremental == rebuilt, "incremental LSH must equal a from-scratch rebuild")
  }

  test("a mutation failing mid-write drops every index instead of serving desynced state") {
    val root = Files.createTempDirectory("graft-failsafe").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("m")
    val rnd = new scala.util.Random(5)
    coll.upsert((0L until 40L).map(i =>
      (i, s"alpha beta doc$i", Seq.fill(6)(rnd.nextGaussian()))).toDF("id", "text", "vector"))
    coll.rebuildFulltextIndex()
    coll.rebuildLshIndex(nBits = 8, bands = 2)
    // the batch passes every NAME check but its vector column has the
    // wrong inner type — the failure only surfaces when the LSH encoder
    // executes, AFTER the fulltext segment + stats are already written
    val bad = Seq((100L, "gamma delta", Seq("not", "a", "vector")))
      .toDF("id", "text", "vector")
    intercept[Exception] { coll.upsert(bad) }
    val meta = coll.describe
    assert(!meta.contains("index.ft.text_col") && !meta.contains("index.lsh.nbits"),
      s"a failed mutation must invalidate the indexes it may have half-written, got $meta")
    // data is untouched and fulltext still answers (inline path)
    assert(coll.count() == 40)
    assert(coll.fulltext(Seq("alpha"), k = 3).count() == 3)
  }

  test("fulltext index across repeated upserts: re-upserted id serves newest segment only") {
    val root = Files.createTempDirectory("graft-ftinc").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq(
      (1L, "spark join fast spark"), (2L, "slow scan table"),
      (3L, "spark window agg")).toDF("id", "text"))
    coll.rebuildFulltextIndex()

    // segment 1: new doc + replace doc 1 (drops the word 'spark')
    coll.upsert(Seq((4L, "join planner"), (1L, "tuple relocation")).toDF("id", "text"))
    // segment 2: replace doc 1 AGAIN (re-adds 'spark' twice)
    coll.upsert(Seq((1L, "spark spark rises")).toDF("id", "text"))

    val inc = coll.fulltext(Seq("spark", "join"), k = 5).collect().toSeq
    coll.rebuildFulltextIndex()
    val rebuilt = coll.fulltext(Seq("spark", "join"), k = 5).collect().toSeq
    assert(inc == rebuilt, "multi-segment fulltext must equal a from-scratch rebuild")
    // doc 1 must rank by its NEWEST text (two 'spark' hits), not the
    // seg-0 or seg-1 versions
    assert(inc.exists(r => r.getLong(1) == 1L))
    assert(inc.filter(_.getLong(1) == 1L).head.getLong(2) == 1L, // n_terms: spark only
      s"doc 1 must match only 'spark' from its newest text, got $inc")
  }

  test("fulltext stats refresh on upsert: scores match rebuild exactly (df/avgdl drift)") {
    val root = Files.createTempDirectory("graft-ftstats").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert((1L to 20L).map(i =>
      (i, if (i % 3 == 0) s"alpha beta gamma doc$i" else s"delta epsilon doc$i words"))
      .toDF("id", "text"))
    coll.rebuildFulltextIndex()
    // the batch shifts df(alpha) and the corpus avgdl
    coll.upsert((21L to 30L).map(i => (i, s"alpha long doc$i with many extra words here"))
      .toDF("id", "text"))
    val inc = coll.fulltext(Seq("alpha", "delta"), k = 10).collect().toSeq
    coll.rebuildFulltextIndex()
    val rebuilt = coll.fulltext(Seq("alpha", "delta"), k = 10).collect().toSeq
    assert(inc == rebuilt, "BM25 scores after incremental upsert must be bit-identical")
  }

  test("IVF incremental assignment equals rebuild on unbucketed collection") {
    val root = Files.createTempDirectory("graft-ivfinc").toString
    val rnd = new scala.util.Random(5)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 200L).map(i => (i, Seq.fill(4)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIndex(nlist = 4)
    coll.upsert((300L until 320L).map(i => (i, Seq.fill(4)(rnd.nextGaussian())))
      .toDF("id", "vector"))
    assert(coll.describe.contains("index.ivf.nlist"), "upsert must keep the IVF index live")
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val inc = coll.search(q, "qid", "qvec", metric = "l2", limit = 5, nprobe = Some(4))
      .collect().toSeq
    val exact = coll.search(q, "qid", "qvec", metric = "l2", limit = 5).collect().toSeq
    assert(inc == exact, "nprobe=nlist after incremental assignment must equal exact")

    // delete and update keep the IVF layout too: the snapshot rewrite
    // re-assigns against the stored centroids
    coll.deleteByIds(Seq(rows(7)._1 + 0L))
    assert(coll.describe.contains("index.ivf.nlist"), "delete must keep IVF live")
    coll.updateByIds(Seq(301L), Map("vector" -> typedlit(Seq.fill(4)(0.25))))
    assert(coll.describe.contains("index.ivf.nlist"), "update must keep IVF live")
    val q2 = Seq((0L, Seq(0.25, 0.25, 0.25, 0.25))).toDF("qid", "qvec")
    val inc2 = coll.search(q2, "qid", "qvec", metric = "l2", limit = 5, nprobe = Some(4))
      .collect().toSeq
    val exact2 = coll.search(q2, "qid", "qvec", metric = "l2", limit = 5).collect().toSeq
    assert(inc2 == exact2 && inc2.head.getLong(2) == 301L)
    assert(!inc2.exists(_.getLong(2) == 7L), "deleted doc must not serve")
  }

  test("dedup signature indexes: persisted, served, incrementally maintained") {
    val root = Files.createTempDirectory("graft-ddidx").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    val base = "the quick brown fox jumps over the lazy dog again and again"
    coll.upsert(Seq(
      (1L, base), (2L, base), (3L, "completely different words entirely here now"))
      .toDF("id", "text"))
    coll.rebuildMinhashIndex()
    coll.rebuildSimhashIndex()

    val mh0 = coll.nearDupMinhash(threshold = 0.5).collect().toSeq
    assert(mh0.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    val sh0 = coll.nearDupSimhash(maxHamming = 3).collect().toSeq
    assert(sh0.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))

    // upsert: a new near-dup of doc 1 and a REPLACEMENT of doc 2 that is
    // no longer similar — the index must serve from the new segments
    coll.upsert(Seq(
      (4L, base), (2L, "now this text shares zero overlap whatsoever"))
      .toDF("id", "text"))
    assert(coll.describe.contains("index.mh.text_col") &&
      coll.describe.contains("index.sh.text_col"), "upsert must keep dedup indexes live")

    val mhInc = coll.nearDupMinhash(threshold = 0.5).collect().toSeq
    coll.rebuildMinhashIndex()
    val mhRebuilt = coll.nearDupMinhash(threshold = 0.5).collect().toSeq
    assert(mhInc == mhRebuilt, "incremental minhash must equal a from-scratch rebuild")
    assert(mhInc.exists(r => r.getLong(0) == 1L && r.getLong(1) == 4L))
    assert(!mhInc.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "replaced doc 2 must be served from its newest signature only")

    val shInc = coll.nearDupSimhash(maxHamming = 3).collect().toSeq
    coll.rebuildSimhashIndex()
    val shRebuilt = coll.nearDupSimhash(maxHamming = 3).collect().toSeq
    assert(shInc == shRebuilt, "incremental simhash must equal a from-scratch rebuild")
  }

  test("PQ index stays live across upsert: batch encoded against stored codebooks") {
    val root = Files.createTempDirectory("graft-pqinc").toString
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildPqIndex(m = 4, k = 16)

    // new docs + replace doc 42 with a far-away vector
    val moved: Seq[Double] = Seq.fill(16)(rnd.nextGaussian())
    coll.upsert(Seq((400L, rows(42)._2), (42L, moved)).toDF("id", "vector"))
    assert(coll.describe.contains("index.pq.m"), "upsert must keep the PQ index live")

    val q = Seq((0L, rows(42)._2)).toDF("qid", "qvec")
    val hits = coll.searchPq(q, "qid", "qvec", limit = 5).collect()
    // doc 400 now carries the query vector: ADC + exact rerank find it
    // first; doc 42's STALE code row is ledger-masked
    assert(hits.head.getLong(2) == 400L)
    // codebooks unchanged => incremental result equals a fresh encode
    coll.rebuildPqIndex(m = 4, k = 16)
    val rebuilt = coll.searchPq(q, "qid", "qvec", limit = 5).collect()
    assert(hits.map(_.getLong(2)).toSeq == rebuilt.map(_.getLong(2)).toSeq)
  }

  test("IVF_PQ index stays live across upsert: cells + codes from stored artifacts") {
    val root = Files.createTempDirectory("graft-ivfpqinc").toString
    val rnd = new scala.util.Random(29)
    val rows: Seq[(Long, Seq[Double])] =
      (0L until 300L).map(i => (i, Seq.fill(16)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIvfPqIndex(nlist = 4, m = 4, k = 16)

    coll.upsert(Seq((500L, rows(7)._2)).toDF("id", "vector"))
    assert(coll.describe.contains("index.ivfpq.nlist"),
      "upsert must keep the IVF_PQ index live")
    val q = Seq((0L, rows(7)._2)).toDF("qid", "qvec")
    val hits = coll.searchIvfPq(q, "qid", "qvec", limit = 5, nprobe = 4).collect()
    val ids = hits.map(_.getLong(2)).toSet
    assert(ids.contains(500L) && ids.contains(7L),
      s"both copies of the query vector must be found, got $ids")
  }

  test("compactIndexes folds segments into one base and retires the ledger") {
    val root = Files.createTempDirectory("graft-compact").toString
    val client = new GraftClient(spark, root)
    val db = client.createDatabase("db")
    val coll = db.createCollection("t")
    coll.upsert(Seq(
      (1L, "spark join fast"), (2L, "slow scan table"), (3L, "spark window agg"))
      .toDF("id", "text"))
    coll.rebuildFulltextIndex()
    coll.rebuildMinhashIndex()
    // two mutation segments + a replaced doc
    coll.upsert(Seq((4L, "spark planner"), (1L, "no keywords now")).toDF("id", "text"))
    coll.upsert(Seq((5L, "spark rises"), (1L, "spark is back")).toDF("id", "text"))
    assert(db.listCollections().contains("t__mut_ledger"))
    val before = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
    val mhBefore = coll.nearDupMinhash(threshold = 0.3).collect().toSeq

    coll.compactIndexes()
    assert(!db.listCollections().contains("t__mut_ledger"), "ledger must retire")
    val after = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
    assert(after == before, "compaction must not change fulltext results")
    assert(coll.nearDupMinhash(threshold = 0.3).collect().toSeq == mhBefore)

    // post-compaction upserts start a fresh history and still serve
    coll.upsert(Seq((6L, "spark again")).toDF("id", "text"))
    val ids = coll.fulltext(Seq("spark"), k = 6).collect().map(_.getLong(1)).toSet
    assert(ids == Set(1L, 3L, 4L, 5L, 6L))
    coll.rebuildFulltextIndex()
    assert(coll.fulltext(Seq("spark"), k = 6).collect().map(_.getLong(1)).toSet == ids)
  }

  test("a rejected batch leaves index state untouched and serving") {
    val root = Files.createTempDirectory("graft-atomic").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "spark join fast"), (2L, "slow scan")).toDF("id", "text"))
    coll.rebuildFulltextIndex()
    val before = coll.fulltext(Seq("spark"), k = 5).collect().toSeq

    // batch missing the indexed text column: must fail BEFORE any
    // artifact/stats/ledger write
    intercept[IllegalArgumentException](
      coll.upsert(Seq((3L, 99)).toDF("id", "other")))
    assert(coll.describe.contains("index.ft.text_col"))
    assert(coll.fulltext(Seq("spark"), k = 5).collect().toSeq == before,
      "a rejected batch must not change index contents or stats")
    assert(coll.count() == 2)
    // and the next valid upsert proceeds normally (seg numbering intact)
    coll.upsert(Seq((3L, "spark works")).toDF("id", "text"))
    val after = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
    coll.rebuildFulltextIndex()
    assert(coll.fulltext(Seq("spark"), k = 5).collect().toSeq == after)
  }

  test("duplicate ids within one batch stay consistent between data and index") {
    val root = Files.createTempDirectory("graft-dupids").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text"))
    coll.rebuildFulltextIndex()
    // id 3 appears twice with different texts: exactly ONE version may
    // exist, and the index must agree with the data on which
    coll.upsert(Seq((3L, "alpha rocket"), (3L, "gamma rocket")).toDF("id", "text"))
    assert(coll.count() == 3)
    val stored = coll.queryByIds(Seq(3L)).head().getString(1)
    val hits = coll.fulltext(Seq("alpha", "gamma"), k = 5).collect()
      .filter(_.getLong(1) == 3L)
    assert(hits.length == 1)
    assert(hits.head.getLong(2) == 1L, // n_terms: exactly one of alpha|gamma
      s"index must hold ONE version of doc 3 (stored text: '$stored')")
    // and that version is the stored one
    val term = if (stored.startsWith("alpha")) "alpha" else "gamma"
    assert(coll.fulltext(Seq(term), k = 5).collect().exists(_.getLong(1) == 3L))
  }

  test("update keeps segment indexes live: post-image rows re-index, results equal rebuild") {
    val root = Files.createTempDirectory("graft-updlive").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq(
      (1L, "spark join fast", "a"), (2L, "slow scan table", "b"),
      (3L, "spark window agg", "a")).toDF("id", "text", "tag"))
    coll.rebuildFulltextIndex()

    // metadata-only update: text unchanged, postings re-added identically
    coll.updateByIds(Seq(1L), Map("tag" -> lit("z")))
    assert(coll.describe.contains("index.ft.text_col"),
      "update must keep the fulltext index live")
    // text update by FILTER: the post-image rows re-index, ledger masks old
    coll.update("""tag = "b"""", Map("text" -> lit("spark replaces scan")))
    val served = coll.fulltext(Seq("spark", "scan"), k = 5).collect().toSeq
    assert(served.filter(_.getLong(1) == 2L).head.getLong(2) == 2L,
      s"doc 2 must match spark AND scan from its updated text, got $served")
    coll.rebuildFulltextIndex()
    val rebuilt = coll.fulltext(Seq("spark", "scan"), k = 5).collect().toSeq
    assert(served == rebuilt, "incremental update must equal a from-scratch rebuild")
  }

  test("update and delete keep LSH and minhash indexes rebuild-identical") {
    val root = Files.createTempDirectory("graft-mutfam").toString
    val rnd = new scala.util.Random(41)
    val rows = (0L until 120L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian()), s"document number $i with shared words " * 2))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector", "text"))
    coll.rebuildLshIndex(nBits = 16, bands = 4)
    coll.rebuildMinhashIndex()

    // update moves doc 9's vector and rewrites doc 10's text
    coll.updateByIds(Seq(9L), Map("vector" -> typedlit(rows(3)._2)))
    coll.updateByIds(Seq(10L), Map("text" -> lit(rows(3)._3)))
    // delete a doc covered by both indexes
    coll.deleteByIds(Seq(5L))
    assert(coll.describe.contains("index.lsh.nbits") &&
      coll.describe.contains("index.mh.text_col"))

    val q = Seq((0L, rows(3)._2)).toDF("qid", "qvec")
    val lshInc = coll.searchLsh(q, "qid", "qvec", limit = 6).collect().toSeq
    val mhInc = coll.nearDupMinhash(threshold = 0.5).collect().toSeq
    assert(lshInc.exists(_.getLong(2) == 9L), "updated vector must serve from LSH")
    assert(mhInc.exists(r => r.getLong(0) == 3L && r.getLong(1) == 10L),
      s"updated text must near-dup match, got $mhInc")
    assert(!lshInc.exists(_.getLong(2) == 5L) &&
      !mhInc.exists(r => r.getLong(0) == 5L || r.getLong(1) == 5L))

    coll.rebuildLshIndex(nBits = 16, bands = 4)
    coll.rebuildMinhashIndex()
    assert(coll.searchLsh(q, "qid", "qvec", limit = 6).collect().toSeq == lshInc)
    assert(coll.nearDupMinhash(threshold = 0.5).collect().toSeq == mhInc)
  }

  test("primary-key hygiene: id rewrites and null ids are rejected") {
    val root = Files.createTempDirectory("graft-pkhyg").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "alpha")).toDF("id", "text"))
    intercept[IllegalArgumentException](
      coll.updateByIds(Seq(1L), Map("id" -> lit(99L))))
    intercept[IllegalArgumentException](
      coll.update("id = 1", Map("id" -> lit(99L))))
    intercept[IllegalArgumentException](
      coll.upsert(Seq((Some(2L), "beta"), (None, "gamma"))
        .toDF("id", "text")))
    assert(coll.count() == 1)
  }

  test("incremental fulltext maintenance works with string document ids") {
    val root = Files.createTempDirectory("graft-ftstr").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq(("doc-a", "spark join fast"), ("doc-b", "slow scan table"))
      .toDF("id", "text"))
    coll.rebuildFulltextIndex()
    coll.upsert(Seq(("doc-c", "spark lands"), ("doc-a", "rewritten entirely"))
      .toDF("id", "text"))
    val inc = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
    assert(inc.map(_.getString(1)).toSet == Set("doc-c"),
      s"string-id ledger masking must serve newest segments, got $inc")
    coll.rebuildFulltextIndex()
    assert(coll.fulltext(Seq("spark"), k = 5).collect().toSeq == inc)
  }

  test("delete keeps segment indexes live via ledger tombstones; results equal rebuild") {
    val root = Files.createTempDirectory("graft-deltomb").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq(
      (1L, "alpha beta"), (2L, "beta gamma"), (3L, "alpha delta"), (4L, "alpha echo"))
      .toDF("id", "text"))
    coll.rebuildFulltextIndex()
    coll.upsert(Seq((5L, "alpha fresh")).toDF("id", "text")) // live segment 1

    coll.deleteByIds(Seq(1L, 5L)) // one base-seg doc + one upserted doc
    assert(coll.describe.contains("index.ft.text_col"),
      "delete must keep the fulltext index live (tombstone masking)")
    val served = coll.fulltext(Seq("alpha", "beta"), k = 5).collect().toSeq
    assert(!served.exists(r => r.getLong(1) == 1L || r.getLong(1) == 5L),
      s"deleted docs must not serve, got $served")
    coll.rebuildFulltextIndex()
    val rebuilt = coll.fulltext(Seq("alpha", "beta"), k = 5).collect().toSeq
    assert(served == rebuilt,
      "tombstoned serving must be bit-identical to a rebuild (stats delta included)")

    // filter-delete takes the same path
    coll.delete(filter = "id = 3")
    assert(coll.describe.contains("index.ft.text_col"))
    assert(!coll.fulltext(Seq("alpha"), k = 5).collect().exists(_.getLong(1) == 3L))
    // truncate still invalidates everything
    coll.truncate()
    assert(!coll.describe.contains("index.ft.text_col"))
  }

  test("a batch missing a NON-indexed stored column is rejected before any index write") {
    val root = Files.createTempDirectory("graft-cover").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "spark join fast", "a")).toDF("id", "text", "tag"))
    coll.rebuildFulltextIndex()
    val before = coll.fulltext(Seq("spark"), k = 5).collect().toSeq

    // carries the indexed text column but not the stored 'tag' column:
    // the merge cannot complete, so NOTHING may be written first
    intercept[IllegalArgumentException](
      coll.upsert(Seq((2L, "sneaky spark doc")).toDF("id", "text")))
    assert(coll.count() == 1)
    val served = coll.fulltext(Seq("spark"), k = 5).collect().toSeq
    assert(served == before, "rejected batch must leave postings and stats untouched")
    coll.rebuildFulltextIndex()
    assert(coll.fulltext(Seq("spark"), k = 5).collect().toSeq == before,
      "serving state must still equal a from-scratch rebuild")
  }

  test("schema hygiene: extra upsert columns, unknown update keys, reserved names rejected") {
    val root = Files.createTempDirectory("graft-schemahyg").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    // reserved internal prefix is rejected at first write
    intercept[IllegalArgumentException](
      coll.upsert(Seq((1L, "x", 0)).toDF("id", "text", "__cell")))
    coll.upsert(Seq((1L, "alpha")).toDF("id", "text"))
    // a column the stored schema lacks would be silently dropped by the
    // merge projection — rejected instead
    intercept[IllegalArgumentException](
      coll.upsert(Seq((2L, "beta", 7)).toDF("id", "text", "extra")))
    assert(coll.count() == 1)
    // a typo'd update key would be a silent no-op — rejected
    intercept[IllegalArgumentException](
      coll.update("id = 1", Map("txet" -> lit("oops"))))
    intercept[IllegalArgumentException](
      coll.updateByIds(Seq(1L), Map("__embed" -> lit("oops"))))
    assert(coll.queryByIds(Seq(1L)).head().getString(1) == "alpha")
  }

  test("deleteByIds rejects null ids (a null IN-list would drop every row)") {
    val root = Files.createTempDirectory("graft-delnull").toString
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("t")
    coll.upsert(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text"))
    intercept[IllegalArgumentException](coll.deleteByIds(Seq(2L, null)))
    assert(coll.count() == 3, "a rejected delete must not touch the data")
  }

  test("delete-all then upsert restores the live-IVF cell layout") {
    val root = Files.createTempDirectory("graft-ivfempty").toString
    val rnd = new scala.util.Random(23)
    val rows = (0L until 40L).map(i => (i, Seq.fill(4)(rnd.nextGaussian())))
    val coll = new GraftClient(spark, root).createDatabase("db").createCollection("v")
    coll.upsert(rows.toDF("id", "vector"))
    coll.rebuildIndex(nlist = 2)

    coll.deleteByIds(rows.map(_._1)) // empty the collection, index meta kept
    assert(coll.count() == 0)
    coll.upsert(rows.take(10).toDF("id", "vector"))
    assert(coll.describe.contains("index.ivf.nlist"),
      "upsert into the emptied collection must keep the IVF index")
    // describe() advertises IVF, so the data MUST be back in the
    // cell-partitioned layout nprobe pruning reads
    val dataDir = java.nio.file.Paths.get(root, "db", "v", "data")
    val cellDirs = Files.list(dataDir).filter(p =>
      p.getFileName.toString.startsWith("__cell=")).count()
    assert(cellDirs > 0, "fresh write with live IVF must restore the __cell layout")
    val q = Seq((0L, rows(3)._2)).toDF("qid", "qvec")
    val ivf = coll.search(q, "qid", "qvec", limit = 3, nprobe = Some(2)).collect().toSeq
    // the exact side ranks in the index's STORED metric (l2 — the r10
    // stored-metric rule for every index-served route)
    assert(ivf == coll.search(q, "qid", "qvec", metric = "l2", limit = 3).collect().toSeq,
      "nprobe = nlist must equal the exact scan on the re-filled collection")
  }
}
