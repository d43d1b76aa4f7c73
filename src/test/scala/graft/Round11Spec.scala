package graft

import org.apache.spark.sql.functions._

import graft.text.TextEmbed

/** Round-11 pins: the maxVocab-capped Word2Vec trainer (the r10
  * `weak` row — an uncapped vocabulary is corpus-unbounded at 100 TB
  * and MLlib's vocab build is driver-side), the un-hinted serving
  * join, PBKDF2 password storage with legacy-record upgrade, the
  * filesystem-enforced concurrent-create guard (createLink, not
  * ATOMIC_MOVE — Linux rename(2) silently replaces), and the
  * searchByText fallback's null-vec symmetry. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------- capped w2v vocabulary

  test("trainWord2VecVocab(maxVocab): top-K types by frequency; capped-out words are OOV") {
    // frequencies: aa×12, bb×8, cc×3, dd×2 — cap=2 keeps {aa, bb}
    val docs = Seq(
      "aa bb aa cc", "aa bb aa dd", "aa bb aa cc", "aa bb aa dd",
      "aa bb aa cc", "aa bb aa", "bb bb").toDF("text")
    val vocab = TextEmbed.trainWord2VecVocab(docs, "text", dim = 8,
      minCount = 1, maxVocab = 2)
    val words = vocab.select("word").collect().map(_.getString(0)).toSet
    assert(words == Set("aa", "bb"),
      s"cap=2 must keep the top-2 types by corpus frequency, got $words")
    // serving through the capped artifact: a doc of only capped-out
    // words embeds to NULL (OOV totality — the row keeps its id), a
    // mixed doc embeds through its in-vocab words only
    val out = TextEmbed.embedWithVocab(
        Seq((1L, "cc dd cc"), (2L, "aa cc")).toDF("id", "text"),
        "id", "text", vocab)
      .collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(out(1L), "all-capped-out doc must keep its row with a null vec")
    assert(!out(2L), "a doc with one in-vocab word must embed")
    // cap=0 disables: all 4 types survive (minCount=1)
    val full = TextEmbed.trainWord2VecVocab(docs, "text", dim = 8,
      minCount = 1, maxVocab = 0)
    assert(full.count() == 4)
  }

  test("trainWord2VecVocab(maxVocab): frequency ties break by word; cap above type count is a no-op") {
    val docs = Seq("xx yy", "yy xx", "zz xx yy").toDF("text")
    // xx×3 yy×3 zz×1: cap=1 must pick xx (tie on 3 broken by word asc)
    val one = TextEmbed.trainWord2VecVocab(docs, "text", dim = 4,
      minCount = 1, maxVocab = 1)
    assert(one.select("word").collect().map(_.getString(0)).toSeq == Seq("xx"))
    val wide = TextEmbed.trainWord2VecVocab(docs, "text", dim = 4,
      minCount = 1, maxVocab = 100)
    assert(wide.count() == 3, "a cap above the type count keeps every type")
  }

  test("trainTextEmbedding(maxVocab) end-to-end: capped collection still serves searchByText") {
    val root = java.nio.file.Files.createTempDirectory("graft-r11-w2vcap").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("docs",
        Map("embedding.text_field" -> "text", "embedding.dim" -> "8"))
    coll.upsert(Seq(
      (1L, "apple fruit sweet pie"), (2L, "apple fruit sweet pie"),
      (3L, "zebra stripes zebra stripes"), (4L, "apple fruit pie sweet"),
      (5L, "qq1 qq2")).toDF("id", "text"))
    // cap the vocab BELOW the distinct-type count so the OOV path is
    // exercised on stored docs: every non-doc-5 type appears ≥2 times,
    // qq1/qq2 once each — cap=6 cuts exactly them, doc 5 re-embeds to
    // null
    coll.trainTextEmbedding(minCount = 1, maxIter = 2, maxVocab = 6)
    val vocabN = new graft.catalog.Catalog(spark, root)
      .read("db", "docs__w2v_vocab").count()
    assert(vocabN <= 6, s"stored artifact must respect the cap, got $vocabN")
    val hits = coll.searchByText(Seq("apple fruit"), limit = 5).collect()
    assert(hits.nonEmpty && hits.forall(_.getAs[Long]("id") != 5L),
      "the all-OOV doc must never surface from a null embedding")
  }

  // ------------------------------- searchByText fallback null symmetry

  test("searchByText inline-embed fallback filters null (all-OOV) doc vectors") {
    // a collection whose stored data has NO embed column but whose
    // meta names the word2vec model (out-of-band meta edit — the
    // fallback branch must behave like the stored branch and drop
    // null-embedding docs instead of surfacing null-scored rows)
    val root = java.nio.file.Files.createTempDirectory("graft-r11-fallback").toString
    val client = new graft.api.GraftClient(spark, root)
    val coll = client.createDatabase("db").createCollection("plain")
    coll.upsert(Seq((1L, "apple fruit apple fruit"), (2L, "apple pie"),
      (3L, "xyzzy")).toDF("id", "text"))
    val cat = new graft.catalog.Catalog(spark, root)
    val vocab = TextEmbed.trainWord2VecVocab(
      Seq("apple fruit apple fruit", "apple pie").toDF("text"), "text",
      dim = 8, minCount = 1)
    cat.createCollectionIfNotExists("db", "plain__w2v_vocab")
    cat.write("db", "plain__w2v_vocab", vocab)
    cat.updateMeta("db", "plain", Map("embedding.model" -> "word2vec",
      "embedding.text_field" -> "text", "embedding.dim" -> "8"))
    val hits = client.database("db").collection("plain")
      .searchByText(Seq("apple fruit"), limit = 10).collect()
    assert(hits.nonEmpty, "in-vocab docs must match")
    assert(hits.forall(_.getAs[Long]("id") != 3L),
      "the all-OOV doc embeds to null and must not appear")
    assert(hits.forall(r => !r.isNullAt(r.fieldIndex("score"))),
      "no null-scored rows from the fallback branch")
  }

  // ---------------------------------------------------- auto-nlist IVF

  test("rebuildIndex default derives nlist = ceil(sqrt(N)); explicit nlist overrides") {
    val root = java.nio.file.Files.createTempDirectory("graft-r11-nlist").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    val rnd = new scala.util.Random(7)
    coll.upsert((0L until 256L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
      .toDF("id", "vector"))
    coll.rebuildIndex()
    assert(coll.describe("index.ivf.nlist") == "16",
      s"auto nlist for N=256 must be sqrt = 16, got ${coll.describe("index.ivf.nlist")}")
    // a full probe over the auto layout equals the FLAT scan
    val q = Seq((0L, Seq.fill(8)(0.1))).toDF("qid", "qvec")
    val flat = coll.search(q, "qid", "qvec", "l2", limit = 5)
      .collect().map(_.getLong(2)).toSeq
    val ivf = coll.search(q, "qid", "qvec", "l2", limit = 5, nprobe = Some(16))
      .collect().map(_.getLong(2)).toSeq
    assert(ivf == flat)
    // explicit override still wins
    coll.modifyVectorIndex(nlist = 4)
    assert(coll.describe("index.ivf.nlist") == "4")
  }

  test("composed-family rebuilds share the auto-nlist default") {
    val root = java.nio.file.Files.createTempDirectory("graft-r11-nlist2").toString
    val db = new graft.api.GraftClient(spark, root).createDatabase("db")
    val rnd = new scala.util.Random(13)
    val rows = (0L until 256L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val sq = db.createCollection("vsq"); sq.upsert(rows.toDF("id", "vector"))
    val pq = db.createCollection("vpq"); pq.upsert(rows.toDF("id", "vector"))
    sq.rebuildIvfSqIndex()
    assert(sq.describe("index.ivfsq.nlist") == "16")
    pq.rebuildIvfPqIndex(m = 4, k = 8)
    assert(pq.describe("index.ivfpq.nlist") == "16")
    // explicit override still wins
    sq.rebuildIvfSqIndex(nlist = 4)
    assert(sq.describe("index.ivfsq.nlist") == "4")
  }

  // -------------------------------------------------- w2v drift check

  test("w2vDriftCheck: clean corpus scores low; novel-vocabulary drift recommends retrain") {
    val root = java.nio.file.Files.createTempDirectory("graft-r11-drift").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("docs",
        Map("embedding.text_field" -> "text", "embedding.dim" -> "8"))
    intercept[IllegalArgumentException] { coll.w2vDriftCheck() } // untrained
    coll.upsert((0L until 40L).map(i =>
      (i, s"alpha beta gamma delta tok${i % 4}")).toDF("id", "text"))
    coll.trainTextEmbedding(minCount = 1, maxIter = 1)
    // same corpus as training: zero OOV, zero TV distance
    val clean = coll.w2vDriftCheck(threshold = 0.2).head()
    assert(clean.getDouble(0) == 0.0 && clean.getDouble(1) == 0.0)
    assert(clean.getDouble(2) < 1e-12)
    assert(!clean.getBoolean(3), "a drift-free corpus must not recommend retrain")
    // the corpus drifts: a wave of docs in entirely new vocabulary
    coll.upsert((100L until 160L).map(i =>
      (i, s"nova$i quasar$i pulsar$i nebula$i comet$i")).toDF("id", "text"))
    val drifted = coll.w2vDriftCheck(threshold = 0.2).head()
    assert(drifted.getDouble(0) > 0.2,
      s"OOV token mass must dominate after the novel wave: ${drifted.getDouble(0)}")
    assert(drifted.getBoolean(3), "drift past the threshold must recommend retrain")
  }

  // ------------------------------------------------- password storage

  test("users: PBKDF2 per-user salt, constant-time verify, legacy SHA-256 upgrade") {
    val root = java.nio.file.Files.createTempDirectory("graft-r11-users").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createUser("carol", "pw")
    client.createUser("dave", "pw")
    val dir = java.nio.file.Paths.get(root, "_users")
    def stored(u: String): String = {
      val s = java.nio.file.Files.readString(dir.resolve(u + ".json"))
      "\"password\": \"([^\"]+)\"".r.findFirstMatchIn(s).get.group(1)
    }
    assert(stored("carol").startsWith("pbkdf2:"),
      "records must persist as pbkdf2:<iters>:<salt>:<hash>")
    // per-user RANDOM salt: same password, different full records
    assert(stored("carol") != stored("dave"))
    assert(client.verifyPassword("carol", "pw"))
    assert(!client.verifyPassword("carol", "pW"))
    // a legacy (pre-r11) unsalted-SHA-256 record still verifies...
    val legacyDigest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("erin:old".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.nio.file.Files.writeString(dir.resolve("erin.json"),
      s"""{"create_time": "2026-01-01 00:00:00", "password": "$legacyDigest"}""")
    assert(client.verifyPassword("erin", "old"))
    assert(!client.verifyPassword("erin", "wrong"))
    // ...and upgrades to PBKDF2 on the next changePassword
    client.changePassword("erin", "new")
    assert(stored("erin").startsWith("pbkdf2:"))
    assert(client.verifyPassword("erin", "new"))
    // a MALFORMED stored record (truncated/hand-edited) verifies as
    // false — never an exception out of a handshake check
    java.nio.file.Files.writeString(dir.resolve("mallory.json"),
      """{"create_time": "2026-01-01 00:00:00", "password": "pbkdf2:xx:zz"}""")
    assert(!client.verifyPassword("mallory", "anything"))
    java.nio.file.Files.writeString(dir.resolve("mallory2.json"),
      """{"create_time": "2026-01-01 00:00:00", "password": "not-hex-at-all"}""")
    assert(!client.verifyPassword("mallory2", "anything"))
    // create leaves no staging orphans (the createLink path cleans up)
    val s = java.nio.file.Files.list(dir)
    val leftovers = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".tmp")).toSeq
    } finally s.close()
    assert(leftovers.isEmpty, s"no .tmp staging files may remain: $leftovers")
  }
}
