package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Curation, UrlOps}
import graft.vector.KnnSearch

/** Round-10 pins: the extended URL canonicalizer rules, the
  * two-phase token-budget prefix sum, the stored-metric nprobe route,
  * the per-segment radius boundary rule, ANN hard-negative mining,
  * and the user-management family. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------- URL canonicalizer

  test("canonicalize: default ports, percent case, exact tracking keys, embedded urls, schemeless") {
    val cases = Seq(
      // default port strips, scheme-aware
      ("https://Ex.com:443/A", "https://ex.com/A"),
      ("http://ex.com:80/a", "http://ex.com/a"),
      // non-default (or cross-scheme) ports stay
      ("https://ex.com:8080/a", "https://ex.com:8080/a"),
      ("http://ex.com:443/a", "http://ex.com:443/a"),
      // portless host + default-port host collapse to the same form
      ("https://ex.com/a", "https://ex.com/a"),
      // percent-escape hex lowercases; non-hex '%' is literal
      ("https://ex.com/a%2Fb%e9?x=%4F", "https://ex.com/a%2fb%e9?x=%4f"),
      ("https://ex.com/100%25off", "https://ex.com/100%25off"),
      ("https://ex.com/50%ZZoff", "https://ex.com/50%ZZoff"),
      // the FIRST '://' splits — an embedded URL in a kept param
      // survives whole, value case preserved
      ("https://a.com/r?u=https://B.com/Path", "https://a.com/r?u=https://B.com/Path"),
      // tracking keys match EXACTLY (utm_ prefix; fbclid/gclid exact):
      // gclid_src / fbclid2 are legitimate params and survive
      ("https://ex.com/a?gclid_src=1&gclid=2&utm_x=3&fbclid2=4",
        "https://ex.com/a?gclid_src=1&fbclid2=4"),
      // schemeless input passes through UNCHANGED (path case matters)
      ("www.Ex.com/Path", "www.Ex.com/Path"),
      // a SCHEMELESS url embedding a URL in its query must not be
      // mis-split at the embedded '://' (the prefix before the first
      // '://' is not a valid RFC 3986 scheme — review finding)
      ("Example.com/r?u=https://B.com/x", "Example.com/r?u=https://B.com/x"),
      // '://' with an empty/invalid scheme prefix: unchanged
      ("://nohost/Path", "://nohost/Path"))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(col("id"), UrlOps.canonicalize(col("url")).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    cases.zipWithIndex.foreach { case ((raw, want), i) =>
      assert(got(i.toLong) == want, s"canonicalize($raw) = ${got(i.toLong)}, want $want")
    }
  }

  test("urlDedup: schemeless path-case variants do NOT collapse") {
    val docs = Seq(
      (1L, "ex.com/CasePath"), (2L, "ex.com/casepath"),
      (3L, "https://ex.com:443/p"), (4L, "https://ex.com/p")).toDF("id", "url")
    val out = UrlOps.urlDedup(docs, "id", "url")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "ex.com/CasePath"), (2L, "ex.com/casepath"),
      (3L, "https://ex.com/p")))
  }

  // ------------------------------------------------ tokenBudget 2-phase

  test("tokenBudget: two-phase shard prefix sum ≡ the single-window form, any shard count") {
    val docs = (0L until 300L).map { i =>
      (i, if (i % 17 == 0) null.asInstanceOf[String]
          else Seq.fill((i % 7).toInt + 1)("w").mkString(" "),
        "dom" + (i % 3))
    }.toDF("id", "text", "dom")
    // the single-window reference form (the pre-r10 implementation,
    // inlined: same salted-md5 order hash, one window per domain)
    val base = docs.select(col("id").as("doc_id"), col("dom").as("domain"),
      size(split(coalesce(col("text"), lit("")), " ")).as("n_tokens"),
      conv(substring(md5(concat(col("id").cast("string"), lit("budget"))), 1, 8),
        16, 10).cast("long").as("__ord"))
    val w = Window.partitionBy("domain").orderBy(col("__ord"), col("doc_id"))
    val ref = base.select(col("doc_id"), col("domain"), col("n_tokens"),
        sum(col("n_tokens").cast("long")).over(w).as("cum_tokens"))
      .withColumn("keep", col("cum_tokens") <= 50L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    Seq(1, 4, 64).foreach { sh =>
      val got = Curation.tokenBudget(docs, "id", "text", "dom", 50L, shards = sh)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getBoolean(4))).toSeq
      assert(got == ref, s"two-phase (shards=$sh) must equal the window form")
    }
    // non-power-of-two shard counts are rejected
    intercept[IllegalArgumentException] {
      Curation.tokenBudget(docs, "id", "text", "dom", 50L, shards = 3)
    }
  }

  // --------------------------------------- stored-metric nprobe route

  test("search(nprobe): ranks in the index's STORED metric, not the caller default") {
    val root = java.nio.file.Files.createTempDirectory("graft-r10-ivfm").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    // cosine and l2 disagree: id 1 is the cosine winner (same
    // direction, far away), id 2 the l2 winner (close by)
    val docs = (Seq((1L, Seq(10.0, 0.0)), (2L, Seq(0.9, 0.1))) ++
      (3L until 9L).map(i => (i, Seq(-1.0 * i, 5.0)))).toDF("id", "vector")
    coll.upsert(docs)
    coll.rebuildIndex(nlist = 2, metric = "l2")
    val q = Seq((0L, Seq(1.0, 0.0))).toDF("qid", "qvec")
    // full probe (nprobe = nlist) ⇒ exhaustive; default metric param is
    // "cosine" but the l2-built index must rank by L2 (r9 advice: the
    // nprobe-only arm and the radius+nprobe arm can't diverge)
    val top = coll.search(q, "qid", "qvec", limit = 1, nprobe = Some(2))
      .collect()
    assert(top.head.getAs[Long]("id") == 2L,
      "nprobe arm must rank in the stored l2 metric (id 2 is the l2 winner)")
    // FLAT (no index param) keeps the caller metric: cosine winner
    val flat = coll.search(q, "qid", "qvec", limit = 1).collect()
    assert(flat.head.getAs[Long]("id") == 1L)
  }

  // ------------------------------- per-segment radius boundary signal

  test("searchHnswRadius: per-segment boundary rule recovers the full ball across segments") {
    val root = java.nio.file.Files.createTempDirectory("graft-r10-rad").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    // 3 segments; the ball (cosine >= 0.95 around (1,0,0)) holds 6
    // docs spread across segments, everything else points away
    val inBall = (0L until 6L).map(i =>
      (i, Seq(1.0, 0.01 * i, 0.0)))
    val outBall = (6L until 60L).map(i =>
      (i, Seq(-1.0, (i % 7).toDouble, 1.0)))
    coll.upsert((inBall ++ outBall).toDF("id", "vector"))
    coll.rebuildHnswIndex(m = 4, efConstruction = 32, numSegments = 3,
      metric = "cosine")
    val q = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("qid", "qvec")
    // limit > |ball|: done requires EVERY segment's beam past the
    // boundary, so the adaptive ladder must surface the whole ball —
    // byte-equal to FLAT radius+limit
    val got = coll.searchHnswRadius(q, "qid", "qvec", radius = 0.95,
      limit = 10, ef = 1).collect().map(_.getAs[Long]("id")).toSet
    val flat = KnnSearch.radiusTopK(coll.df, "id", "vector", q, "qid", "qvec",
      "cosine", 0.95, 10).collect().map(_.getAs[Long]("id")).toSet
    assert(got == flat, s"adaptive radius must equal FLAT: got $got want $flat")
    // ladder telemetry: rungs recorded, widths escalate 4×
    val rungs = coll.lastLadderRungs.toSeq
    assert(rungs.nonEmpty)
    assert(rungs.map(_._1).sliding(2).forall {
      case Seq(a, b) => b >= a; case _ => true })
  }

  // --------------------------------------------- ANN hard negatives

  test("hardNegativesHnsw: exhaustive ef ≡ exact scan; adaptive ladder fills; null labels") {
    val root = java.nio.file.Files.createTempDirectory("graft-r10-hn").toString
    val coll = new graft.api.GraftClient(spark, root)
      .createDatabase("db").createCollection("v")
    val docs = (0L until 60L).map { i =>
      val lab = if (i % 10 == 9) null else "L" + (i % 3)
      (i, Seq(math.cos(i * 0.1), math.sin(i * 0.1), (i % 5) * 0.2), lab)
    }.toDF("id", "vector", "label")
    coll.upsert(docs)
    coll.rebuildHnswIndex(m = 4, efConstruction = 32, numSegments = 2,
      metric = "cosine")
    val q = docs.where(col("id") < 6)
      .select(col("id").as("qid"), col("vector").as("qvec"),
        col("label").as("qlab"))
    val exact = KnnSearch.hardNegatives(coll.df, "id", "vector", "label",
      q, "qid", "qvec", "qlab", "cosine", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // exhaustive single-shot: byte-equal to the exact scan
    val exh = coll.hardNegativesHnsw(q, "qid", "qvec", "qlab", "label",
      k = 5, ef = 100000, adaptive = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(exh == exact, "exhaustive-ef twin must equal KnnSearch.hardNegatives")
    // adaptive from a starved beam: every query fills to min(k, |diff|)
    val adaptive = coll.hardNegativesHnsw(q, "qid", "qvec", "qlab", "label",
      k = 5, ef = 1)
    val counts = adaptive.groupBy("query_id").agg(sum(lit(1L)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 6L).foreach { qid =>
      assert(counts.getOrElse(qid, 0L) == 5L, s"query $qid must fill to k")
    }
    // null-label anchors mine only labeled docs; labeled anchors CAN
    // mine null-label docs (IS DISTINCT FROM)
    val nullAnchor = docs.where(col("id") === 9)
      .select(col("id").as("qid"), col("vector").as("qvec"),
        col("label").as("qlab"))
    val mined = coll.hardNegativesHnsw(nullAnchor, "qid", "qvec", "qlab",
      "label", k = 60, ef = 100000, adaptive = false)
      .join(coll.df.select(col("id"), col("label")), "id")
    assert(mined.where(col("label").isNull).count() == 0,
      "a NULL-label anchor must never mine another NULL-label doc")
  }

  // ------------------------------------------- trained text embedding

  test("trainTextEmbedding: Word2Vec vocab artifact, re-embed, upsert-through-vocab, OOV totality") {
    val root = java.nio.file.Files.createTempDirectory("graft-r10-w2v").toString
    val dbh = new graft.api.GraftClient(spark, root).createDatabase("db")
    val coll = dbh.createCollection("t",
      Map("embedding.text_field" -> "text", "embedding.dim" -> "8"))
    // words below minCount=2 (tasty/fresh/fast/loud) must be OOV
    coll.upsert(Seq(
      (1L, "apple fruit tasty"), (2L, "apple fruit fresh"),
      (3L, "car engine fast"), (4L, "car engine loud")).toDF("id", "text"))
    coll.trainTextEmbedding(minCount = 2, maxIter = 3)
    // the artifact is a sibling collection with (word, vec[dim]) rows
    assert(dbh.listCollections().contains("t__w2v_vocab"))
    val vocab = dbh.collection("t__w2v_vocab").df.collect()
      .map(r => (r.getString(0), r.getSeq[Double](1))).toMap
    assert(vocab.keySet == Set("apple", "fruit", "car", "engine"))
    assert(vocab.values.forall(_.length == 8))
    assert(coll.describe("embedding.model") == "word2vec")
    // exact-vocab-content query: docs 1 and 2 both embed as
    // mean(apple, fruit) (their third words are OOV), identical to the
    // query's embedding -> cosine exactly 1.0, id tie-break
    val r = coll.searchByText(Seq("apple fruit"), limit = 4).collect()
    assert(r.take(2).map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(r.take(2).forall(_.getAs[Double]("score") > 1.0 - 1e-9))
    // an all-OOV query embeds to null and returns NO hits (never a
    // random match)
    assert(coll.searchByText(Seq("zzz qqq"), limit = 3).count() == 0)
    // upserts AFTER training embed through the STORED vocab (no
    // retrain): a new doc with the same vocab words joins the 1.0 tier
    coll.upsert(Seq((9L, "apple fruit")).toDF("id", "text"))
    val r2 = coll.searchByText(Seq("apple fruit"), limit = 5).collect()
    assert(r2.filter(_.getAs[Double]("score") > 1.0 - 1e-9)
      .map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 9L))
    // embedWithVocab is TOTAL: an all-OOV doc keeps its row, vec null
    import graft.text.TextEmbed
    val vocabDf = dbh.collection("t__w2v_vocab").df
    val tot = TextEmbed.embedWithVocab(
      Seq((1L, "apple fruit"), (2L, "zzz qqq")).toDF("id", "text"),
      "id", "text", vocabDf).collect().map(r => (r.getLong(0), r.isNullAt(1))).toMap
    assert(tot == Map(1L -> false, 2L -> true))
    // a dropped vocab artifact under model=word2vec is corrupted state:
    // searchByText must THROW, never silently fall back to hash vectors
    dbh.dropCollection("t__w2v_vocab")
    intercept[IllegalArgumentException] { coll.searchByText(Seq("apple")) }
    // layout preservation: a BUCKETED collection keeps its bucket dirs
    // through trainTextEmbedding (a raw overwrite would flatten them
    // and the next merge-on-write upsert would stack partition dirs
    // onto flat files — review finding)
    val collB = dbh.createCollection("tb",
      Map("embedding.text_field" -> "text", "buckets" -> "4"))
    collB.upsert(Seq(
      (1L, "apple fruit tasty"), (2L, "apple fruit fresh"),
      (3L, "car engine fast"), (4L, "car engine loud")).toDF("id", "text"))
    collB.trainTextEmbedding(minCount = 2, maxIter = 3)
    collB.upsert(Seq((9L, "apple fruit")).toDF("id", "text"))
    assert(collB.count() == 5, "bucket layout must survive the re-embed")
    assert(collB.searchByText(Seq("apple fruit"), limit = 5).collect()
      .count(_.getAs[Double]("score") > 1.0 - 1e-9) == 3)
  }

  // ------------------------------------------------ user management

  test("users: create/describe/list/grant/revoke/changePassword/drop lifecycle") {
    val root = java.nio.file.Files.createTempDirectory("graft-r10-users").toString
    val client = new graft.api.GraftClient(spark, root)
    import graft.catalog.UserPrivilege
    client.createUser("alice", "pw1")
    client.createUser("bob", "pw1")
    // same password, different users ⇒ different stored digests (the
    // username salts the hash); both verify
    assert(client.verifyPassword("alice", "pw1"))
    assert(client.verifyPassword("bob", "pw1"))
    assert(!client.verifyPassword("alice", "wrong"))
    // duplicate create is an error
    intercept[IllegalArgumentException] { client.createUser("alice", "x") }
    // grant merges per resource, order preserved, duplicates dropped
    client.grantToUser("alice", Seq(UserPrivilege("db0.*", Seq("read"))))
    client.grantToUser("alice", Seq(
      UserPrivilege("db0.*", Seq("write", "read")),
      UserPrivilege("db1.c", Seq("read"))))
    val info = client.describeUser("alice")
    assert(info.user == "alice" && info.createTime.nonEmpty)
    assert(info.privileges == Seq(
      UserPrivilege("db0.*", Seq("read", "write")),
      UserPrivilege("db1.c", Seq("read"))))
    // revoke subtracts; an emptied resource disappears; ungranted
    // revokes are no-ops
    client.revokeFromUser("alice", Seq(
      UserPrivilege("db0.*", Seq("write")),
      UserPrivilege("db1.c", Seq("read")),
      UserPrivilege("nope.*", Seq("read"))))
    assert(client.describeUser("alice").privileges ==
      Seq(UserPrivilege("db0.*", Seq("read"))))
    // list is sorted and complete
    assert(client.userList().map(_.user) == Seq("alice", "bob"))
    // password change invalidates the old one
    client.changePassword("alice", "pw2")
    assert(client.verifyPassword("alice", "pw2"))
    assert(!client.verifyPassword("alice", "pw1"))
    // drop is idempotent; users are invisible to database listings
    client.dropUser("bob")
    client.dropUser("bob")
    assert(client.userList().map(_.user) == Seq("alice"))
    assert(client.listDatabases().isEmpty)
    // path-escaping names are rejected
    intercept[IllegalArgumentException] { client.createUser("../evil", "x") }
    // actions persist comma-joined, so commas in an action are rejected
    // at grant time (an embedded ',' would silently split on read and
    // defeat a later revoke — review finding)
    intercept[IllegalArgumentException] {
      client.grantToUser("alice", Seq(UserPrivilege("db2.*", Seq("read,write"))))
    }
    intercept[IllegalArgumentException] {
      client.grantToUser("alice", Seq(UserPrivilege("db2.*", Seq(""))))
    }
  }
}
