package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.{GraftClient, GraftCollectionView}

/** Document-set CRUD parity with the reference AI-document surface
  * (collection_view.py get_document_set/delete/update/get_chunks and
  * the upload→search flow of tests/test_documents). */
class CollectionViewApiSpec extends SparkSpec {

  test("reads on a never-loaded view return empty results, not errors") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cv0").toString)
    val view = client.createDatabase("db").createCollectionView("fresh")
    assert(view.query().isEmpty)
    assert(view.getDocumentSet("nope").isEmpty)
    assert(view.getChunks("nope").isEmpty)
    view.delete(names = Seq("nope")) // no-op, not an error
  }

  test("document-set lifecycle: load, get, chunks, search, update, delete, re-upload") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cv").toString)
    val db = client.createDatabase("db")
    val view = db.createCollectionView("docs")

    val textA = ("spark join fast " * 12).trim
    val textB = ("slow table scan " * 12).trim
    view.loadAndSplitText("a.md", textA)
    view.loadAndSplitText("b.md", textB, title = "B title")

    // registry: both sets with stats
    assert(view.query().collect().map(_.getString(0)).toSeq == Seq("a.md", "b.md"))
    val a = view.getDocumentSet("a.md").head()
    assert(a.getString(1) == "a.md" && a.getLong(3) == textA.length.toLong)
    assert(view.getDocumentSet("missing.md").isEmpty)
    // get_text round-trips the uploaded body (document_set.py:47)
    assert(view.getText("a.md").contains(textA))
    assert(view.getText("missing.md").isEmpty)

    // chunks: ordered, pageable; chunkSize 80 / stride 60 over ~190 chars
    val all = view.getChunks("a.md").collect()
    assert(all.length == view.getDocumentSet("a.md").head().getLong(4))
    assert(all.map(_.getInt(0)).toSeq == all.indices.toSeq)
    val page = view.getChunks("a.md", limit = Some(2), offset = 1).collect()
    assert(page.map(_.getInt(0)).toSeq == Seq(1, 2))

    // content search hits the right document set
    val hits = view.search("spark join", limit = 3).collect()
    assert(hits.nonEmpty && hits.head.getString(1) == "a.md")
    // filter restricts the searched chunks
    val hitsB = view.search("spark join", limit = 3,
      filter = """doc_set = "b.md"""").collect()
    assert(hitsB.forall(_.getString(1) == "b.md"))

    // update registry metadata by name
    view.update(Map("title" -> lit("renamed")), names = Seq("a.md"))
    assert(view.getDocumentSet("a.md").head().getString(1) == "renamed")

    // re-upload replaces chunks (not appends)
    view.loadAndSplitText("b.md", "tiny now")
    assert(view.getChunks("b.md").count() == 1)
    assert(view.getDocumentSet("b.md").head().getLong(3) == "tiny now".length.toLong)
    assert(view.getText("b.md").contains("tiny now"))

    // delete by name removes registry + chunks
    view.delete(names = Seq("a.md"))
    assert(view.getDocumentSet("a.md").isEmpty)
    assert(view.chunks.where(col("doc_set") === "a.md").isEmpty)
    // delete by filter
    view.delete(filter = """n_chars < 100""")
    assert(view.query().isEmpty)
    intercept[IllegalArgumentException](view.delete())
  }

  test("chunk graph lifecycle: incremental appends, masked deletes, compaction — no full rebuilds") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvg").toString)
    val db = client.createDatabase("db")
    val view = db.createCollectionView("docs")
    // a graph-less mirror receives every mutation and serves the exact
    // FLAT scan — the independent oracle each stage's exhaustive-ef ANN
    // result must match byte-for-byte
    val mirror = db.createCollectionView("docs_flat")
    def loadBoth(name: String, text: String): Unit = {
      view.loadAndSplitText(name, text); mirror.loadAndSplitText(name, text)
    }
    def checkStage(q: String, tag: String): Unit = {
      val ann = view.search(q, limit = 3, ef = Some(Int.MaxValue)).collect().toSeq
      val flat = mirror.search(q, limit = 3).collect().toSeq
      assert(ann == flat, s"$tag: exhaustive-ef ANN must equal the FLAT scan")
    }

    loadBoth("a.md", ("spark join fast " * 12).trim)
    loadBoth("b.md", ("slow table scan " * 12).trim)
    // ef before any graph exists is an error, not a silent exact scan
    intercept[IllegalArgumentException] {
      view.search("spark join", limit = 3, ef = Some(4))
    }
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2)
    assert(view.chunkGraphSegments == 2)
    checkStage("slow table", "post-rebuild")
    // production ef serves from the graph and still fills the hit list
    assert(view.search("slow table", limit = 3).collect().length == 3)

    // an upload APPENDS a segment — the graph is not dropped, explicit
    // ef keeps serving, and the new content is immediately searchable
    loadBoth("c.md", ("fresh unseen words " * 12).trim)
    assert(view.chunkGraphSegments == 3,
      "upload must append a graph segment, not drop the graph")
    val post = view.search("fresh unseen", limit = 3, ef = Some(Int.MaxValue)).collect()
    assert(post.nonEmpty && post.head.getString(1) == "c.md",
      "post-upload ANN search must see the new document")
    checkStage("fresh unseen", "post-append")
    assert(!view.search("fresh unseen", limit = 3, ef = Some(4)).isEmpty)

    // delete leaves the graph in place; stale nodes are masked by the
    // serving semi-join, so deleted chunks never surface
    view.delete(names = Seq("b.md")); mirror.delete(names = Seq("b.md"))
    assert(view.chunkGraphSegments == 3, "delete must not drop the graph")
    val afterDel = view.search("slow table", limit = 3, ef = Some(Int.MaxValue)).collect()
    assert(!afterDel.exists(_.getString(1) == "b.md"), "deleted set must not surface")
    checkStage("slow table", "post-delete")

    // re-upload replaces content: old nodes stale (masked), new chunks
    // served from the appended segment
    loadBoth("a.md", ("rewritten body entirely " * 12).trim)
    checkStage("rewritten body", "post-reupload")
    checkStage("spark join", "post-reupload-old-content")

    // compaction folds the mini-segments and the staleness out; every
    // result is unchanged, and the folded graph serves at prod ef
    view.compactChunkGraph()
    checkStage("rewritten body", "post-compaction")
    checkStage("fresh unseen", "post-compaction-2")
    assert(!view.search("fresh unseen", limit = 3).isEmpty)

    // append ≡ rebuild: a from-scratch rebuild over the same chunk
    // rows serves the same exhaustive results the incremental graph did
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2)
    checkStage("rewritten body", "incremental-vs-rebuilt")
  }

  test("chunk graph auto-compacts: upload count never grows segments unboundedly") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvac").toString)
    val view = client.createDatabase("db").createCollectionView("docs")
    view.loadAndSplitText("seed.md", ("spark join fast " * 12).trim)
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 1)
    // one past the auto-compaction threshold: each upload appends a
    // mini-segment; the fold must fire on its own (the collections
    // maybeAutoCompact policy — nothing here calls compactChunkGraph)
    val n = graft.api.GraftCollection.DefaultAutoCompactSegments + 1
    (1 to n).foreach(i =>
      view.loadAndSplitText(s"d$i.md", s"unique words number $i " * 8))
    assert(view.chunkGraphSegments < n,
      s"auto-compaction must have folded: ${view.chunkGraphSegments} segments after $n uploads")
    // everything still serves exactly at exhaustive ef
    val hits = view.search(s"unique words number $n", limit = 3,
      ef = Some(Int.MaxValue)).collect()
    assert(hits.nonEmpty && hits.head.getString(1) == s"d$n.md")
  }

  test("rebuildChunkGraph default_ef governs the no-param search beam") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvef").toString)
    val view = client.createDatabase("db").createCollectionView("docs")
    view.loadAndSplitText("a.md", ("spark join fast " * 12).trim)
    view.loadAndSplitText("b.md", ("slow table scan " * 12).trim)
    val flat = view.search("slow table", limit = 3).collect().toSeq
    // an exhaustive default: the no-ef call (the FLAT→ANN behavior
    // switch documented on search) then still serves exact results
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2,
      defaultEf = Int.MaxValue)
    assert(view.search("slow table", limit = 3).collect().toSeq == flat,
      "defaultEf = MaxValue must make the no-param call exact")
  }

  test("chunk graph derives, folds, and re-derives its default beam (row-123 contract)") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvautoef").toString)
    val view = client.createDatabase("db").createCollectionView("docs")
    def meta = view.chunkGraphMeta
    view.loadAndSplitText("a.md", ("spark join fast " * 12).trim)
    view.loadAndSplitText("b.md", ("slow table scan " * 12).trim)

    // rebuild with no defaultEf DERIVES from the chunk count
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2)
    val n = view.chunks.where(col("vec").isNotNull).count()
    val derived = graft.api.GraftCollection.autoEf(n, 2)
    assert(meta.get("index.hnsw.default_ef").map(_.toInt).contains(derived),
      s"rebuild must persist the derived default, got ${meta.get("index.hnsw.default_ef")}")
    assert(meta.get("index.hnsw.default_ef_src").contains("auto"))
    // the no-ef call serves AT that stored beam, byte-for-byte
    val auto = view.search("slow table", limit = 3).collect().toSeq
    val explicit = view.search("slow table", limit = 3,
      ef = Some(derived)).collect().toSeq
    assert(auto == explicit,
      "no-ef chunk search must serve at the stored derived beam")

    // a big upload max-folds the derived default: 70+ chunks in one
    // segment push autoEfSeg above the 16 floor
    val words = (1 to 900).map(i => s"w$i").mkString(" ")
    view.loadAndSplitText("big.md", words)
    val folded = meta.get("index.hnsw.default_ef").map(_.toInt)
    assert(folded.exists(_ > 16),
      s"append of a big segment must max-fold the derived default, got $folded")

    // compaction re-derives from the folded graph's ACTUAL largest seg
    view.compactChunkGraph()
    val maxSeg = view.chunkGraph.groupBy("seg").count()
      .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(meta.get("index.hnsw.default_ef").map(_.toInt)
        .contains(graft.api.GraftCollection.autoEfSeg(maxSeg)),
      "compaction must re-derive the default from actual segment sizes")

    // an EXPLICIT default is the caller's: maintenance never touches it
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2,
      defaultEf = 7)
    assert(meta.get("index.hnsw.default_ef_src").contains("explicit"))
    view.loadAndSplitText("more.md", words)
    view.compactChunkGraph()
    assert(meta.get("index.hnsw.default_ef").contains("7"),
      "explicit defaultEf must survive append and compaction")
  }

  test("filter delete over many document sets stays distributed (anti-join path)") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvdel").toString)
    val view = client.createDatabase("db").createCollectionView("bulk")
    (1 to 30).foreach(i => view.loadAndSplitText(s"d$i.md",
      s"document number $i " * (if (i % 2 == 0) 10 else 3)))
    assert(view.query().count() == 30)
    // a filter matching half the registry: the doomed set is a frame,
    // never a driver-side name list
    view.delete(filter = "n_chars > 100")
    val left = view.query().collect().map(_.getString(0)).toSet
    assert(left == (1 to 30).filter(_ % 2 == 1).map(i => s"d$i.md").toSet)
    assert(view.chunks.select("doc_set").distinct().count() == 15)
  }

  // ------------------------------------------------- file-upload family

  test("upload_file lifecycle: details, search, images, re-upload, delete") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvfile").toString)
    val view = client.createDatabase("db").createCollectionView("docs")

    val mdA = "spark join fast ![fig](fig_a.png) done"
    view.uploadFile("a.md", mdA.getBytes("UTF-8"),
      metadata = Map("author" -> "t"))
    view.uploadFile("b.txt", ("slow table scan " * 12).trim.getBytes("UTF-8"))

    // query_file_details: registry rows with byte length / type /
    // REAL chunk count; metadata rides along
    val det = view.queryFileDetails().collect()
    assert(det.map(_.getString(0)).toSeq == Seq("a.md", "b.txt"))
    val a = det.head
    assert(a.getLong(1) == mdA.getBytes("UTF-8").length.toLong)
    assert(a.getString(2) == "md")
    assert(a.getLong(3) == view.getChunks("a.md").count())
    assert(a.getMap[String, String](4).get("author").contains("t"))
    // name + filter + outputFields + paging arms
    assert(view.queryFileDetails(fileNames = Seq("b.txt")).count() == 1)
    assert(view.queryFileDetails(filter = """file_type = "md"""")
      .collect().map(_.getString(0)).toSeq == Seq("a.md"))
    val proj = view.queryFileDetails(outputFields = Seq("byte_length"))
    assert(proj.columns.toSeq == Seq("file_name", "byte_length"))
    assert(view.queryFileDetails(limit = Some(1), offset = 1)
      .collect().map(_.getString(0)).toSeq == Seq("b.txt"))

    // uploaded files are document sets: the whole existing surface works
    assert(view.getText("a.md").contains(mdA))
    assert(view.search("spark join", limit = 3).head().getString(1) == "a.md")

    // get_image_url: the file's one chunk carries the fig ref
    val urls = view.getImageUrl(Seq("a.md#0"), "a.md").collect()
    assert(urls.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("a.md#0", "fig_a.png", "files/a.md/fig_a.png")))
    // ids outside the file (or with no refs) yield nothing
    assert(view.getImageUrl(Seq("b.txt#0"), "a.md").isEmpty)

    // re-upload REPLACES: content, chunk count, and image refs
    val mdA2 = ("fresh body " * 20).trim + " ![pic](new.png)"
    view.uploadFile("a.md", mdA2.getBytes("UTF-8"))
    val a2 = view.queryFileDetails(fileNames = Seq("a.md")).head()
    assert(a2.getLong(1) == mdA2.getBytes("UTF-8").length.toLong)
    assert(a2.getLong(3) == view.getChunks("a.md").count())
    val imgs2 = view.images.where(col("file_name") === "a.md")
      .collect().map(_.getString(1)).toSeq
    assert(imgs2 == Seq("new.png"), s"old refs must be replaced: $imgs2")

    // delete retires the file registry and image refs with the chunks
    view.delete(names = Seq("a.md"))
    assert(view.queryFileDetails().collect().map(_.getString(0)).toSeq == Seq("b.txt"))
    assert(view.images.where(col("file_name") === "a.md").isEmpty)
    assert(view.getChunks("a.md").isEmpty)

    // validation: 0 bytes denied; unparseable types declared out
    intercept[IllegalArgumentException] {
      view.uploadFile("x.md", Array.empty[Byte])
    }
    intercept[IllegalArgumentException] {
      view.uploadFile("x.pdf", "ignored".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      view.uploadFileFromPath("/nonexistent/path/x.md")
    }
    // uploadFileFromPath: the reference's local-file entry shape
    val tmp = Files.createTempFile("graft-up", ".md")
    Files.writeString(tmp, "from disk payload")
    view.uploadFileFromPath(tmp.toString)
    assert(view.getText(tmp.getFileName.toString).contains("from disk payload"))
  }

  test("uploadFiles batch: distributed ingest, invalid payloads dropped") {
    import spark.implicits._
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvbatch").toString)
    val view = client.createDatabase("db").createCollectionView("bulk")
    val batch = Seq(
      ("f1.md", "alpha beta ![i](a.png)".getBytes("UTF-8")),
      ("f2.txt", ("gamma delta " * 10).getBytes("UTF-8")),
      ("empty.md", Array.empty[Byte]),
      ("skip.pdf", "binaryish".getBytes("UTF-8")),
      // a DOTLESS name has no extension — it must NOT ingest as if the
      // whole name were its type (batch/per-file consistency)
      ("md", "dotless payload".getBytes("UTF-8"))
    ).toDF("file_name", "content")
    // duplicate names inside ONE batch are rejected loudly — two chunk
    // sets under the same (doc_set, chunk_id) keys would be corrupted
    // state (re-uploads are a second call)
    intercept[IllegalArgumentException] {
      view.uploadFiles(batch.unionAll(
        Seq(("f1.md", "again".getBytes("UTF-8"))).toDF("file_name", "content")))
    }
    view.uploadFiles(batch)
    // only the two parseable non-empty payloads register
    assert(view.queryFileDetails().collect().map(_.getString(0)).toSeq ==
      Seq("f1.md", "f2.txt"))
    assert(view.query().collect().map(_.getString(0)).toSeq ==
      Seq("f1.md", "f2.txt"))
    assert(view.images.count() == 1)
    assert(view.search("gamma delta", limit = 1).head().getString(1) == "f2.txt")
  }

  // --------------------------------------------- trained chunk embedding

  test("trainEmbedding routes the w2v artifact through chunk embed + search; OOV chunks stay total") {
    val client = new GraftClient(spark, Files.createTempDirectory("graft-cvw2v").toString)
    val view = client.createDatabase("db").createCollectionView("docs")
    view.loadAndSplitText("a.md", ("spark join fast " * 12).trim)
    view.loadAndSplitText("b.md", ("slow table scan " * 12).trim)
    // a doc whose words appear ONCE in the corpus: under minCount=2
    // every word is OOV, so its chunk re-embeds to null
    view.loadAndSplitText("rare.md", "qqq www eee")

    view.trainEmbedding(dim = 8, minCount = 2, maxIter = 2)
    // the artifact persisted and the meta flipped
    assert(view.queryFileDetails().columns.nonEmpty) // registries unharmed
    // trained search still routes to the right document (the repeated
    // phrase words are in-vocab and co-trained)
    val hits = view.search("spark join fast", limit = 3).collect()
    assert(hits.nonEmpty && hits.head.getString(1) == "a.md",
      s"trained search must hit a.md: ${hits.toSeq}")
    // OOV totality: the rare chunk is present for get_chunks but
    // unmatchable (null vec) — and never surfaces with a null score
    assert(view.getChunks("rare.md").count() == 1)
    assert(view.chunks.where(col("doc_set") === "rare.md")
      .head().isNullAt(3), "all-OOV chunk must carry a null vec")
    assert(view.search("spark join fast", limit = 10).collect()
      .forall(_.getString(1) != "rare.md"))
    // an all-OOV QUERY yields zero hits, not a random ranking
    assert(view.search("zzz9 yyy8", limit = 3).isEmpty)
    // uploads AFTER training embed through the stored artifact:
    // a new doc repeating a.md's phrase ranks with it
    view.loadAndSplitText("c.md", ("spark join fast " * 6).trim)
    val hits2 = view.search("spark join fast", limit = 20).collect()
    assert(Set("a.md", "c.md").subsetOf(hits2.map(_.getString(1)).toSet),
      s"post-train upload must embed through the vocab: ${hits2.toSeq}")
    // file uploads route through the trained embedder too
    view.uploadFile("d.md", ("spark join fast " * 6).trim.getBytes("UTF-8"))
    assert(Set("a.md", "c.md", "d.md").subsetOf(
      view.search("spark join fast", limit = 20).collect()
        .map(_.getString(1)).toSet))
  }

  test("trainEmbedding rebuilds a live chunk graph in the new embedding space") {
    val root = Files.createTempDirectory("graft-cvw2vg").toString
    val client = new GraftClient(spark, root)
    val view = client.createDatabase("db").createCollectionView("docs")
    view.loadAndSplitText("a.md", ("spark join fast " * 12).trim)
    view.loadAndSplitText("b.md", ("slow table scan " * 12).trim)
    view.rebuildChunkGraph(m = 4, efConstruction = 16, numSegments = 2,
      defaultEf = Int.MaxValue)
    // simulate a PRE-MARKER legacy graph: strip the provenance key the
    // r14 contract writes. The re-embed rebuild must PRESERVE the
    // stored default (it preserves m/efc/segments the same way) — a
    // value with unknown provenance may be a caller's deliberate knob
    // (r14 review fix); only marker="auto" re-derives here.
    new graft.catalog.Catalog(spark, root).updateMeta("db",
      "docs" + GraftCollectionView.GraphSuffix,
      Map("index.hnsw.default_ef_src" -> null))
    view.trainEmbedding(dim = 8, minCount = 2, maxIter = 2)
    assert(view.chunkGraphMeta.get("index.hnsw.default_ef")
        .contains(Int.MaxValue.toString),
      "a pre-marker stored default_ef must survive the re-embed rebuild")
    // the graph serves the NEW space: exhaustive-ef graph search must
    // equal the FLAT ranking over the re-embedded chunks
    val viaGraph = view.search("slow table scan", limit = 3,
      ef = Some(Int.MaxValue)).collect().toSeq
    assert(viaGraph.nonEmpty && viaGraph.head.getString(1) == "b.md",
      s"graph arm must rank in the trained space: $viaGraph")
  }
}
