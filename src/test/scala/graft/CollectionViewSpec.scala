package graft

import graft.text.CollectionView

class CollectionViewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    ("setA", ("alpha beta gamma delta " * 8).trim, "t1"),  // ~184 chars -> several chunks
    ("setB", ("omega psi chi phi " * 8).trim, "t2")
  ).toDF("name", "text", "title")

  private lazy val index =
    CollectionView.buildChunkIndex(docs, "name", "text", "title", chunkSize = 60, overlap = 20)

  test("chunk index carries string keys, ordered chunk ids and unit vectors") {
    val rows = index.collect()
    assert(rows.map(_.getString(0)).toSet == Set("setA", "setB"))
    val a = rows.filter(_.getString(0) == "setA").map(_.getInt(1)).sorted
    assert(a.head == 0 && a.length > 2)
    val v = rows.head.getSeq[Double](3)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("content search returns chunks of the right document") {
    val hits = CollectionView.search(index, "name", "omega psi chi", limit = 3).collect()
    assert(hits.nonEmpty && hits.head.getString(1) == "setB")
    assert(hits.head.getString(4).contains("omega"))
  }

  test("filter restricts the candidate chunks") {
    val hits = CollectionView.search(index, "name", "omega psi chi", limit = 3,
      filter = """name = "setA"""").collect()
    assert(hits.nonEmpty && hits.forall(_.getString(1) == "setA"))
  }

  test("HNSW-armed chunk search at exhaustive ef is byte-equal to the FLAT scan") {
    val graph = CollectionView.buildChunkGraph(index, "name",
      m = 4, efConstruction = 16, numSegments = 2)
    for ((exp, filt) <- Seq(((0, 0), ""), ((1, 1), ""), ((0, 0), """name = "setB""""))) {
      val flat = CollectionView.search(index, "name", "omega psi chi", limit = 3,
        expandChunk = exp, filter = filt).collect()
      val ann = CollectionView.search(index, "name", "omega psi chi", limit = 3,
        expandChunk = exp, filter = filt, graph = Some(graph),
        ef = Int.MaxValue).collect()
      assert(ann.toSeq == flat.toSeq,
        s"exhaustive-ef graph arm diverged for expand=$exp filter=$filt")
    }
    // production ef: bounded candidates, still full hit lists
    val prod = CollectionView.search(index, "name", "omega psi chi", limit = 3,
      graph = Some(graph), ef = 8).collect()
    assert(prod.length == 3)
  }

  test("expand_chunk splices neighboring chunks") {
    val hits = CollectionView.search(index, "name", "alpha beta gamma", limit = 1,
      expandChunk = (1, 1)).collect()
    assert(hits.length == 1)
    val expanded = hits.head.getString(4)
    val plain = CollectionView.search(index, "name", "alpha beta gamma", limit = 1).collect()
      .head.getString(4)
    assert(expanded.length > plain.length) // neighbors attached
  }
}
