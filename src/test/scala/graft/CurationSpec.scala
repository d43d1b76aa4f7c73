package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.Curation
import graft.sources.Tables
import graft.text.TextAnalysis

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, total, and respects the train fraction") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val split = Curation.hashSplit(docs, "doc_id", trainPct = 90)
    val n = docs.count()
    assert(split.count() == n) // total: every doc gets an assignment
    // deterministic: a second evaluation assigns identically
    val again = Curation.hashSplit(docs, "doc_id", trainPct = 90)
    assert(split.as("a").join(again.as("b"), "doc_id")
      .where(col("a.split") =!= col("b.split")).isEmpty)
    val train = split.where(col("split") === "train").count()
    // md5 spreads uniformly: the train share lands near 90%
    assert(math.abs(train.toDouble / n - 0.9) < 0.1)
    // no shuffle: the plan is scan + project only
    val plan = split.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("hashSplit assignment is content-addressed, not positional") {
    // the same id must land in the same bucket regardless of which
    // frame it arrives in (re-shard safety)
    val a = Curation.hashSplit(Seq(7L, 8L, 9L).toDF("doc_id"), "doc_id")
    val b = Curation.hashSplit(Seq(9L, 7L).toDF("doc_id"), "doc_id")
    val joined = a.select(col("doc_id"), col("bucket").as("ba"))
      .join(b.select(col("doc_id"), col("bucket").as("bb")), "doc_id")
    assert(joined.where(col("ba") =!= col("bb")).isEmpty)
    assert(joined.count() == 2)
  }

  test("topQuantileByGroup matches the window percent_rank definition") {
    val scored = TextAnalysis.quality(
      Tables.documents(spark, sf), "doc_id", "text", keep = Seq("lang"))
      .select("doc_id", "lang", "quality")
    val got = Curation.topQuantileByGroup(scored, "lang", "quality", q = 0.75)
      .select("doc_id").as[Long].collect().toSet
    // oracle-by-definition: percent_rank window over the raw docs
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("quality")
    val want = scored.withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= 0.75).select("doc_id").as[Long].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("topQuantileByGroup: all-tied group keeps nothing (pr = 0 for all)") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
                 ("b", 4L, 1.0), ("b", 5L, 2.0)).toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(5L)) // b: pr(2.0) = 1.0 >= 0.75; a: all pr = 0
  }

  test("topQuantileByGroup: NULL group keys form their own partition") {
    // SQL percent_rank partitions nulls together; a plain equi-join
    // would silently drop every null-keyed doc
    val df = Seq((Some("a"), 1L, 1.0), (Some("a"), 2L, 2.0),
                 (None, 3L, 1.0), (None, 4L, 2.0), (None, 5L, 3.0))
      .toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    // a: pr(2.0)=1.0 -> keep 2; null group: pr(3.0)=1.0 -> keep 5
    assert(kept == Set(2L, 5L))
  }

  test("topQuantileByGroup: single-row group has pr 0 and is dropped") {
    val df = Seq(("a", 1L, 9.0), ("b", 2L, 1.0), ("b", 3L, 2.0)).toDF("g", "id", "s")
    val kept = Curation.topQuantileByGroup(df, "g", "s", q = 0.75)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("contamination: eval docs sharing train grams are flagged, clean docs are not") {
    // ids chosen so the md5 split puts them where the test needs them:
    // verify split membership first, then assert on overlap
    val docs = Tables.documents(spark, sf).limit(200)
    val out = Curation.contamination(docs, "doc_id", "text").collect()
    val split = Curation.hashSplit(docs.select("doc_id"), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every flagged doc is in the eval split with a sane share
    out.foreach { r =>
      assert(split(r.getLong(0)) == "eval")
      val share = r.getDouble(3)
      assert(share > 0.0 && share <= 1.0)
      assert(r.getLong(2) <= r.getLong(1)) // n_shared <= n_grams
    }
    assert(out.nonEmpty)
    // a synthetic doc with nonsense grams, in an id VERIFIED to land in
    // the eval split: present in the probe's input, absent from its
    // output (clean eval docs must not be flagged)
    val evalId = Curation.hashSplit(
        spark.range(1000000L, 1001000L).toDF("doc_id"), "doc_id")
      .where(col("split") === "eval").select("doc_id").as[Long].collect()
      .find(i => !split.contains(i)).get
    val withClean = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((evalId, "zzq qqx xqz zqx qzx xzq")).toDF("doc_id", "text"))
    val out2 = Curation.contamination(withClean, "doc_id", "text").collect()
    assert(!out2.exists(_.getLong(0) == evalId),
      "a clean eval doc must not be flagged as contaminated")
    // and a twin whose text copies a TRAIN doc must be flagged
    val trainText = docs.select(col("doc_id"), col("text")).collect()
      .find(r => split(r.getLong(0)) == "train").get.getString(1)
    val withDirty = docs.select(col("doc_id"), col("text"))
      .unionAll(Seq((evalId, trainText)).toDF("doc_id", "text"))
    val out3 = Curation.contamination(withDirty, "doc_id", "text").collect()
    assert(out3.exists(r => r.getLong(0) == evalId && r.getDouble(3) == 1.0),
      "an eval doc copying a train doc must be flagged with share 1.0")
  }

  test("minhashVerified equals the exact posting self-join at exhaustive bands") {
    val docs = Tables.documents(spark, sf)
    val ng = Dedup.ngrams(docs, "doc_id", "text", 3).cache()
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
    val got = Dedup.minhashVerified(sig, ng, numPerms = 32, bands = 32, threshold = 0.5)
      .select("id_a", "id_b", "inter", "jaccard").collect().toSeq
    val want = Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .select("id_a", "id_b", "inter", "jaccard").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("minhashVerified candidates are bounded by banded collisions") {
    // selective banding (r=8) prunes: candidate count well below the
    // full pair-join population, and the verified output is a subset of
    // the exact answer (never a superset with false positives)
    val docs = Tables.documents(spark, sf)
    val ng = Dedup.ngrams(docs, "doc_id", "text", 3).cache()
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text").cache()
    val selective = Dedup.minhashVerified(sig, ng, numPerms = 32, bands = 4,
      threshold = 0.5).select("id_a", "id_b").collect().toSet
    val exact = Dedup.ngramJaccardFromPostings(ng, threshold = 0.5)
      .select("id_a", "id_b").collect().toSet
    assert(selective.subsetOf(exact))
  }
}
