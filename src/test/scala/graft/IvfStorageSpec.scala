package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.vector.IvfIndex

class IvfStorageSpec extends SparkSpec {

  test("rebuild_index writes cell-partitioned layout and reads prune partitions") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(embs, "embedding", nlist = 4, maxIter = 5)
    val path = Files.createTempDirectory("graft-ivf").toString
    IvfIndex.writeIndexed(model, embs, "embedding", path)

    // on-disk layout: one directory per cell
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("cell=")) && dirs.length == 4)

    // reading two cells only touches those partitions (PartitionFilters)
    val pruned = IvfIndex.readCells(spark, path, Seq(0, 1))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell#"))

    // and the pruned read returns exactly the rows assigned to the cells
    val expected = IvfIndex.assign(model, embs, "embedding")
      .where(col("cell").isin(0, 1)).count()
    assert(pruned.count() == expected && expected > 0)
  }
}
