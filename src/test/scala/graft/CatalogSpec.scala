package graft

import java.nio.file.Files

import graft.catalog.Catalog

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft-cat").toString)

  test("database and collection lifecycle") {
    val cat = freshCatalog()
    cat.createDatabase("db1")
    assert(cat.listDatabases() == Seq("db1"))
    cat.createCollection("db1", "coll", Map("metric" -> "cosine", "dim" -> "64"))
    assert(cat.listCollections("db1") == Seq("coll"))
    assert(cat.describeCollection("db1", "coll") == Map("metric" -> "cosine", "dim" -> "64"))
    intercept[IllegalArgumentException](cat.createCollection("db1", "coll"))
    cat.dropCollection("db1", "coll")
    assert(cat.listCollections("db1").isEmpty)
    cat.dropDatabase("db1")
    assert(cat.listDatabases().isEmpty)
  }

  test("write / read / truncate round-trip") {
    val cat = freshCatalog()
    cat.createDatabase("db")
    cat.createCollection("db", "c")
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    cat.write("db", "c", df)
    assert(cat.read("db", "c").count() == 2)
    cat.truncateCollection("db", "c")
    assert(cat.read("db", "c").count() == 0)
    assert(cat.describeCollection("db", "c") == Map.empty)
  }

  test("aliases resolve and delete") {
    val cat = freshCatalog()
    cat.createDatabase("db")
    cat.createCollection("db", "v1")
    cat.setAlias("db", "prod", "v1")
    assert(cat.resolve("db", "prod") == "v1")
    assert(cat.resolve("db", "v1") == "v1")
    cat.deleteAlias("db", "prod")
    assert(cat.resolve("db", "prod") == "prod")
    intercept[IllegalArgumentException](cat.setAlias("db", "a", "missing"))
  }
}
