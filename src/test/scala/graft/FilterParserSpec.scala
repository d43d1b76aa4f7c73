package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.filter.FilterParser

class FilterParserSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 5L, Seq("x", "y")),
    (2L, "b", 10L, Seq("y", "z")),
    (3L, "a", 15L, Seq("z")),
    (4L, "c", 20L, Seq.empty[String])
  ).toDF("id", "tag", "page", "tags")

  private def ids(filter: String): Seq[Long] =
    df.where(FilterParser.parse(filter)).select("id").as[Long].collect().toSeq.sorted

  test("comparison operators") {
    assert(ids("""tag="a"""") == Seq(1L, 3L))
    assert(ids("page > 5 and page <= 15") == Seq(2L, 3L))
    assert(ids("""tag != "a"""") == Seq(2L, 4L))
  }

  test("in / not in") {
    assert(ids("""tag in ("a", "b")""") == Seq(1L, 2L, 3L))
    assert(ids("""tag not in ("a", "b")""") == Seq(4L))
    assert(ids("page in (5, 20)") == Seq(1L, 4L))
  }

  test("boolean nesting with not") {
    assert(ids("""not (tag = "a" or page = 10)""") == Seq(4L))
    assert(ids("""tag = "a" and (page = 5 or page = 15)""") == Seq(1L, 3L))
  }

  test("array include / exclude / include_all") {
    assert(ids("""tags include ("y")""") == Seq(1L, 2L))
    assert(ids("""tags exclude ("y")""") == Seq(3L, 4L))
    assert(ids("""tags include_all ("y", "z")""") == Seq(2L))
  }

  test("empty filter matches everything") {
    assert(ids("") == Seq(1L, 2L, 3L, 4L))
  }

  test("malformed filters raise") {
    intercept[IllegalArgumentException](FilterParser.parse("tag ="))
    intercept[IllegalArgumentException](FilterParser.parse("""tag = "unterminated"""))
    intercept[IllegalArgumentException](FilterParser.parse("tag = 1 extra"))
  }
}
