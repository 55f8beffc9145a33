package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Permissions
import graft.functions.Clean
import org.apache.spark.sql.functions._

/** O19-O23 permission/metadata predicates + O7 JSON shape coercion. */
class PermissionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val folders = Seq(
    ("u1", "f1", Seq.empty[String]),
    ("u1", "f2", Seq("bob@x.com")),
    ("u2", "f3", Seq.empty[String]),
    ("u2", "f4", Seq.empty[String])
  ).toDF("owner_uid", "folder_id", "shared_with")

  private lazy val shares = Seq(
    ("u2", "f4", "alice@x.com")
  ).toDF("owner_id", "folder_id", "email")

  test("accessibleFolders: owner + shared_with + share-doc union") {
    val alice = Permissions.accessibleFolders(folders, shares, "u1", "alice@x.com")
      .select("folder_id").collect().map(_.getString(0)).toSet
    assert(alice == Set("f1", "f2", "f4")) // owns f1/f2, share-doc for f4
    val bob = Permissions.accessibleFolders(folders, shares, "nobody", "bob@x.com")
      .select("folder_id").collect().map(_.getString(0)).toSet
    assert(bob == Set("f2")) // shared_with array membership only
  }

  test("canAccess point checks (the reference's request gate)") {
    assert(Permissions.canAccess(folders, shares, "u1", "alice@x.com", "f1"))
    assert(Permissions.canAccess(folders, shares, "u1", "alice@x.com", "f4"))
    assert(!Permissions.canAccess(folders, shares, "u1", "alice@x.com", "f3"))
    assert(Permissions.canAccess(folders, shares, "zz", "bob@x.com", "f2"))
    assert(!Permissions.canAccess(folders, shares, "zz", "bob@x.com", "f1"))
  }

  test("resolveFolder inverts the nested-loop scan to one filter") {
    val r = Permissions.resolveFolder(folders, "f3").collect()
    assert(r.length == 1 && r.head.getAs[String]("owner_uid") == "u2")
    assert(Permissions.resolveFolder(folders, "nope").isEmpty)
  }

  test("parseJsonMap: object, fenced object, list coercion, garbage (O7)") {
    val inputs = Seq(
      """{"a": "1", "b": "x"}""",
      "```json\n{\"a\": \"2\"}\n```",
      """[{"a": "3"}, {"a": "ignored"}]""",
      """[]""",
      "not json at all")
    val got = inputs.toDF("j")
      .select(Clean.parseJsonMap(col("j")).as("m"))
      .collect().map(r => r.getMap[String, String](0).toMap)
    assert(got(0) == Map("a" -> "1", "b" -> "x"))
    assert(got(1) == Map("a" -> "2"))
    assert(got(2) == Map("a" -> "3"))
    assert(got(3) == Map.empty)
    assert(got(4) == Map.empty)
  }

  test("mapToKeyValueList reshapes to the reference's [{key,value}] form") {
    val df = Seq(1).toDF("x")
      .withColumn("m", map(lit("k1"), lit("v1"), lit("k2"), lit("v2")))
    val kv = Permissions.mapToKeyValueList(spark, df, "m")
      .selectExpr("explode(kv) AS e").select("e.key", "e.value")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kv == Set("k1" -> "v1", "k2" -> "v2"))
  }
}
