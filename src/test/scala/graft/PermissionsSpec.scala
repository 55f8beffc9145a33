package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Permissions
import graft.functions.Clean
import org.apache.spark.sql.functions._

/** O19-O23 permission/metadata predicates + O7 JSON shape coercion. */
class PermissionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // shared_with holds UIDs (the reference checks `uid in shared_with`,
  // main.py:540); the shares collection carries the grantee email but
  // the READ gate never consults it (main.py:543-545).
  private lazy val folders = Seq(
    ("u1", "f1", Seq.empty[String]),
    ("u1", "f2", Seq("u9")),
    ("u2", "f3", Seq.empty[String]),
    ("u2", "f4", Seq.empty[String])
  ).toDF("owner_uid", "folder_id", "shared_with")

  private lazy val shares = Seq(
    ("u2", "f4", "alice@x.com")
  ).toDF("owner_id", "folder_id", "email")

  test("accessibleFolders: owner + shared_with(uid) + unfiltered share-doc union") {
    val u1 = Permissions.accessibleFolders(folders, shares, "u1")
      .select("folder_id").collect().map(_.getString(0)).toSet
    assert(u1 == Set("f1", "f2", "f4")) // owns f1/f2; f4 has A share doc
    // The share-doc arm grants to ANY principal — the reference's loose
    // gate (main.py:543-545 probes only folderId+ownerId existence).
    val u9 = Permissions.accessibleFolders(folders, shares, "u9")
      .select("folder_id").collect().map(_.getString(0)).toSet
    assert(u9 == Set("f2", "f4")) // shared_with membership + loose share arm
  }

  test("canAccess point checks (the reference's request gate)") {
    assert(Permissions.canAccess(folders, shares, "u1", "f1"))
    assert(Permissions.canAccess(folders, shares, "u1", "f4"))
    assert(!Permissions.canAccess(folders, shares, "u1", "f3"))
    assert(Permissions.canAccess(folders, shares, "u9", "f2"))
    assert(!Permissions.canAccess(folders, shares, "zz", "f1"))
    assert(Permissions.canAccess(folders, shares, "zz", "f4"),
      "any share doc for (owner, folder) grants — reference main.py:543-545")
  }

  test("resolveFolder inverts the nested-loop scan to one filter") {
    val r = Permissions.resolveFolder(folders, "f3").collect()
    assert(r.length == 1 && r.head.getAs[String]("owner_uid") == "u2")
    assert(Permissions.resolveFolder(folders, "nope").isEmpty)
    // Principal-aware form (main.py:784-791): only folders the uid
    // owns or is shared on resolve.
    assert(Permissions.resolveFolder(folders, "f2", Some("u9")).count() == 1)
    assert(Permissions.resolveFolder(folders, "f3", Some("u9")).isEmpty)
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
    val kv = Permissions.mapToKeyValueList(df, "m")
      .selectExpr("explode(kv) AS e").select("e.key", "e.value")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kv == Set("k1" -> "v1", "k2" -> "v2"))
  }
}
