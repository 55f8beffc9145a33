package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Catalog
import graft.extract.DeterministicExtractor
import graft.streaming.{Ingest, UploadAdmission}

/** O24 assembled upload admission (reference main.py:596-651): every
  * reject path, the accept path landing in the watched layout, and
  * composition with the ingest stream. */
class UploadAdmissionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private val shares = Seq(
    // (owner_id, folder_id, email, permission)
    ("u1", "f1", "editor@x.com", "edit"),
    ("u1", "f1", "viewer@x.com", "view")).toDF(
    "owner_id", "folder_id", "email", "permission")

  private def req(email: String, owner: String, folder: String,
                  name: String, payload: String = "Amount=$1") =
    (email, owner, folder, name, bytes(payload))

  test("validate: reference gate order and reasons") {
    val requests = Seq(
      req("editor@x.com", "u1", "f1", "good file (1).pdf"),  // accept + sanitize
      req("editor@x.com", "u1", "f1", "notes.txt"),          // not_pdf
      req("viewer@x.com", "u1", "f1", "a.pdf"),              // view_only
      req("nobody@x.com", "u1", "f1", "a.pdf"),              // no_share
      req("editor@x.com", "u1", "f9", "a.pdf"),              // no share for f9
      ("editor@x.com", "u1", null, "a.pdf", bytes("x")),     // missing_fields
      // EMPTY owner is missing too (reference Python falsiness,
      // main.py:611) — and must never build 'incoming//...' paths
      ("editor@x.com", "", "f1", "a.pdf", bytes("x")),       // missing_fields
      // null/empty principal → the reference's 401 path, BEFORE other gates
      (null, "u1", "f1", "a.pdf", bytes("x")),               // unauthorized
      ("", "u1", "f1", "a.pdf", bytes("x")),                 // unauthorized
      // suffix check precedes the share probe (main.py:614 vs 620)
      req("nobody@x.com", "u1", "f1", "bad.exe"))
      .toDF("email", "owner_id", "folder_id", "file_name", "content")
    val got = UploadAdmission.validate(requests, shares)
      .select("file_name", "accepted", "reject_reason", "sanitized_name", "storage_path")
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        Option(r.getString(2)), r.getString(3), r.getString(4))).toSeq
    assert(got.count(_._2) == 1)
    val ok = got.find(_._2).get
    assert(ok._4 == "good_file__1_.pdf")
    assert(ok._5 == "incoming/u1/f1/batch/good_file__1_.pdf")
    def reasonOf(name: String) = got.find(_._1 == name).get._3
    assert(reasonOf("notes.txt").contains("not_pdf"))
    assert(Seq(("viewer@x.com", "view_only")).forall { case (_, r) =>
      got.exists(g => g._3.contains(r)) })
    assert(got.count(_._3.contains("no_share")) == 2)
    assert(got.count(_._3.contains("missing_fields")) == 2,
      "null AND empty ids must both be missing_fields")
    assert(got.count(_._3.contains("unauthorized")) == 2,
      "null AND empty email must both be the 401 path")
    assert(got.exists(_._3.contains("unauthorized")),
      "null email must be the 401 path, not a share miss")
    assert(reasonOf("bad.exe").contains("not_pdf"),
      "suffix check must fire before the share probe, as in the reference")
  }

  test("admit lands accepted payloads in the layout and ingest consumes them") {
    val root = Files.createTempDirectory("graft-upload").toString
    val requests = Seq(
      req("editor@x.com", "u1", "f1", "q1 report.pdf", "Amount=$250.50"),
      req("viewer@x.com", "u1", "f1", "blocked.pdf", "Amount=$999"))
      .toDF("email", "owner_id", "folder_id", "file_name", "content")
    val audit = UploadAdmission.admit(requests, shares, s"$root/landing")
    assert(audit.filter("accepted").count() == 1)
    assert(audit.filter("NOT accepted").count() == 1)
    val landed = Paths.get(root, "landing/incoming/u1/f1/batch/q1_report.pdf")
    assert(Files.exists(landed))
    assert(!Files.exists(
      Paths.get(root, "landing/incoming/u1/f1/batch/blocked.pdf")))

    // The landed file flows through the ingest gate end-to-end.
    val meta = Catalog.train("u1", "f1", "x", Map("Amount" -> "$10"))
    Ingest.start(spark, s"$root/landing", s"$root/warehouse", s"$root/processed",
      s"$root/checkpoint", Catalog.empty.add(meta), DeterministicExtractor)
      .awaitTermination()
    val t = Ingest.readTable(spark, s"$root/warehouse", meta)
    assert(t.count() == 1)
    assert(t.first().getAs[Double]("kpi_amount") == 250.5)
  }

  test("adversarial owner/folder ids cannot traverse out of the landing dir") {
    // The reference's GCS blob namespace is flat (no traversal); on a
    // Hadoop filesystem raw '..' segments would escape landingDir.
    // Dangerous ids are REJECTED, not rewritten: a rewritten path would
    // desynchronize from the raw-keyed catalog (Catalog.get(uid,folder))
    // and the upload would silently never ingest — or collide into
    // another tenant's directory. Benign dotted ids stay raw and
    // round-trip exactly.
    val evilShares = Seq(
      ("../../etc", "f/1", "e@x.com", "edit"),
      ("..", "..", "e@x.com", "edit"),
      ("team.a", "f1", "e@x.com", "edit"))
      .toDF("owner_id", "folder_id", "email", "permission")
    val requests = Seq(
      req("e@x.com", "../../etc", "f/1", "pwn.pdf"),
      req("e@x.com", "..", "..", "dots.pdf"),
      req("e@x.com", "team.a", "f1", "ok.pdf"))
      .toDF("email", "owner_id", "folder_id", "file_name", "content")
    val got = UploadAdmission.validate(requests, evilShares)
      .select("file_name", "accepted", "reject_reason", "storage_path")
      .collect().map(r => (r.getString(0), r.getBoolean(1),
        Option(r.getString(2)), r.getString(3))).toSeq
    assert(got.find(_._1 == "pwn.pdf").get._3.contains("bad_path"),
      "'/' in an id must reject, even with a matching share")
    assert(got.find(_._1 == "dots.pdf").get._3.contains("bad_path"),
      "'..' segments must reject")
    // A benign dotted id is NOT a traversal: accepted, path kept RAW so
    // ingest's path-parse and the catalog key agree byte-for-byte.
    val ok = got.find(_._1 == "ok.pdf").get
    assert(ok._2, s"dotted-but-safe id must accept: $ok")
    assert(ok._4 == "incoming/team.a/f1/batch/ok.pdf")
    // Physically: only the benign file lands, inside landingDir.
    val root = Files.createTempDirectory("graft-traversal").toString
    UploadAdmission.admit(requests, evilShares, s"$root/landing")
    assert(Files.exists(
      Paths.get(root, "landing/incoming/team.a/f1/batch/ok.pdf")))
    assert(!Files.exists(Paths.get(root, "etc")) &&
      !Files.exists(Paths.get("/root/repo/etc")) &&
      !Files.exists(Paths.get(root, "landing/incoming/../..").normalize
        .resolve("etc")),
      "nothing may be written outside the landing dir")
  }
}
