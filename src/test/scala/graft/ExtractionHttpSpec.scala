package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{BatchedRpcExtractor, HttpExtractionClient}

/** [[BatchedRpcExtractor]] + [[HttpExtractionClient]] against a REAL
  * local HTTP socket (a deterministic extraction-gateway stub): wire
  * batching, the "N/A" floor, retry/backoff against transient 5xx,
  * and degrade-on-exhaustion — the production skeleton exercised end
  * to end, not just against an in-process fake. */
class ExtractionHttpSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Extraction-gateway stub over a real socket. Default responder:
    * value = "<key>@<name>#<contentLen>"; the key literally named
    * "missing" is never returned (N/A-floor probe). The first
    * `failFirst` requests answer 503. */
  private def startServer(failFirst: Int = 0,
                          respond: (String, Array[Byte], Seq[String]) =>
                            Map[String, String] = (name, content, keys) =>
                            keys.filterNot(_ == "missing")
                              .map(k => k -> s"$k@$name#${content.length}")
                              .toMap
                         ): (HttpServer, AtomicInteger) = {
    val requests = new AtomicInteger()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/extract", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val n = requests.incrementAndGet()
        val body = scala.io.Source
          .fromInputStream(x.getRequestBody, "UTF-8").mkString
        if (n <= failFirst) {
          x.sendResponseHeaders(503, -1); x.close(); return
        }
        val node = mapper.readTree(body)
        val keys = (0 until node.get("keys").size)
          .map(node.get("keys").get(_).asText)
        val docs = node.get("docs")
        val root = mapper.createObjectNode()
        val rs = root.putArray("results")
        (0 until docs.size).foreach { i =>
          val d = docs.get(i)
          val name = d.get("name").asText
          val content = java.util.Base64.getDecoder
            .decode(d.get("content_b64").asText)
          val o = rs.addObject()
          respond(name, content, keys).foreach { case (k, v) => o.put(k, v) }
        }
        val out = mapper.writeValueAsBytes(root)
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(200, out.length)
        x.getResponseBody.write(out)
        x.close()
      }
    })
    server.start()
    (server, requests)
  }

  test("distributed extraction over a real socket: wire batching + N/A floor") {
    val (server, requests) = startServer()
    try {
      val port = server.getAddress.getPort
      val extractor = new BatchedRpcExtractor(
        new HttpExtractionClient(s"http://127.0.0.1:$port/extract"),
        batchSize = 4)
      val docs = (0 until 12).map(i =>
        (s"f$i.pdf", s"content-$i".getBytes("UTF-8")))
      val keys = Seq("total", "missing")
      // executor-side calls from 2 partitions: ceil(6/4) × 2 = 4 RPCs
      val bs = extractor.batchSize
      val got = spark.sparkContext.parallelize(docs, 2)
        .mapPartitions(_.grouped(bs)
          .flatMap(b => extractor.extractAll(b, keys)))
        .collect()
      assert(got.length == 12)
      assert(got.forall(_("missing") == "N/A"))
      assert(got.map(_("total")).toSet ==
        docs.map { case (n, c) => s"total@$n#${c.length}" }.toSet)
      assert(requests.get() == 4, s"expected 4 batched RPCs, got $requests")
    } finally server.stop(0)
  }

  test("transient 503s retry with the exponential schedule, then succeed") {
    val (server, requests) = startServer(failFirst = 2)
    try {
      val port = server.getAddress.getPort
      val sleeps = scala.collection.mutable.Buffer[Long]()
      val extractor = new BatchedRpcExtractor(
        new HttpExtractionClient(s"http://127.0.0.1:$port/extract"),
        batchSize = 8, maxAttempts = 3, baseBackoffMs = 50L,
        sleep = sleeps.append(_))
      val out = extractor.extractAll(
        Seq("a.pdf" -> "abc".getBytes("UTF-8")), Seq("total"))
      assert(out.head("total") == "total@a.pdf#3")
      assert(sleeps.toSeq == Seq(50L, 100L)) // base, 2×base
      assert(requests.get() == 3)
    } finally server.stop(0)
  }

  test("non-2xx failures surface the gateway's error body in the exception") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/extract", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val msg = """{"error":"tenant quota exhausted"}"""
          .getBytes("UTF-8")
        x.sendResponseHeaders(429, msg.length)
        x.getResponseBody.write(msg)
        x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val client = new HttpExtractionClient(
        s"http://127.0.0.1:$port/extract")
      val e = intercept[java.io.IOException] {
        client.extractBatch(Seq("a.pdf" -> "x".getBytes("UTF-8")),
          Seq("total"))
      }
      assert(e.getMessage.contains("HTTP 429"))
      assert(e.getMessage.contains("tenant quota exhausted"),
        s"error body missing from: ${e.getMessage}")
    } finally server.stop(0)
  }

  test("FULL ingest pipeline over the HTTP client equals the in-process run") {
    // The reference's shape end to end: landing binaries stream in,
    // each partition's batches go out as real HTTP extraction calls,
    // typed KPI rows land in the warehouse — diffed row-for-row
    // against the same pipeline run with the in-process extractor.
    import java.nio.charset.StandardCharsets
    import graft.catalog.Catalog
    import graft.extract.DeterministicExtractor
    import graft.streaming.Ingest
    import org.apache.spark.sql.functions.col
    // gateway behavior: parse key=value lines (the documents' format)
    // and answer exactly the requested keys it finds
    val (server, requests) = startServer(respond = (_, content, keys) => {
      val found = DeterministicExtractor.discover("d.pdf", content)
      keys.flatMap(k => found.get(k).map(k -> _)).toMap
    })
    try {
      val port = server.getAddress.getPort
      val master = DeterministicExtractor.discover("master.pdf",
        """Total Revenue ($)=$1,234.56
          |Report Date=January 15, 2024
          |Status=Active""".stripMargin.getBytes(StandardCharsets.UTF_8))
      val catalog = Catalog.empty.add(
        Catalog.train("u1", "f1", "quarterly report", master))
      def write(landing: String, rel: String, content: String): Unit = {
        val p = java.nio.file.Paths.get(landing, rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          content.getBytes(StandardCharsets.UTF_8))
      }
      def runPipeline(tag: String,
                      extractor: graft.extract.Extractor): Seq[Seq[Any]] = {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-http-ingest-$tag").toString
        Seq("doc1" -> "Total Revenue ($)=\"$2,500.75\"\nReport Date=2024-02-01\nStatus=Active",
          "doc2" -> "Total Revenue ($)=(3,000.00)\nStatus=Closed",
          "doc3" -> "Report Date=03/15/2024\nStatus=Active")
          .foreach { case (n, c) =>
            write(s"$root/landing", s"incoming/u1/f1/batch/$n.pdf", c) }
        Ingest.start(spark, s"$root/landing", s"$root/warehouse",
          s"$root/processed", s"$root/checkpoint", catalog, extractor)
          .awaitTermination()
        val meta = catalog.get("u1", "f1").get
        Ingest.readTable(spark, s"$root/warehouse", meta)
          .drop("row_id", "uploaded_at") // run-specific columns
          .orderBy(col("file_name"))
          .collect().map(_.toSeq).toSeq
      }
      val viaHttp = runPipeline("http", new BatchedRpcExtractor(
        new HttpExtractionClient(s"http://127.0.0.1:$port/extract"),
        batchSize = 2))
      val inProc = runPipeline("det", DeterministicExtractor)
      assert(viaHttp == inProc, "HTTP-extracted table diverged")
      assert(viaHttp.length == 3)
      assert(requests.get() >= 2, "extraction actually went over the wire")
    } finally server.stop(0)
  }

  test("exhausted retries degrade the batch to all-N/A, never throw") {
    val (server, requests) = startServer(failFirst = Int.MaxValue)
    try {
      val port = server.getAddress.getPort
      val extractor = new BatchedRpcExtractor(
        new HttpExtractionClient(s"http://127.0.0.1:$port/extract"),
        batchSize = 8, maxAttempts = 2, baseBackoffMs = 1L,
        sleep = _ => ())
      val out = extractor.extractAll(
        Seq("a.pdf" -> "x".getBytes, "b.pdf" -> "y".getBytes),
        Seq("total", "date"))
      assert(out == Seq(
        Map("total" -> "N/A", "date" -> "N/A"),
        Map("total" -> "N/A", "date" -> "N/A")))
      assert(requests.get() == 2) // maxAttempts, then log-and-continue
    } finally server.stop(0)
  }
}
