package graft.extract

import scala.jdk.CollectionConverters._

/** JSON-over-HTTP [[ExtractionClient]] — the wire client that makes
  * [[BatchedRpcExtractor]] runnable END TO END against any extraction
  * gateway (a sidecar or proxy in front of a model endpoint; the
  * reference makes one HTTPS model call per file, main.py:694-713 —
  * this is the batched engine-side analog). JDK-only transport
  * (HttpURLConnection) + the Jackson already on Spark's classpath: no
  * new dependencies.
  *
  * Protocol, one POST per document batch:
  * {{{
  *   request  {"keys": ["k1", …],
  *             "docs": [{"name": "...", "content_b64": "..."}, …]}
  *   response {"results": [{"k1": "v1", …}, …]}   // positional
  * }}}
  * Auth/tenancy ride `headers`. Non-2xx statuses, malformed
  * responses, and transport errors THROW — retry/backoff/degrade
  * policy is [[BatchedRpcExtractor]]'s job, by contract. */
final class HttpExtractionClient(endpoint: String,
                                 headers: Map[String, String] = Map.empty,
                                 connectTimeoutMs: Int = 10000,
                                 readTimeoutMs: Int = 60000)
    extends ExtractionClient {

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  override def extractBatch(docs: Seq[(String, Array[Byte])],
                            keys: Seq[String]): Seq[Map[String, String]] = {
    val root = mapper.createObjectNode()
    val kj = root.putArray("keys"); keys.foreach(kj.add)
    val dj = root.putArray("docs")
    docs.foreach { case (name, content) =>
      val o = dj.addObject()
      o.put("name", name)
      o.put("content_b64",
        java.util.Base64.getEncoder.encodeToString(content))
    }
    val body = mapper.writeValueAsBytes(root)
    val conn = java.net.URI.create(endpoint).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setDoOutput(true)
      val out = conn.getOutputStream
      try { out.write(body); out.flush() } finally out.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300) {
        // Surface (and drain) the gateway's error body: the status
        // alone is diagnostic loss, and an undrained error stream
        // blocks connection reuse.
        val detail = Option(conn.getErrorStream).map { es =>
          try {
            val buf = new Array[Byte](512)
            val n = es.readNBytes(buf, 0, buf.length)
            while (es.read(buf) >= 0) {} // drain the remainder
            if (n <= 0) ""
            else ": " + new String(buf, 0, n,
              java.nio.charset.StandardCharsets.UTF_8)
          } finally es.close()
        }.getOrElse("")
        throw new java.io.IOException(
          s"extraction endpoint returned HTTP $code$detail")
      }
      val in = conn.getInputStream
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val rs = mapper.readTree(txt).get("results")
      if (rs == null || !rs.isArray) throw new java.io.IOException(
        s"malformed extraction response: ${txt.take(200)}")
      (0 until rs.size).map { i =>
        rs.get(i).fields().asScala.flatMap { e =>
          val v = e.getValue
          // JSON null = the gateway had no value — DROP the key so
          // BatchedRpcExtractor's "N/A" floor applies (asText() would
          // land the literal string "null"); object/array values are
          // malformed and THROW, per the class contract.
          if (v.isNull) None
          else if (v.isValueNode) Some(e.getKey -> v.asText())
          else throw new java.io.IOException(
            s"malformed extraction value for ${e.getKey}: " +
              v.toString.take(80))
        }.toMap
      }
    } finally conn.disconnect()
  }
}
