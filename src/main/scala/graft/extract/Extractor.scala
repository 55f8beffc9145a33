package graft.extract

/** Document field extraction — the engine's stand-in for the
  * reference's LLM calls (reference main.py:435-459 schema discovery,
  * main.py:694-713 keyed extraction; Gemini 2.0 Flash, temp 0.0).
  *
  * The LLM cannot sit in the correctness path (nondeterministic,
  * networked — SURVEY.md §7.4), so extraction is a trait: production
  * can plug an RPC-backed implementation (batched per partition, one
  * call per document batch, mirroring the reference's one-call-per-file
  * shape), while tests and the e2e pipeline use
  * [[DeterministicExtractor]].
  */
trait Extractor extends Serializable {

  /** O4 (schema discovery): all key→example pairs found in a "master"
    * document. */
  def discover(fileName: String, content: Array[Byte]): Map[String, String]

  /** O5 (keyed extraction): values for the requested keys; missing
    * keys map to "N/A" (the reference's prompt contract,
    * main.py:697, 734). */
  def extract(fileName: String, content: Array[Byte],
              keys: Seq[String]): Map[String, String] =
    discover(fileName, content)
      .pipe(found => keys.map(k => k -> found.getOrElse(k, "N/A")).toMap)

  /** Preferred number of documents per [[extractAll]] call — the
    * ingest pipeline groups each partition's rows into batches of this
    * size before calling down. */
  def batchSize: Int = 8

  /** Batch entry point the engine actually drives (one call per batch
    * of documents per partition). The default degrades gracefully
    * per document: a throwing extraction yields that document's
    * all-"N/A" map (the reference logs-and-continues per file,
    * main.py:757-759) without poisoning its batch. RPC-backed
    * implementations override this with one remote call per batch. */
  def extractAll(docs: Seq[(String, Array[Byte])],
                 keys: Seq[String]): Seq[Map[String, String]] =
    docs.map { case (name, content) =>
      try extract(name, content, keys)
      catch { case _: Exception => keys.map(_ -> "N/A").toMap }
    }

  private implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}

/** Deterministic extractor: documents are `key = value` lines (UTF-8).
  * Quotes around values are stripped; blank lines and lines without
  * '=' are ignored. This gives the e2e tests full control over the
  * extracted map while keeping every other pipeline stage (admission,
  * casts, schema evolution, append, archive) production-real. */
object DeterministicExtractor extends Extractor {
  override def discover(fileName: String, content: Array[Byte]): Map[String, String] =
    new String(content, java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && l.contains("="))
      .map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }
      .toMap
}
