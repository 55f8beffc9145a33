package graft.extract

import java.util.concurrent.{ConcurrentHashMap, Semaphore}

/** One remote call covering a BATCH of documents — the engine-side
  * batching analog of the reference's one-LLM-call-per-file
  * (reference main.py:694-713: Gemini keyed extraction, its single
  * biggest latency component). Implementations wrap whatever RPC
  * client production uses; the contract is positional: result(i) is
  * the key→value map for docs(i), with missing keys as "N/A"
  * (main.py:697 prompt contract). A throw (network error, timeout,
  * rate-limit rejection) is handled by [[BatchedRpcExtractor]]'s
  * retry/degrade loop — clients should NOT retry internally.
  */
trait ExtractionClient extends Serializable {
  def extractBatch(docs: Seq[(String, Array[Byte])],
                   keys: Seq[String]): Seq[Map[String, String]]
}

/** Production-shaped extractor skeleton: batches documents per
  * partition ([[batchSize]] docs per RPC), bounds in-flight calls per
  * executor JVM ([[maxInFlightPerExecutor]] — a shared semaphore, so
  * 32 concurrent tasks cannot open 32 connections to the model
  * endpoint), retries failed calls with exponential backoff
  * ([[maxAttempts]], [[baseBackoffMs]]), and after exhausting retries
  * degrades the batch to all-"N/A" maps — the same log-and-continue
  * the reference applies per file (main.py:757-759), so one flaky
  * endpoint window can never fail a micro-batch.
  *
  * `sleep` is injectable so tests exercise the backoff schedule
  * without wall-clock waits. The single-document [[discover]] path
  * (O4 schema discovery) rides the same retry loop as a batch of one.
  */
final class BatchedRpcExtractor(
    client: ExtractionClient,
    override val batchSize: Int = 8,
    maxAttempts: Int = 3,
    baseBackoffMs: Long = 100L,
    maxInFlightPerExecutor: Int = 4,
    sleep: Long => Unit = Thread.sleep) extends Extractor {
  require(batchSize > 0 && maxAttempts > 0 && maxInFlightPerExecutor > 0)

  // Tasks deserialize their own copy of this extractor, so the
  // in-flight bound must live OUTSIDE the instance: one semaphore per
  // (logical extractor, JVM), shared by every task on the executor.
  private val semaphoreId = s"graft-extract-${client.getClass.getName}-$maxInFlightPerExecutor"

  override def discover(fileName: String, content: Array[Byte]): Map[String, String] =
    // headOption, not head: an empty client response degrades to the
    // empty map exactly like a failed call — same contract as
    // extractAll's short-response padding.
    callWithRetry(Seq(fileName -> content), Nil)
      .flatMap(_.headOption)
      .getOrElse(Map.empty)

  override def extract(fileName: String, content: Array[Byte],
                       keys: Seq[String]): Map[String, String] =
    extractAll(Seq(fileName -> content), keys).head

  override def extractAll(docs: Seq[(String, Array[Byte])],
                          keys: Seq[String]): Seq[Map[String, String]] =
    callWithRetry(docs, keys) match {
      case Some(maps) =>
        // Positional contract plus the "N/A" floor: a client returning
        // a short/laconic response still yields one complete map per doc.
        docs.indices.map { i =>
          val m = if (i < maps.size) maps(i) else Map.empty[String, String]
          keys.map(k => k -> m.getOrElse(k, "N/A")).toMap
        }
      case None => docs.map(_ => keys.map(_ -> "N/A").toMap)
    }

  /** Up to maxAttempts tries with exponential backoff (base, 2×base,
    * 4×base, …); None once exhausted. The semaphore is held only for
    * the duration of the remote call, not the backoff sleep. */
  private def callWithRetry(docs: Seq[(String, Array[Byte])],
                            keys: Seq[String]): Option[Seq[Map[String, String]]] = {
    val sem = BatchedRpcExtractor.semaphoreFor(semaphoreId, maxInFlightPerExecutor)
    var attempt = 0
    while (attempt < maxAttempts) {
      if (attempt > 0) sleep(baseBackoffMs << (attempt - 1))
      sem.acquire()
      try return Some(client.extractBatch(docs, keys))
      catch { case _: Exception => () }
      finally sem.release()
      attempt += 1
    }
    None
  }
}

object BatchedRpcExtractor {
  private val semaphores = new ConcurrentHashMap[String, Semaphore]()
  private def semaphoreFor(id: String, permits: Int): Semaphore =
    semaphores.computeIfAbsent(id, _ => new Semaphore(permits))
}
