package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{BatchedRpcExtractor, DeterministicExtractor, ExtractionClient}

/** Unit coverage of the batched-RPC extractor skeleton: batching
  * shape, retry/backoff schedule, degradation to "N/A" maps, and the
  * positional-contract floor. The fake clients here stand where a
  * production LLM client would be injected. */
class ExtractorSpec extends AnyFunSuite {

  /** Client that answers like DeterministicExtractor but fails the
    * first `failures` calls with a retryable error, counting calls and
    * recording batch sizes. */
  private class FlakyClient(failures: Int) extends ExtractionClient {
    val calls = new AtomicInteger(0)
    @volatile var batchSizes: List[Int] = Nil
    override def extractBatch(docs: Seq[(String, Array[Byte])],
                              keys: Seq[String]): Seq[Map[String, String]] = {
      val n = calls.incrementAndGet()
      synchronized { batchSizes = batchSizes :+ docs.size }
      if (n <= failures) throw new RuntimeException(s"transient failure $n")
      docs.map { case (name, content) =>
        DeterministicExtractor.extract(name, content, keys)
      }
    }
  }

  private def doc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("extractAll batches per chunk and maps results positionally") {
    val client = new FlakyClient(failures = 0)
    val ex = new BatchedRpcExtractor(client, batchSize = 4, sleep = _ => ())
    val docs = (1 to 10).map(i => s"f$i.pdf" -> doc(s"Amount=$i"))
    // The ingest pipeline chunks by ex.batchSize; mirror it here.
    val out = docs.grouped(ex.batchSize).flatMap(b => ex.extractAll(b, Seq("Amount", "Missing"))).toSeq
    assert(client.batchSizes == List(4, 4, 2))
    assert(out.size == 10)
    assert(out.head == Map("Amount" -> "1", "Missing" -> "N/A"))
    assert(out.last == Map("Amount" -> "10", "Missing" -> "N/A"))
  }

  test("transient failures retry with exponential backoff and succeed") {
    val client = new FlakyClient(failures = 2)
    var sleeps: List[Long] = Nil
    val ex = new BatchedRpcExtractor(client, batchSize = 8, maxAttempts = 3,
      baseBackoffMs = 100, sleep = ms => sleeps = sleeps :+ ms)
    val out = ex.extractAll(Seq("a.pdf" -> doc("K=v")), Seq("K"))
    assert(out == Seq(Map("K" -> "v")))
    assert(client.calls.get() == 3)
    assert(sleeps == List(100L, 200L), "backoff should double per attempt")
  }

  test("persistent failure degrades the batch to all-N/A after maxAttempts") {
    val client = new FlakyClient(failures = Int.MaxValue)
    val ex = new BatchedRpcExtractor(client, batchSize = 8, maxAttempts = 3,
      sleep = _ => ())
    val out = ex.extractAll(
      Seq("a.pdf" -> doc("K=v"), "b.pdf" -> doc("K=w")), Seq("K", "L"))
    assert(out == Seq(Map("K" -> "N/A", "L" -> "N/A"),
      Map("K" -> "N/A", "L" -> "N/A")))
    assert(client.calls.get() == 3, "one batch = maxAttempts calls, not per-doc")
  }

  test("short or incomplete client responses are padded to the contract") {
    val client = new ExtractionClient {
      override def extractBatch(docs: Seq[(String, Array[Byte])],
                                keys: Seq[String]): Seq[Map[String, String]] =
        Seq(Map("K" -> "only-first-doc-and-missing-L")) // 1 map for 2 docs
    }
    val ex = new BatchedRpcExtractor(client, sleep = _ => ())
    val out = ex.extractAll(
      Seq("a.pdf" -> doc(""), "b.pdf" -> doc("")), Seq("K", "L"))
    assert(out == Seq(
      Map("K" -> "only-first-doc-and-missing-L", "L" -> "N/A"),
      Map("K" -> "N/A", "L" -> "N/A")))
  }

  test("single-doc discover/extract ride the same retry loop") {
    val client = new FlakyClient(failures = 1)
    val ex = new BatchedRpcExtractor(client, maxAttempts = 2, sleep = _ => ())
    assert(ex.extract("a.pdf", doc("Amount=$5"), Seq("Amount")) ==
      Map("Amount" -> "$5"))
    assert(client.calls.get() == 2)
  }
}
