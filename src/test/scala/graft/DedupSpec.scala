package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Behavior tests for the approximate dedup/similarity operators that
  * have no DuckDB oracle (engine-specific hash functions). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("native rolling-hash grams ≡ materialized substr grams on the corpus") {
    // The rolling hash must induce the SAME per-doc distinct-gram
    // structure as hashing each materialized substring: equal gram
    // multiset sizes, equal distinct counts per doc (i.e. no extra
    // collisions on real text), and grams equal-as-strings must land
    // equal-as-hashes by construction. Full PAIR equality vs exact
    // string Jaccard is the q_near_dup_char DuckDB oracle's job.
    val native = docs.select(col("doc_id"),
        explode(graft.plans.GraftFunctions.charGramHashes(
          lower(col("text")), 20)).as("s"))
    val substr = Dedup.charShingleRows(docs, 20)
      .select(col("doc_id"), xxhash64(col("s")).as("s"))
    def profile(df: org.apache.spark.sql.DataFrame) = {
      val total = df.count()
      val perDoc = df.dropDuplicates("doc_id", "s").groupBy("doc_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (total, perDoc)
    }
    val (nTot, nPer) = profile(native)
    val (sTot, sPer) = profile(substr)
    assert(nTot == sTot, "gram multiset sizes must match")
    assert(nPer == sPer, "per-doc distinct-gram counts must match (no extra collisions)")
  }

  test("native word-gram hashes ≡ windowed string shingles on the corpus") {
    // The map-only WordGramHashes path must induce the SAME per-doc
    // gram structure as the window-lead string shingles: equal gram
    // multiset sizes and equal per-doc distinct counts (no extra
    // collisions on real text). Hash VALUES differ by design; every
    // consumer only compares hashes to hashes.
    for (w <- Seq(1, 2, 5)) {
      val native = Dedup.hashedShingleRows(docs, w)
      val strings = Dedup.shingleRows(docs, w)
        .select(col("doc_id"), xxhash64(col("s")).as("s"))
      def profile(df: org.apache.spark.sql.DataFrame) = {
        val total = df.count()
        val perDoc = df.dropDuplicates("doc_id", "s").groupBy("doc_id").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (total, perDoc)
      }
      val (nTot, nPer) = profile(native)
      val (sTot, sPer) = profile(strings)
      assert(nTot == sTot, s"w=$w: gram multiset sizes must match")
      assert(nPer == sPer, s"w=$w: per-doc distinct-gram counts must match")
    }
  }

  test("word-gram hashes: multi-space/trailing-space/short-doc edges match split semantics") {
    import spark.implicits._
    // split(text, " ") keeps empty tokens (doubled + trailing spaces);
    // the native tokenizer must agree on gram COUNTS for those edges.
    val edge = Seq((1L, "a  b c "), (2L, "one"), (3L, ""), (4L, "x y"))
      .toDF("doc_id", "text")
    for (w <- Seq(1, 2, 3)) {
      val nCounts = Dedup.hashedShingleRows(edge, w)
        .groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sCounts = Dedup.shingleRows(edge, w)
        .groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(nCounts == sCounts, s"w=$w: $nCounts vs $sCounts")
    }
  }

  test("word-gram hashes ≡ windowed shingles on random space-heavy strings (property)") {
    import spark.implicits._
    // Adversarial tokenization inputs: random strings over a tiny
    // alphabet with dense spaces (runs, leading/trailing, empties).
    // The native tokenizer must agree with split(text, " ") on gram
    // counts AND distinct counts for every width.
    val rnd = new scala.util.Random(11)
    val alphabet = "ab é "   // weighted toward spaces; one non-ASCII
    val cases = (1 to 200).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = cases.toDF("doc_id", "text")
    for (w <- Seq(1, 2, 3)) {
      def profile(d: org.apache.spark.sql.DataFrame) = {
        val all = d.groupBy("doc_id").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val distinct = d.dropDuplicates("doc_id", "s").groupBy("doc_id").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (all, distinct)
      }
      val n = profile(Dedup.hashedShingleRows(df, w))
      val s = profile(Dedup.shingleRows(df, w)
        .select(col("doc_id"), xxhash64(col("s")).as("s")))
      assert(n == s, s"w=$w mismatch")
    }
  }

  test("word-gram token hashes separate the NUL/empty family (seeded state)") {
    import spark.implicits._
    // With a zero-seeded token state, '', '\u0000' and leading-NUL
    // tokens all hashed alike — distinct grams compared equal
    // DETERMINISTICALLY (not the documented probabilistic trade).
    val docs = Seq(
      (1L, "foo \u0000 bar"), (2L, "foo  bar"),   // NUL token vs empty token
      (3L, "foo \u0000x bar"), (4L, "foo x bar")) // leading-NUL token vs plain
      .toDF("doc_id", "text")
    val grams = Dedup.hashedShingleRows(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(grams(1L) != grams(2L), "'\\u0000' and '' tokens must hash apart")
    assert(grams(3L) != grams(4L), "'\\u0000x' and 'x' tokens must hash apart")
  }

  test("cosineLshPairs: finds planted near-dups, exact-refined, full recall regime") {
    // The synthetic corpus has NO high-cosine pairs (max ~0.6), so
    // plant them: vectors are unit-norm, so x + 0.05*U(-0.5,0.5) per
    // dim gives |noise| ~ 0.115 -> cosine ~ 0.993 twins. With 8x8
    // bands, p = 1-theta/pi ~ 0.96 per bit -> expected recall
    // ~0.99998; assert >= 0.95 to stay robust to the corpus draw.
    // Precision is 1.0 by construction (in-join exact-cosine refine)
    // — verified against the native dot product directly.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val noise = (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      // Spark's `/` promotes to double — cast back so the union stays
      // array<float> (the native dot product's input contract).
      (x + lit(0.05) * (pmod(xxhash64(col("vec_id") * 1000L + i), lit(1000L))
        .cast("double") / 1000.0 - 0.5)).cast("float")
    val twins = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), noise).as("embedding"))
    val corpus = emb.unionByName(twins)
    val reg = new graft.operators.CacheRegistry
    try {
      val pairs = Dedup.cosineLshPairs(corpus, threshold = 0.95, registry = reg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val planted = pairs.filter { case (i, j, _) => j == i + 1000000L }
      val nVecs = emb.count()
      assert(planted.length >= (nVecs * 0.95).toInt,
        s"recall too low: ${planted.length}/$nVecs planted twins found")
      assert(pairs.forall(_._3 >= 0.95), "refine must enforce the exact threshold")
      // Spot-check the reported cosine against an independent path.
      val (i0, j0, c0) = planted.head
      val byId = corpus.filter(col("vec_id").isin(i0, j0))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      val (a, b) = (byId(i0), byId(j0))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val exp = dot / (math.sqrt(a.map(x => x.toDouble * x).sum)
        * math.sqrt(b.map(x => x.toDouble * x).sum))
      assert(math.abs(c0 - exp) < 1e-5, s"cos mismatch: $c0 vs $exp")
    } finally reg.releaseAll()
  }

  test("shingleRows w=1 yields unigrams; k%bands misuse is rejected") {
    val tiny = Seq((1L, "a b a")).toDF("doc_id", "text")
    val uni = Dedup.shingleRows(tiny, 1).collect().map(_.getString(1)).toSeq
    assert(uni == Seq("a", "b", "a"), "w=1 must be unigram multiplicity, not a crash")
    val e = intercept[IllegalArgumentException] {
      Dedup.minHashCandidates(docs, k = 32, bands = 5)
    }
    assert(e.getMessage.contains("divide evenly"))
  }

  test("minhash LSH recalls every exact Jaccard>=0.8 pair (planted dups)") {
    val exact = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minHashCandidates(docs)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val missed = exact -- cand
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${exact.size} exact pairs")
  }

  test("minhash estimated Jaccard is close to exact on planted dups") {
    val exact = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8)
      .select($"i", $"j", $"jaccard")
    val est = Dedup.minHashCandidates(docs)
      .select($"i".as("i2"), $"j".as("j2"), $"est_jaccard")
    val joined = exact.join(est, $"i" === $"i2" && $"j" === $"j2")
      .select(abs($"jaccard" - $"est_jaccard").as("err"))
      .agg(max("err")).first().getDouble(0)
    // 32 hashes → sd ≈ sqrt(J(1-J)/32) ≈ 0.07 at J=0.8; 0.35 is ~5 sd
    assert(joined < 0.35, s"max |exact-est| = $joined")
  }

  test("simhash: identical texts collide, near-identical are close") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exactDup = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exactDup.exists(_._3 == 0L), s"identical texts must have hamming 0: ${pairs.mkString(",")}")
    val nearDup = pairs.find(p => p._1 <= 2L && p._3 > 0L || (p._1, p._2) == (1L, 3L) || (p._1, p._2) == (2L, 3L))
    assert(nearDup.isDefined || pairs.length >= 1)
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L),
      "unrelated text must not be within hamming 3")
  }

  test("simhash pairs on corpus are subset-consistent with jaccard dups") {
    // Planted near-dups (very high token overlap) should dominate the
    // hamming<=3 simhash pairs; sanity: every simhash pair has
    // nontrivial 5-shingle jaccard.
    val sim = Dedup.simHashPairs(docs, maxHamming = 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jacAll = Dedup.jaccardPairs(docs, w = 5, threshold = 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    val overlap = sim.intersect(jacAll).size.toDouble / sim.size
    // SimHash over a ~40-word vocabulary has some random collisions at
    // hamming<=3; the planted dups must still dominate.
    assert(overlap >= 0.7, s"only ${overlap * 100}% of simhash pairs have jaccard>=0.5")
  }

  test("ivf topk: candidates share the query cell and scores match brute force") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // Cell assignment of every vector, computed independently.
    val cells = emb.select(col("vec_id"),
        Similarity.cellId(expr("transform(embedding, x -> CAST(x AS DOUBLE))")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 8, k = 5)
      .select("query_id", "cand_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, c, _) =>
      assert(cells(q) == cells(c), s"IVF returned cand $c outside query $q's cell")
    }
    // Same (query,cand) pair must score identically under brute force —
    // IVF only restricts the candidate set, never changes the metric.
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 8, k = 1000)
      .select("query_id", "cand_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { case (q, c, s) =>
      assert(brute((q, c)) == s, s"score mismatch for ($q,$c)")
    }
  }

  test("connectedComponents: chains, multi-round convergence, empty input") {
    // Two components with structure min-label propagation must cross:
    // a 6-node chain (diameter 5 -> needs several rounds) whose min id
    // sits at one END, and a triangle. Pair list uses i < j.
    val pairs = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), // chain, min=10
      (20L, 21L), (20L, 22L), (21L, 22L)                           // triangle, min=20
    ).toDF("i", "j")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (10L to 15L).map(_ -> 10L).toMap ++ (20L to 22L).map(_ -> 20L).toMap
    assert(got == want)

    // Reversed chain: min id at the FAR end relative to edge order.
    val rev = Seq((1L, 9L), (9L, 17L), (17L, 25L), (25L, 33L)).toDF("i", "j")
    val gotRev = Dedup.connectedComponents(rev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotRev == Map(1L -> 1L, 9L -> 1L, 17L -> 1L, 25L -> 1L, 33L -> 1L))

    // A round budget too small for the graph must throw, not return a
    // partial merge. Star contraction roughly halves a chain per
    // round, so ONE round cannot finish a 64-node chain.
    intercept[IllegalStateException] {
      Dedup.connectedComponents(
        (0L until 64L).sliding(2).map(s => (s.head, s.last)).toSeq
          .toDF("i", "j"), maxIter = 1)
    }

    // Empty pair set: empty result with the contract schema.
    val empty = Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("i", "j"))
    assert(empty.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(empty.count() == 0)

    // Self-loops: every endpoint of the input gets a label — a doc
    // appearing ONLY as (i, i) labels itself; one that also has real
    // edges keeps its component label.
    val selfy = Dedup.connectedComponents(
      Seq((7L, 7L), (3L, 4L), (4L, 4L)).toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(selfy == Map(7L -> 7L, 3L -> 3L, 4L -> 3L), selfy.toString)

    // Self-loops only (no real edges): all singletons.
    val onlySelf = Dedup.connectedComponents(
      Seq((9L, 9L), (2L, 2L)).toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(onlySelf == Map(9L -> 9L, 2L -> 2L), onlySelf.toString)
  }

  test("connectedComponents contracts a 3000-link chain in O(log^2 n) rounds") {
    // The adversarial shape for plain min-label propagation: a single
    // chain with the min id at one end needs ~diameter rounds there
    // (3000 >> the default maxIter=50, it would throw). Star
    // contraction must finish inside the default budget and label the
    // whole chain with its minimum id. Ids are shuffled so the chain
    // ORDER doesn't coincide with the id order (7919 is prime, so
    // multiplication mod 30011 is a bijection on [0, 30011)).
    val n = 3000
    def id(k: Int): Long = (k.toLong * 7919L) % 30011L
    val chain = (0 until n - 1).map(k => (id(k), id(k + 1))).toDF("i", "j")
    val lab = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minId = (0 until n).map(id).min
    assert(lab.size == n, s"expected $n labeled nodes, got ${lab.size}")
    assert(lab.values.forall(_ == minId),
      s"chain must collapse to one cluster rooted at $minId")
  }

  test("connectedComponents matches union-find on random graphs") {
    // Property check against a trusted driver-side union-find, across
    // densities (sparse forest -> near-clique) with deterministic
    // pseudo-random edges.
    for ((nNodes, nEdges, seed) <- Seq((200, 80, 1L), (200, 200, 2L),
        (200, 800, 3L), (50, 600, 4L))) {
      val rnd = new scala.util.Random(seed)
      val es = (0 until nEdges).map { _ =>
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = es.flatMap { case (a, b) => Seq(a, b) }.distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(es.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"mismatch at (n=$nNodes, e=$nEdges, seed=$seed)")
    }
  }

  test("jaccardRefinePairs on minhash candidates equals the exact pair set") {
    // The q_minhash_cluster contract: banding recall over exact >= 0.8
    // pairs is 1 on this corpus AND the refine kills every
    // sub-threshold candidate — so refined(candidates) == exact,
    // values included.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val reg = new graft.operators.CacheRegistry
    try {
      val exact = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8,
          registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val cand = Dedup.minHashCandidates(docs, minEst = 0.5).select("i", "j")
      val refined = Dedup.jaccardRefinePairs(docs, cand).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, "corpus must contain planted near-dups")
      assert(refined == exact,
        s"refined != exact: extra=${(refined -- exact).take(3)} " +
          s"missing=${(exact -- refined).take(3)}")
    } finally reg.releaseAll()
  }

  test("charBandedDupPairs equals the exact char-Jaccard pair set (q_charhash_cluster contract)") {
    // The char twin of the jaccardRefinePairs pin: char-gram banding
    // recall over exact >= 0.8 char-20-gram pairs is 1 on this corpus
    // AND the exact refine kills every sub-threshold candidate, so the
    // banded path's output EQUALS the exact pipeline's — values
    // included. This is what makes q_charhash_cluster oracle-valid.
    val reg = new graft.operators.CacheRegistry
    try {
      val exact = Dedup.charJaccardPairs(docs, n = 20, threshold = 0.8,
          registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val banded = Dedup.charBandedDupPairs(docs, n = 20, threshold = 0.8,
          registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, "corpus must contain planted char near-dups")
      assert(banded == exact,
        s"banded != exact: extra=${(banded -- exact).take(3)} " +
          s"missing=${(exact -- banded).take(3)}")
    } finally reg.releaseAll()
  }

  test("fused CharMinHashSigs equals the compositional k-min form, value for value") {
    // The char signer must reproduce min over (pmod(gram,P)*a+b mod P)
    // of the DISTINCT char-gram hashes (min is idempotent, so the
    // non-distinct stream folds to the same minima) — computed here
    // compositionally from charGramHashesDistinct + higher-order
    // array ops, a fully independent path through different
    // expressions. Also exercises the SQL registration.
    val P = Dedup.MinHashP
    val coefs = Dedup.minHashCoefs(8)
    val gramArr = graft.plans.GraftFunctions.charGramHashesDistinct(
      lower(col("text")), 20)
    val refCols = coefs.map { case (a, b) =>
      array_min(transform(gramArr,
        g => pmod(pmod(g, lit(P)) * a + b, lit(P))))
    }
    val ref = docs.select(col("doc_id"), array(refCols: _*).as("sig"))
      .filter(size(gramArr) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val reg = new graft.operators.CacheRegistry
    try {
      val fused = Dedup.charMinHashSignatures(docs, n = 20, k = 8,
          registry = reg)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused.nonEmpty && fused == ref,
        s"fused != reference: sizes ${fused.size}/${ref.size}")
      graft.plans.GraftFunctions.register(spark)
      docs.createOrReplaceTempView("cmh_docs")
      val sql = spark.sql(
        """SELECT doc_id, char_minhash_sigs(lower(text), 20, 8) AS sig
           FROM cmh_docs WHERE char_minhash_sigs(lower(text), 20, 8) IS NOT NULL""")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sql == ref, "SQL-registered form diverges")
    } finally {
      reg.releaseAll()
      spark.catalog.dropTempView("cmh_docs")
      ()
    }
  }

  test("prefixFilterPairs equals the exact pair set, values included") {
    // The prefix-filtering principle promises EXACT recall (smallest
    // shared gram sits in both prefixes — proof in the scaladoc) and
    // the refine is exact precision — so the result must equal
    // jaccardPairs bit-for-bit, jaccard values included. Checked on
    // the corpus (planted near-dups) AND on a crafted fixture where
    // prefixes are as short as possible (sets of 5 grams → prefix 2).
    val reg = new graft.operators.CacheRegistry
    try {
      val exact = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8,
          registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pf = Dedup.prefixFilterPairs(docs, w = 5, registry = reg)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, "corpus must contain planted near-dups")
      assert(pf == exact,
        s"prefix != exact: extra=${(pf -- exact).take(3)} " +
          s"missing=${(exact -- pf).take(3)}")
      // Crafted: identical 9-word docs (5 grams, prefix length 2) and
      // a disjoint decoy — the twin must survive, the decoy must not.
      import spark.implicits._
      val crafted = Seq(
        (1L, "a b c d e f g h i"),
        (2L, "a b c d e f g h i"),
        (3L, "q r s t u v w x y")).toDF("doc_id", "text")
      val got = Dedup.prefixFilterPairs(crafted, w = 5, registry = reg)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == Set((1L, 2L)), s"crafted case got ${got.toSet}")
    } finally reg.releaseAll()
  }

  test("containmentPairs: finds doc-inside-doc that jaccard misses; dominates jaccard pairwise") {
    val reg = new graft.operators.CacheRegistry
    try {
      import spark.implicits._
      // A's 5 grams all sit inside B (A = B's prefix), but the union
      // is twice the intersection: containment 1.0, jaccard 0.5 — the
      // inclusion mode the asymmetric score exists for. C is disjoint.
      val crafted = Seq(
        (1L, "a b c d e f g h i"),
        (2L, "a b c d e f g h i j k l m n o p q r"),
        (3L, "q1 r1 s1 t1 u1 v1 w1 x1 y1")).toDF("doc_id", "text")
      val cont = Dedup.containmentPairs(crafted, w = 5, threshold = 0.9,
          registry = reg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(cont.toSeq == Seq((1L, 2L, 1.0)), s"got ${cont.toSeq}")
      val jac = Dedup.jaccardPairs(crafted, w = 5, threshold = 0.8,
          registry = reg)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(jac.isEmpty,
        s"jaccard at 0.8 must miss the inclusion pair, got ${jac.toSeq}")
      // Pairwise dominance on the corpus: containment >= jaccard for
      // every pair, so at the SAME threshold the jaccard pair set is a
      // subset of the containment pair set.
      val jc = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8,
          registry = reg)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val cc = Dedup.containmentPairs(docs, w = 5, threshold = 0.8,
          registry = reg)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(jc.nonEmpty, "corpus must contain planted near-dups")
      assert(jc.subsetOf(cc),
        s"containment must dominate jaccard: missing ${(jc -- cc).take(3)}")
    } finally reg.releaseAll()
  }

  test("minhash clusters absorb every exact-Jaccard cluster (q_minhash_cluster contract)") {
    // The end-to-end LSH dedup decision must never split a true
    // near-dup cluster: for every exact Jaccard >= 0.8 pair, both docs
    // land in ONE minhash cluster. (The reverse need not hold — LSH
    // candidates at est >= 0.5 may merge more, that's its documented
    // recall/precision trade.)
    val exact = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    val lab = Dedup.connectedComponents(
      Dedup.minHashCandidates(docs, minEst = 0.5).select("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (i, j) =>
      assert(lab.contains(i) && lab.contains(j) && lab(i) == lab(j),
        s"exact pair ($i,$j) not co-clustered by the minhash path")
    }
  }

  test("semdedup LSH keep-set merges planted twins (q_semdedup_lsh contract)") {
    // Same planted-twin construction as the cosineLshPairs test, but
    // through the full keep-set composition the query runs: LSH pairs
    // (16-bit bands x 4) -> connected components -> every vector
    // labeled, singletons keep themselves. Expected twin recall at
    // cos ~0.993 with 16x4 banding: 1-(1-p^16)^4 ~ 0.95; assert >= 0.85.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val noise = (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      (x + lit(0.05) * (pmod(xxhash64(col("vec_id") * 1000L + i), lit(1000L))
        .cast("double") / 1000.0 - 0.5)).cast("float")
    val twins = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), noise).as("embedding"))
    val corpus = emb.unionByName(twins)
    val reg = new graft.operators.CacheRegistry
    try {
      val pairs = Dedup.cosineLshPairs(corpus, threshold = 0.9,
        bandBits = 16, numBands = 4, registry = reg).select("i", "j")
      val cc = Dedup.connectedComponents(pairs)
        .withColumnRenamed("doc_id", "vec_id")
      val keep = corpus.select("vec_id").join(cc, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val ids = emb.select("vec_id").collect().map(_.getLong(0))
      assert(keep.size == 2 * ids.length, "keep-set must label EVERY vector")
      val merged = ids.filter(v => keep(v) == keep(v + 1000000L))
      assert(merged.length >= (ids.length * 0.85).toInt,
        s"twin merge recall too low: ${merged.length}/${ids.length}")
      // Original ids are below the twin ids, so every merged cluster's
      // canonical (min id) is the original: the twin is the one dropped.
      merged.foreach { v =>
        assert(keep(v + 1000000L) <= v,
          "canonical must be the min id of the cluster")
      }
    } finally reg.releaseAll()
  }

  test("fused MinHashSigs expression equals the aggregate signature form, value for value") {
    // The map-only signer must be bit-identical to the explode +
    // groupBy + k·min reference — same docs present (short docs
    // absent from both), same k minima per doc. Also exercises the
    // SQL registration of minhash_sigs.
    val reg = new graft.operators.CacheRegistry
    try {
      def collectSigs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val fused = collectSigs(Dedup.minHashSignatures(docs, registry = reg))
      val agg = collectSigs(Dedup.minHashSignaturesViaAgg(docs))
      assert(fused.nonEmpty && fused == agg,
        s"fused != agg: sizes ${fused.size}/${agg.size}")
      graft.plans.GraftFunctions.register(spark)
      docs.createOrReplaceTempView("mh_docs")
      val sql = collectSigs(spark.sql(
        """SELECT doc_id, minhash_sigs(lower(text), 5, 32) AS sig
           FROM mh_docs WHERE minhash_sigs(lower(text), 5, 32) IS NOT NULL"""))
      assert(sql == agg, "SQL-registered form diverges")
    } finally {
      reg.releaseAll()
      spark.catalog.dropTempView("mh_docs")
      ()
    }
  }

  test("fused SimHashBands expression equals the aggregate vote form, band for band") {
    // The scan-side signer must reproduce the explode + groupBy +
    // 64·sum() reference exactly: same XXH64 token hashes (byte-level
    // space split == split(text,' ')), same ±1 votes, same band bits.
    val reg = new graft.operators.CacheRegistry
    try {
      val fused = docs.select(col("doc_id"),
          graft.plans.GraftFunctions.simHashBands(lower(col("text"))).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val agg = Dedup.simHashBandsViaAgg(docs)
        .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2)))
        .toMap
      assert(fused.nonEmpty && fused == agg,
        s"fused != agg, e.g. ${(fused.toSet -- agg.toSet).take(3)}")
      // Edge family: empty string (one empty token), multi-space runs.
      import spark.implicits._
      val edge = Seq((1L, ""), (2L, "a  b "), (3L, "a b")).toDF("doc_id", "text")
      val ef = edge.select(col("doc_id"),
          graft.plans.GraftFunctions.simHashBands(lower(col("text"))).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ea = Dedup.simHashBandsViaAgg(edge)
        .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2)))
        .toMap
      assert(ef == ea, s"edge cases diverge: $ef vs $ea")
    } finally reg.releaseAll()
  }

  test("fused signers equal their aggregate forms on random space-heavy strings (property)") {
    // Same adversarial family as the gram property test: dense space
    // runs, empties, non-ASCII — the byte-level tokenizers inside
    // MinHashSigs/SimHashBands must agree with the exploded split()
    // forms on every input, not just the corpus.
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alphabet = "ab é "
    val cases = (1 to 200).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = cases.toDF("doc_id", "text")
    val simFused = df.select(col("doc_id"),
        graft.plans.GraftFunctions.simHashBands(lower(col("text"))).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val simAgg = Dedup.simHashBandsViaAgg(df)
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2))).toMap
    assert(simFused == simAgg, "SimHash fused != agg on random strings")
    for (w <- Seq(1, 2, 3)) {
      val reg = new graft.operators.CacheRegistry
      try {
        val fused = Dedup.minHashSignatures(df, w = w, k = 8, registry = reg)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val agg = Dedup.minHashSignaturesViaAgg(df, w = w, k = 8)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(fused == agg, s"MinHash fused != agg at w=$w")
      } finally reg.releaseAll()
    }
  }

  test("incrementalDupPairs: cross pairs only, equals the cross-split slice of exact pairs") {
    // The q_incremental_dedup contract: delta-vs-base banding finds
    // exactly the exact-Jaccard pairs that CROSS the split (recall-1
    // banding + exact refine), emits them delta-side-first, and never
    // generates a delta×delta or base×base pair.
    val reg = new graft.operators.CacheRegistry
    try {
      val isDelta = (id: Long) => id % 5 == 4
      val full = Dedup.jaccardPairs(docs, w = 5, threshold = 0.8,
          registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val wantCross = full
        .filter { case (i, j, _) => isDelta(i) != isDelta(j) }
        .map { case (i, j, v) =>
          if (isDelta(i)) (i, j, v) else (j, i, v) }.toSet
      val got = Dedup.incrementalDupPairs(
          docs.filter(!pmod(col("doc_id"), lit(5)).equalTo(4)),
          docs.filter(pmod(col("doc_id"), lit(5)) === 4),
          threshold = 0.8, registry = reg).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(wantCross.nonEmpty, "fixture must have cross-split dups")
      assert(got == wantCross,
        s"extra=${(got -- wantCross).take(3)} missing=${(wantCross -- got).take(3)}")
      got.foreach { case (i, j, _) =>
        assert(isDelta(i) && !isDelta(j),
          s"pair ($i,$j) is not delta-first/base-second")
      }
    } finally reg.releaseAll()
  }

  test("native LSH band signing == aggregate twin, bit-identical per band") {
    // The map-only LshBandSigns kernel must reproduce the
    // posexplode -> per-bit conditional sum -> bit-pack pipeline
    // exactly: same seed-42 xxhash64 coefficients, same pos-order
    // double summation, same `> 0` sign test.
    import org.apache.spark.sql.functions.col
    val emb = SparkTestBase.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    for ((bandBits, numBands) <- Seq((8, 8), (16, 4), (4, 16), (1, 64))) {
      val cols = Seq(col("vec_id")) ++
        (0 until numBands).map(j => col(s"band$j"))
      val native = graft.operators.Dedup
        .lshBands(emb, bandBits, numBands).select(cols: _*).collect()
        .map(r => r.getLong(0) -> (1 until numBands + 1).map(r.getLong))
        .toMap
      val agg = graft.operators.Dedup
        .lshBandsAgg(emb, bandBits, numBands).select(cols: _*).collect()
        .map(r => r.getLong(0) -> (1 until numBands + 1).map(r.getLong))
        .toMap
      assert(native.nonEmpty && native.keySet == agg.keySet)
      native.foreach { case (id, bands) =>
        assert(bands == agg(id),
          s"($bandBits,$numBands) vec $id: $bands != ${agg(id)}")
      }
    }
    // The signing is now a pure projection: no Exchange anywhere in
    // its plan (the aggregate twin pays a groupBy shuffle + a join).
    val plan = graft.operators.Dedup.lshBands(emb, 8, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"map-only signing must not shuffle:\n$plan")
    // Null elements are SKIPPED, exactly like sum-over-null in the
    // aggregate twin (not read as zeroed slots, not nulling the row).
    import SparkTestBase.spark.implicits._
    val withNull = Seq(
      (1L, Seq(Some(1.5f), None, Some(-2.0f))),
      (2L, Seq(Some(1.5f), Some(0.0f), Some(-2.0f))))
      .toDF("vec_id", "embedding")
    val n = graft.operators.Dedup.lshBands(withNull, 8, 8)
      .select(col("vec_id"), col("band0"), col("band7")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val a = graft.operators.Dedup.lshBandsAgg(withNull, 8, 8)
      .select(col("vec_id"), col("band0"), col("band7")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(n == a, s"null-element divergence: $n vs $a")
  }
}
