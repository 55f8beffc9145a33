package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Clean
import graft.plans.GraftFunctions

/** Native Catalyst expressions must be drop-in equivalent to the
  * composed-builtin forms they optimize. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val vectors = Seq(
    "$1,234.56", "€2 000", "£3,000", "¥500", "85%", "(100)", "($1,500.25)",
    "abc", "N/A", "---", "", "12a", "(abc)", " 42 ", "-12.5", "+3.25",
    "1e3", "1.5E-2", ".5", "5.", "()", "(", "$", "%%", "  ")

  test("ParseMessyNumber ≡ composed Clean.parseMessyNumber on vectors") {
    val df = vectors.toDF("v").select(
      Clean.parseMessyNumber(col("v")).as("composed"),
      GraftFunctions.parseMessyNumber(col("v")).as("native"))
    df.collect().zip(vectors).foreach { case (r, in) =>
      val c = if (r.isNullAt(0)) null else r.getDouble(0)
      val n = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(c == n, s"input <$in>: composed=$c native=$n")
    }
  }

  test("ParseMessyNumber ≡ composed on random garbage (property)") {
    val gens = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.chooseNum(-1e9, 1e9).map(d => f"$$$d%,.2f"),
      Gen.chooseNum(1, 999999).map(n => s"($n)"),
      Gen.chooseNum(0.0, 100.0).map(d => f"$d%.1f%%"))
    val samples = (0 until 400)
      .flatMap(i => gens.apply(Gen.Parameters.default, Seed(i.toLong)))
    val df = samples.toDF("v").select(
      Clean.parseMessyNumber(col("v")).as("composed"),
      GraftFunctions.parseMessyNumber(col("v")).as("native"))
    df.collect().zip(samples).foreach { case (r, in) =>
      val c = if (r.isNullAt(0)) null else r.getDouble(0)
      val n = if (r.isNullAt(1)) null else r.getDouble(1)
      assert(c == n, s"input <$in>: composed=$c native=$n")
    }
  }

  test("DotProductFloat ≡ interpreted HOF fold on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (a, x) => a + x)
    val rows = emb.select(
      hof.as("hof"),
      GraftFunctions.dotProductFloat(col("embedding"), col("embedding")).as("native"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"fold-order mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("DotLongWeights ≡ aggregate(zip_with) HOF chain, incl. null/len edges") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val w = Array(3L, -2L, 7L)
    val schema = StructType(Seq(StructField("x",
      ArrayType(LongType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(Seq(1L, 2L, 3L)),            // plain
      Row(Seq(-5L, 0L, 9L)),           // negatives
      Row(Seq(1L, null, 3L)),          // null element -> null
      Row(Seq(1L, 2L)),                // shorter than w -> null
      Row(Seq(1L, 2L, 3L, 4L)),        // longer than w -> null
      Row(null))                       // null array -> null
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val wLit = typedLit(w.toSeq)
    val hof = aggregate(zip_with(col("x"), wLit, (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val out = df.select(hof.as("hof"),
      GraftFunctions.dotLongWeights(col("x"), w).as("native")).collect()
    out.zipWithIndex.foreach { case (r, i) =>
      val h = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
      val n = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      assert(h == n, s"row $i: hof=$h native=$n")
    }
  }

  test("SQL registration: all three natives callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT parse_messy_number('($2,000.50)') AS a, " +
        "dot_product_float(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS b, " +
        "size(char_gram_hashes('hello', 3)) AS c").first()
    assert(r.getDouble(0) == -2000.5)
    assert(r.getDouble(1) == 9.0)
    assert(r.getInt(2) == 3, "5 chars, n=3 -> 3 grams")
    // gram width is part of the operator, not a per-row value
    val e = intercept[Exception] {
      spark.sql("SELECT char_gram_hashes(text, n_chars) FROM " +
        "parquet.`/root/testdata/sf0.001/documents.parquet`").collect()
    }
    assert(e.getMessage.contains("n must be a literal integer"), e.getMessage)
    // lsh_band_signs from SQL == the Column form on a real embedding.
    val lsh = spark.sql(
      "SELECT lsh_band_signs(embedding, 8, 8) AS s, embedding FROM " +
        "parquet.`/root/testdata/sf0.001/embeddings.parquet` LIMIT 3")
      .select(col("s"),
        GraftFunctions.lshBandSigns(col("embedding"), 8, 8).as("c"))
      .collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("native expression type errors are analysis-time, not runtime") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT parse_messy_number(array(1))").collect()
    }
    assert(e.getMessage.contains("parse_messy_number expects STRING")
      || e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
  }

  test("DotProductFloat: a null ELEMENT yields NULL, like the HOF form") {
    import spark.implicits._
    val df = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(1.0f))))
      .toDF("a", "b")
    val native = df.select(
      GraftFunctions.dotProductFloat(col("a"), col("b")).as("d")).first()
    assert(native.isNullAt(0),
      "null element must not be read as the zeroed slot (0.0)")
    val hof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d")
      .first()
    assert(hof.isNullAt(0), "HOF reference semantics: null propagates")
  }

  test("native doGenCode compiles via GenerateMutableProjection (no silent fallback)") {
    // Whole-stage codegen silently falls back to interpreted eval if the
    // generated Java fails to compile — correctness tests can't catch
    // that. GenerateMutableProjection has no fallback: a Janino error
    // throws here. Also pins CharGramHashes' edges: astral code points
    // count as ONE gram position (substr semantics), shorter-than-n
    // yields empty, null yields null.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val proj = GenerateMutableProjection.generate(Seq(
      graft.plans.CharGramHashes(BoundReference(0, StringType, nullable = true), 3),
      graft.plans.DotProductFloat(
        BoundReference(1, ArrayType(FloatType), nullable = true),
        BoundReference(1, ArrayType(FloatType), nullable = true)),
      graft.plans.ParseMessyNumber(BoundReference(0, StringType, nullable = true)),
      graft.plans.WordGramHashes(BoundReference(0, StringType, nullable = true), 2),
      graft.plans.CharGramHashes(BoundReference(0, StringType, nullable = true), 3,
        distinct = true),
      graft.plans.WordGramHashes(BoundReference(0, StringType, nullable = true), 1,
        distinct = true)))
    val vec = new GenericArrayData(Array(1.0f, 2.0f))
    val out = proj(InternalRow(UTF8String.fromString("a😀b😀c"), vec))
    assert(out.getArray(0).numElements() == 3, "5 code points, n=3 -> 3 grams")
    assert(out.getDouble(1) == 5.0)
    assert(out.isNullAt(2), "non-numeric string -> null parse")
    assert(out.getArray(3).numElements() == 0,
      "one token, w=2 -> no word grams")
    val short = proj(InternalRow(UTF8String.fromString("ab cd ef"), null))
    assert(short.getArray(0).numElements() == 6, "8 code points, n=3 -> 6 grams")
    assert(short.getArray(3).numElements() == 2, "3 tokens, w=2 -> 2 grams")
    val empty = proj(InternalRow(UTF8String.fromString("ab"), null)).getArray(0)
    assert(empty.numElements() == 0, "len < n -> empty gram array")
    assert(proj(InternalRow(null, null)).isNullAt(0), "null string -> null")
    assert(proj(InternalRow(null, null)).isNullAt(3), "null string -> null grams")
    val dup = proj(InternalRow(UTF8String.fromString("aaaa aaaa"), null))
    assert(dup.getArray(4).numElements() == 4,
      "9 cps 'aaaa aaaa', n=3 -> 7 grams, 4 distinct ('aaa','aa ','a a',' aa')")
    assert(dup.getArray(5).numElements() == 1, "two equal tokens, w=1 -> 1 distinct")
  }

  test("word_gram_hashes: SQL-registered, literal-w enforced, gram identity") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(word_gram_hashes('a b c d', 2)) AS n, " +
        "word_gram_hashes('x y', 2)[0] = word_gram_hashes('q x y', 2)[1] AS same, " +
        "word_gram_hashes('x y', 2)[0] = word_gram_hashes('x z', 2)[0] AS diff")
      .first()
    assert(r.getInt(0) == 3, "4 tokens, w=2 -> 3 grams")
    assert(r.getBoolean(1), "equal token sequences hash equal at any position")
    assert(!r.getBoolean(2), "different token sequences hash differently")
    val e = intercept[Exception] {
      spark.sql("SELECT word_gram_hashes(text, CAST(n_chars AS INT)) FROM " +
        "parquet.`/root/testdata/sf0.001/documents.parquet`").collect()
    }
    assert(e.getMessage.contains("n must be a literal integer"), e.getMessage)
  }

  test("fused-distinct gram hashers ≡ array_distinct(plain form) on real docs") {
    // Exact array equality INCLUDING order: both the fused dedup and
    // array_distinct keep first-occurrence order, so the fused form is
    // a drop-in for the composed one.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(
      array_distinct(GraftFunctions.charGramHashes(lower(col("text")), 8)).as("cc"),
      GraftFunctions.charGramHashesDistinct(lower(col("text")), 8).as("cn"),
      array_distinct(GraftFunctions.wordGramHashes(lower(col("text")), 3)).as("wc"),
      GraftFunctions.wordGramHashesDistinct(lower(col("text")), 3).as("wn"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), "char: fused ≠ array_distinct")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), "word: fused ≠ array_distinct")
    }
  }

  test("distinctLongs: first-occurrence order, zero handling, no-dup passthrough (property)") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val n = rnd.nextInt(50)
      // Small value domain forces duplicates; sprinkle zeros (the probe
      // table's empty sentinel — tracked out-of-band).
      val in = Array.fill(n)(if (rnd.nextInt(5) == 0) 0L
        else rnd.nextInt(20).toLong - 10L)
      val got = graft.plans.ExprHelpers.distinctLongs(in).toSeq
      assert(got == in.toSeq.distinct, s"input ${in.toSeq}")
    }
    val unique = Array(3L, 1L, 2L)
    assert(graft.plans.ExprHelpers.distinctLongs(unique) eq unique,
      "all-distinct input returns the same array (no copy)")
  }

  test("WordGrams ≡ interpreted transform/concat_ws grams on real docs + edges") {
    // The substring trick (a w-gram IS the text between token i's start
    // and token i+w-1's end, because split is on single space) must
    // reproduce the HOF form exactly — including empty tokens from
    // space runs and leading/trailing spaces.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(lower(col("text")).as("t"))
      .unionByName(Seq("a  b", " a b ", "", " ", "solo", "x y z")
        .toDF("t"))
    Seq(1, 2, 3).foreach { w =>
      val tks = split(col("t"), " ")
      val hof = when(size(tks) >= w,
        transform(sequence(lit(1), size(tks) - (w - 1)),
          i => concat_ws(" ", (0 until w).map(o => element_at(tks, i + o)): _*)))
        .otherwise(array().cast("array<string>"))
      docs.select(hof.as("h"),
        GraftFunctions.wordGrams(col("t"), w).as("n"))
        .collect().foreach { r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1),
            s"w=$w: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        }
    }
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT word_grams('a b c', 2) AS g").first()
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
  }

  test("SQL gram hashers accept a literal trailing distinct flag") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT size(char_gram_hashes('aaaa', 2)) AS plain, " +
        "size(char_gram_hashes('aaaa', 2, true)) AS dedup, " +
        "size(word_gram_hashes('a b a b a', 2, true)) AS wdedup").first()
    assert(r.getInt(0) == 3, "3 grams with multiplicity")
    assert(r.getInt(1) == 1, "one distinct gram")
    assert(r.getInt(2) == 2, "'a b' and 'b a' distinct grams")
    val e = intercept[Exception] {
      spark.sql("SELECT char_gram_hashes('ab', 2, doc_id % 2 = 0) FROM " +
        "parquet.`/root/testdata/sf0.001/documents.parquet`").collect()
    }
    assert(e.getMessage.contains("distinct must be a literal boolean"), e.getMessage)
  }

  test("ParseMessyNumber ≡ composed on Unicode whitespace (NBSP family)") {
    import spark.implicits._
    //   NBSP and   EM-space are NOT in Java-regex \s: both
    // forms must leave them in place and reject via the numeric guard.
    val inputs = Seq("1 2", "4 5", "1 2")
    val df = inputs.toDF("s")
    val composed = df.select(graft.functions.Clean.parseMessyNumber(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val native = df.select(GraftFunctions.parseMessyNumber(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(composed.toSeq == native.toSeq)
    assert(composed(0) == null && composed(1) == null,
      "Unicode spaces must NOT be stripped (regex \\s is ASCII)")
    assert(composed(2) == 12.0, "ASCII space IS stripped")
  }

  test("vertical tab (\\x0B) is NOT stripped — RE2 \\s alignment with the oracle") {
    import spark.implicits._
    // Java's \s includes \x0B; RE2's (DuckDB's) does not. All strip
    // forms are pinned to the RE2 set, so a vertical-tab-laced value
    // must reject (NULL) on native, composed, AND the oracle.
    // Interior \x0B, interior \t, \x0B before %, TRAILING \x0B and
    // LEADING \x01: the end-position cases pin SQL trim semantics —
    // Java's String.trim would strip any control <= U+0020 at the
    // ends and silently parse what both other engines reject.
    val df = Seq("12", "1\t2", "12%", "42", "\u000142", " 42 ")
      .toDF("s")
    val composed = df.select(graft.functions.Clean.parseMessyNumber(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    val native = df.select(GraftFunctions.parseMessyNumber(col("s")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(composed.toSeq == native.toSeq, "native ≡ composed on control chars")
    assert(composed(0) == null, "\\x0B must survive the strip and fail the guard")
    assert(composed(1) == 12.0, "\\t IS in the RE2 set")
    assert(composed(2) == null)
    assert(composed(3) == null, "trailing \\x0B is NOT trimmed (SQL trim = spaces only)")
    assert(composed(4) == null, "leading \\x01 is NOT trimmed")
    assert(composed(5) == 42.0, "spaces ARE trimmed")
  }

  test("sorted_longs_contain_any: hit/miss/empty-set/empty-array/null edges") {
    val df = Seq(Seq(1L, 5L), Seq(2L, 3L), Seq.empty[Long]).toDF("a")
    val hit = df.select(GraftFunctions
        .sortedLongsContainAny(col("a"), Array(5L, 9L)).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(hit == Seq(true, false, false))
    val emptySet = df.select(GraftFunctions
        .sortedLongsContainAny(col("a"), Array.empty[Long]).as("r"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(emptySet == Seq(false, false, false))
    val nullIn = spark.range(1).select(GraftFunctions.sortedLongsContainAny(
      lit(null).cast("array<bigint>"), Array(1L)).as("r")).collect()(0)
    assert(nullIn.isNullAt(0), "null array must yield null, not false")
  }

  test("misra_gries_keys: heavy keys survive every partitioning (MG guarantee)") {
    // 3 heavy keys at ~20% each inside a ~40%-unique tail; the n/(k+1)
    // bound (156 rows at n=10000, k=63) sits far under the 2000-row
    // heavies, so the guarantee must hold REGARDLESS of partitioning —
    // which is exactly what varying repartition() exercises (different
    // partial buffers, different merge orders).
    val df = spark.range(0, 10000).select(
      when(col("id") % 10 < 6,
          concat(lit("hot"), (col("id") % 3).cast("string")))
        .otherwise(concat(lit("cold"), col("id").cast("string"))).as("key"))
    for (parts <- Seq(1, 7, 32)) {
      val cands = df.repartition(parts)
        .agg(GraftFunctions.misraGriesKeys(col("key"), 63).as("c"))
        .select(explode(col("c")).as("k"))
        .collect().map(_.getString(0)).toSet
      assert(cands.size <= 63, s"sketch must keep <= k keys, got ${cands.size}")
      for (h <- Seq("hot0", "hot1", "hot2"))
        assert(cands.contains(h), s"heavy key $h lost at parts=$parts")
    }
    // Grouped form: per-group sketches stay independent.
    val grouped = df.withColumn("g", length(col("key")) <= 4)
      .groupBy("g").agg(GraftFunctions.misraGriesKeys(col("key"), 8).as("c"))
      .collect().map(r => r.getBoolean(0) -> r.getSeq[String](1).toSet).toMap
    assert(grouped(true) == Set("hot0", "hot1", "hot2"),
      "k >= #distinct group must be exact")
    // SQL registration path.
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("mg_in")
    try {
      val viaSql = spark.sql("SELECT misra_gries_keys(key, 63) FROM mg_in")
        .collect()(0).getSeq[String](0).toSet
      for (h <- Seq("hot0", "hot1", "hot2")) assert(viaSql.contains(h))
    } finally spark.catalog.dropTempView("mg_in")
  }

  test("top_k_by ≡ window row_number under every partitioning (incl. ties)") {
    import org.apache.spark.sql.expressions.Window
    // Scores drawn from a SMALL set so cross-group and in-group ties
    // are common — the tie-break (score DESC, id ASC) is the part a
    // heap bug would get wrong first.
    val df = spark.range(0, 3000).select(
      (col("id") % 7).as("g"),
      ((col("id") * 37 % 11).cast("double") / 2.0).as("score"),
      col("id").as("rid"))
    val viaWindow = df.withColumn("rnk",
        row_number().over(Window.partitionBy("g")
          .orderBy(col("score").desc, col("rid").asc)))
      .filter(col("rnk") <= 5)
      .select("g", "rnk", "rid", "score")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    for (parts <- Seq(1, 4, 13)) {
      val viaAgg = df.repartition(parts).groupBy("g")
        .agg(GraftFunctions.topKByScore(col("score"), col("rid"), 5).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("i", "e")))
        .select(col("g"), (col("i") + 1).as("rnk"), col("e.id"), col("e.score"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(viaAgg == viaWindow, s"parts=$parts: agg != window form")
    }
  }

  test("top_k_by: groups smaller than k, NULL and NaN inputs") {
    val df = Seq(
      (1L, Some(2.0), Some(10L)),
      (1L, Some(1.0), Some(11L)),
      (1L, None, Some(12L)),          // null score: skipped
      (1L, Some(3.0), None),          // null id: skipped
      (1L, Some(Double.NaN), Some(13L)), // NaN score: skipped
      (2L, Some(5.0), Some(20L)))
      .toDF("g", "score", "rid")
    val out = df.groupBy("g")
      .agg(GraftFunctions.topKByScore(col("score"), col("rid"), 4).as("top"))
      .select(col("g"), col("top.id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(10L, 11L), s"got ${out(1L)}")
    assert(out(2L) == Seq(20L))
    // SQL registration path.
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("tk_in")
    try {
      val viaSql = spark.sql(
        "SELECT top_k_by(score, rid, 1)[0].id FROM tk_in WHERE g = 1")
        .collect()(0).getLong(0)
      assert(viaSql == 10L)
    } finally spark.catalog.dropTempView("tk_in")
  }

  test("TopKHeap: random offers == sort-take reference; merge-order invariant") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 30) {
      val n = rnd.nextInt(200)
      val k = 1 + rnd.nextInt(12)
      // Small score domain → heavy ties; ids unique.
      val items = (0 until n).map(i => (rnd.nextInt(8).toDouble, i.toLong))
      val want = items.sortBy { case (s, id) => (-s, id) }.take(k)
      def drain(h: graft.plans.TopKHeap) =
        (0 until h.size).map(i => (h.scores(i), h.ids(i)))
          .sortBy { case (s, id) => (-s, id) }
      val direct = new graft.plans.TopKHeap(k)
      items.foreach { case (s, id) => direct.offer(s, id) }
      assert(drain(direct) == want, s"trial=$trial direct")
      // Partition into random chunks, heap each, merge in shuffled
      // order — the keep-set must not depend on merge order.
      val chunks = rnd.shuffle(items).grouped(1 + rnd.nextInt(20)).toSeq
      val merged = new graft.plans.TopKHeap(k)
      rnd.shuffle(chunks).foreach { c =>
        val h = new graft.plans.TopKHeap(k)
        c.foreach { case (s, id) => h.offer(s, id) }
        (0 until h.size).foreach(i => merged.offer(h.scores(i), h.ids(i)))
      }
      assert(drain(merged) == want, s"trial=$trial merged")
    }
  }

  test("TopKByScore serialize/deserialize roundtrips the heap state") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = graft.plans.TopKByScore(Literal(1.0), Literal(1L), 5)
    val h = new graft.plans.TopKHeap(5)
    Seq((3.5, 1L), (2.0, 2L), (3.5, 0L), (9.9, 7L), (1.0, 4L), (8.8, 5L))
      .foreach { case (s, id) => h.offer(s, id) }
    val back = agg.deserialize(agg.serialize(h))
    def drain(x: graft.plans.TopKHeap) =
      (0 until x.size).map(i => (x.scores(i), x.ids(i))).sorted
    assert(drain(back) == drain(h))
    val empty = agg.deserialize(agg.serialize(new graft.plans.TopKHeap(5)))
    assert(empty.size == 0)
  }

  test("bloom filter: no false negatives across the parameter grid") {
    import graft.plans.ExprHelpers
    val rnd = new scala.util.Random(99)
    for (bpk <- Seq(1, 8, 24); k <- Seq(1, 4, 9); n <- Seq(3, 2000)) {
      val keys = Array.fill(n)(rnd.nextLong())
      val bits = ExprHelpers.bloomBuild(keys, bpk, k)
      keys.foreach(x => assert(ExprHelpers.bloomHit(x, bits, k),
        s"false negative at bpk=$bpk k=$k n=$n"))
    }
  }

  test("bloom filter: no false negatives, bounded false positives") {
    import graft.plans.ExprHelpers
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 10, 1000, 50000)) {
      val keys = Array.fill(n)(rnd.nextLong())
      val bits = ExprHelpers.bloomBuild(keys, bitsPerKey = 12, numHashes = 4)
      assert((bits.length & (bits.length - 1)) == 0, "bit count must be 2^k")
      keys.foreach(k => assert(ExprHelpers.bloomHit(k, bits, 4),
        s"false negative at n=$n — bloom contract broken"))
      val keySet = keys.toSet
      val probes = Array.fill(20000)(rnd.nextLong()).filterNot(keySet)
      val fp = probes.count(ExprHelpers.bloomHit(_, bits, 4)).toDouble / probes.length
      // 12 bits/key, 4 hashes ⇒ ~0.5% expected; 5% is a 10x guard band.
      assert(fp < 0.05, s"false-positive rate $fp at n=$n")
    }
  }

  test("BloomLongsContainAny: superset of the exact probe; composition exact") {
    import graft.plans.ExprHelpers
    val rnd = new scala.util.Random(7)
    val refSet = Array.fill(500)(rnd.nextLong() & 0xFFFFL) // dense → real overlaps
    java.util.Arrays.sort(refSet)
    val sorted = refSet.distinct.sorted
    val bloom = graft.plans.Bloom(ExprHelpers.bloomBuild(sorted, 12, 4), 4)
    val rows = (0 until 300).map(i =>
      (i.toLong, Seq.fill(5)(rnd.nextLong() & 0xFFFFL)))
    val df = rows.toDF("rid", "arr")
      .select(col("rid"),
        GraftFunctions.sortedLongsContainAny(col("arr"), sorted).as("exact"),
        GraftFunctions.bloomLongsContainAny(col("arr"), bloom).as("bloom"))
    val got = df.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    got.foreach { case (rid, exact, bloom) =>
      assert(!exact || bloom, s"row $rid: exact hit missed by bloom (false negative)")
    }
    // The two-phase composition (bloom gate AND exact refine) is exact.
    val composed = df.select(col("rid"), (col("bloom") && col("exact")).as("c"),
        col("exact"))
      .collect().forall(r => r.getBoolean(1) == r.getBoolean(2))
    assert(composed)
    val nullIn = spark.range(1).select(GraftFunctions.bloomLongsContainAny(
      lit(null).cast("array<bigint>"), bloom).as("r")).collect()(0)
    assert(nullIn.isNullAt(0), "null array must yield null, not false")
  }

  // ANN native expressions vs their HOF twins: the twins exercise
  // Spark's own transform/array_min/array_sort/aggregate machinery,
  // so agreement on real embeddings is independent evidence that the
  // fused loops preserve the exact-integer (dist, id) contract.

  private def annQuantized = {
    import graft.operators.Kmeans
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), Kmeans.quantize(col("embedding")).as("qv"))
  }

  test("NearestCellId / NearestCellIds ≡ HOF argmin/ranking on real embeddings") {
    import graft.operators.Kmeans
    val cents = Kmeans.train(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), 8, 2)
    val rows = annQuantized.select(col("vec_id"),
        Kmeans.cellIdExpr(col("qv"), cents).as("native"),
        Kmeans.cellIdExprHof(col("qv"), cents).as("hof"),
        Kmeans.nearestCellsExpr(col("qv"), cents, 3).as("native_p"),
        Kmeans.nearestCellsExprHof(col("qv"), cents, 3).as("hof_p"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"vec ${r.getLong(0)}: cid mismatch")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4),
        s"vec ${r.getLong(0)}: probe ranking mismatch")
    }
    // probes > k clamps to k, exactly like the HOF slice
    val clamped = annQuantized.limit(5).select(
      Kmeans.nearestCellsExpr(col("qv"), cents, 99).as("p")).collect()
    clamped.foreach(r => assert(r.getSeq[Int](0).length == cents.length))
  }

  test("ANN kernels ≡ HOF twins on random in-range vectors; overflow fails loudly") {
    import graft.operators.{Kmeans, Pq}
    // In-range: random vectors far beyond the quantize domain but
    // below overflow (|x| < 2^30 → dist sums < 2^63) must rank
    // bit-identically to the HOF chains.
    val rnd = new scala.util.Random(41)
    def vec(d: Int): Array[Long] =
      Array.fill(d)((rnd.nextLong() >> 34) + rnd.nextInt(100) - 50)
    val d = 8
    val cents = Array.fill(6)(vec(d))
    val cbs = Array.fill(2)(Array.fill(4)(vec(d / 2)))
    val rows = (0 until 200).map(i => (i.toLong, vec(d).toSeq))
    val df = rows.toDF("vec_id", "qv")
      .select(col("vec_id"), col("qv").cast("array<bigint>").as("qv"))
    val got = df.select(col("vec_id"),
        Kmeans.cellIdExpr(col("qv"), cents).as("n_cid"),
        Kmeans.cellIdExprHof(col("qv"), cents).as("h_cid"),
        Kmeans.nearestCellsExpr(col("qv"), cents, 4).as("n_p"),
        Kmeans.nearestCellsExprHof(col("qv"), cents, 4).as("h_p"),
        Pq.encodeExpr(col("qv"), cbs).as("n_codes"),
        Pq.encodeExprHof(col("qv"), cbs).as("h_codes"))
      .collect()
    assert(got.length == 200)
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"vec ${r.getLong(0)}: argmin diverged")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4), s"vec ${r.getLong(0)}: ranking diverged")
      assert(r.getSeq[Int](5) == r.getSeq[Int](6), s"vec ${r.getLong(0)}: codes diverged")
    }
    // ADC agreement on in-range LUTs.
    val luts = (0 until 20).map(i =>
      (i, Seq(Seq.fill(4)(math.abs(rnd.nextLong()) >> 4),
        Seq.fill(4)(math.abs(rnd.nextLong()) >> 4))))
      .toDF("lid", "lut")
      .select(col("lid"), col("lut").cast("array<array<bigint>>").as("lut"))
    val codesDf = (0 until 50).map(i =>
      (i, Seq(rnd.nextInt(4), rnd.nextInt(4)))).toDF("cid", "codes")
      .select(col("cid"), col("codes").cast("array<int>").as("codes"))
    val adc = codesDf.crossJoin(broadcast(luts))
      .select(Pq.adcDistExpr(col("codes"), col("lut")).as("n"),
        Pq.adcDistExprHof(col("codes"), col("lut")).as("h"))
      .collect()
    assert(adc.nonEmpty)
    adc.foreach(r => assert(r.getLong(0) == r.getLong(1), "adc diverged"))
    // OVERFLOW fails loudly (the HOF chain throws under Spark's
    // default ANSI mode; the fused kernels must never silently wrap
    // an argmin instead — Math.*Exact in ExprHelpers).
    val big = Seq((0L, Seq.fill(d)(Long.MaxValue / 2))).toDF("vec_id", "qv")
      .select(col("qv").cast("array<bigint>").as("qv"))
    val ex = intercept[Exception] {
      big.select(Kmeans.cellIdExpr(col("qv"), cents)).collect()
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(rootCauses(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $ex")
  }

  test("PqEncode / AdcDistance ≡ HOF twins on real embeddings") {
    import graft.operators.{Kmeans, Pq}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cbs = Pq.train(emb, m = 4, k = 8, iters = 2)
    val q = annQuantized
    val enc = q.select(col("vec_id"),
        Pq.encodeExpr(col("qv"), cbs).as("native"),
        Pq.encodeExprHof(col("qv"), cbs).as("hof"))
      .collect()
    assert(enc.nonEmpty)
    enc.foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2),
      s"vec ${r.getLong(0)}: codes mismatch"))
    // ADC: every (codes, lut) pairing from two sample queries
    val luts = q.limit(2).select(Pq.adcLutExpr(col("qv"), cbs).as("lut"))
    val dists = q.select(Pq.encodeExpr(col("qv"), cbs).as("codes"))
      .crossJoin(broadcast(luts))
      .select(Pq.adcDistExpr(col("codes"), col("lut")).as("native"),
        Pq.adcDistExprHof(col("codes"), col("lut")).as("hof"))
      .collect()
    assert(dists.nonEmpty)
    dists.foreach(r => assert(r.getLong(0) == r.getLong(1), "adc mismatch"))
    // null-propagation edges mirror the HOF form
    val edgeDf = spark.sql(
      """SELECT array(0, 9) AS codes, array(array(1L, 2L), array(3L)) AS lut
         UNION ALL SELECT array(0), array(array(1L, 2L), array(3L))
         UNION ALL SELECT CAST(NULL AS ARRAY<INT>), array(array(1L))""")
      .select(Pq.adcDistExpr(col("codes"), col("lut")).as("n")).collect()
    assert(edgeDf.forall(_.isNullAt(0)),
      "out-of-range code / length mismatch / null codes must all yield NULL")
  }
}
