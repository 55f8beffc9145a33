package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively, built scalably from
  * relational primitives (SURVEY.md custom-op preference (a): compose
  * existing ops — no custom SparkPlan needed).
  *
  * == As-of join ==
  * For each left row, the single right row with the greatest
  * right-time ≤ left-time within the same key. The naive form is an
  * inequality join (quadratic blow-up per key); [[asofJoin]] instead
  * uses the union-and-carry technique: tag both inputs, union, and a
  * single (key, time)-ordered window carries the last-seen right row
  * forward onto each left row. Cost: ONE shuffle on the key, zero
  * pair explosion — at 100 TB this behaves exactly like a sort-merge
  * join stage. (DuckDB's native ASOF JOIN is the oracle.)
  *
  * == Range join ==
  * Pairs (l, r) with the same key and r.time ∈ [l.start, l.end]. A
  * raw inequality join degenerates to per-key nested loops;
  * [[rangeJoin]] buckets time at the interval granularity and
  * equi-joins on (key, bucket) — each left interval lands in
  * ceil(len/bucket)+1 buckets, each right point in exactly one, and
  * the exact predicate filters inside the join stage. Bucket width
  * trades replication against candidate fan-in (Flink/interval-join
  * style bucketing).
  */
object TemporalJoins {

  /** As-of join: latest `right` row at-or-before each left row's time,
    * per key. Left columns keep their names; right value columns come
    * back `asof_`-prefixed (NULL when no prior right row exists).
    *
    * `valueCols` are the right columns to carry (must not collide with
    * key/time names). Ties on time: the right row sorts BEFORE the
    * left row with equal time (inclusive ≤), matching ASOF JOIN.
    *
    * Skew limit: the union shuffles on the KEY only, so one hot key
    * (a single user with 10⁹ events) lands its entire timeline on one
    * window partition — per-key volume is bounded by what one task can
    * sort. Mitigation when a key is genuinely that hot: pre-bucket
    * time per key (split the timeline into coarse ranges, run the
    * carry per (key, range), then stitch the first row of each range
    * against the previous range's last carried value — one extra
    * narrow pass). Not built in because the composed form covers every
    * observed workload; see TemporalJoinsSpec's hot-key test for the
    * single-partition behavior at probe scale. */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Tag and align the two inputs on a common shape.
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select(keyCols.map(col) ++ Seq(col("_t"), col("_side")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_v_$c")): _*)
    // One shuffle: window ordered so a right row at time T precedes a
    // left row at the same T (side 0 < side 1) — inclusive as-of.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select((keyCols.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        valueCols.map(c =>
          last(when(col("_side") === 0, col(s"_v_$c")), ignoreNulls = true)
            .over(w).as(s"asof_$c")): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Range join: right rows whose `rightTime` falls inside the left
    * row's [startCol, endCol], same key. `bucket` is the bucketing
    * granularity as a Column-level integer divisor over epoch seconds
    * (e.g. 86400 for day buckets); choose it near the typical interval
    * length.
    *
    * Replication bound: each left interval is replicated into
    * ceil(len/bucketSeconds)+1 bucket rows. A mis-chosen divisor (1 s
    * buckets under year-long intervals) silently multiplies the left
    * side by ~10⁷ — so the fan-out is GUARDED: any interval spanning
    * more than `maxBucketsPerInterval` buckets fails the job with an
    * explicit error naming the interval, instead of quietly exploding
    * the shuffle. Pick bucketSeconds near the typical interval length
    * (fan-out ≈ 2) and raise the guard only deliberately. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                startCol: String, endCol: String, rightTime: String,
                bucketSeconds: Long,
                maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val lb = unix_timestamp(col(startCol)) / bucketSeconds
    val ub = unix_timestamp(col(endCol)) / bucketSeconds
    // Replicate each interval into every bucket it overlaps — unless
    // the fan-out breaches the guard, which is a data/config error
    // surfaced eagerly (raise_error evaluates inside the scan stage).
    val span = floor(ub).cast("long") - floor(lb).cast("long") + 1L
    val buckets = when(span <= maxBucketsPerInterval,
      sequence(floor(lb).cast("long"), floor(ub).cast("long")))
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval ["), col(startCol).cast("string"),
        lit(", "), col(endCol).cast("string"),
        lit(s"] spans "), span.cast("string"),
        lit(s" buckets of ${bucketSeconds}s > maxBucketsPerInterval=" +
          s"$maxBucketsPerInterval; choose a coarser bucketSeconds"))))
    val lBucketed = left.withColumn("_bucket", explode(buckets))
    val rBucketed = right.withColumn("_bucket",
      floor(unix_timestamp(col(rightTime)) / bucketSeconds).cast("long"))
    val keyCond = keyCols.map(k => lBucketed(k) === rBucketed(k))
      .reduceOption(_ && _).getOrElse(lit(true))
    val joined = lBucketed.join(rBucketed,
      keyCond && (lBucketed("_bucket") === rBucketed("_bucket"))
        && rBucketed(rightTime) >= lBucketed(startCol)
        && rBucketed(rightTime) <= lBucketed(endCol))
    (keyCols.map(rBucketed(_)) ++ Seq(lBucketed("_bucket"), rBucketed("_bucket")))
      .foldLeft(joined)(_ drop _)
  }
}
