package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key equi-joins.
  *
  * AQE's skew-join split handles most cases at runtime
  * (spark.sql.adaptive.skewJoin.enabled, on by default); this explicit
  * salted join is for the pathological tail AQE can't fix — e.g. one
  * tenant owning half the fact table when joining fact⋈dim on
  * tenant_id, where a single shuffle partition would otherwise receive
  * half of 100 TB.
  *
  * Shape: the fact side gets a salt in [0, salts); the dim side is
  * replicated `salts`× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over `salts` shuffle
  * partitions. Dim replication cost = |dim|·salts rows — use for
  * bounded dims only (the same precondition as broadcasting, with a
  * far lower memory bound).
  */
object SkewJoin {

  /** Inner/left equi-join of fact⋈dim on `key`, salted `salts` ways.
    * The salt only affects row routing, never the result: any
    * fact-side salt value meets its dim row because the dim side
    * carries all salt values.
    *
    * Content-hash salt limits (both inherent to determinism):
    *  - EXACT duplicate fact rows all hash to the same salt, so a hot
    *    key made of byte-identical copies of one row still lands on
    *    one partition. Such a table has no row-content entropy to
    *    spread by; if that shape is real, add a stable discriminator
    *    column upstream (e.g. a source offset) before salting.
    *  - MapType columns are EXCLUDED from the hash input (xxhash64
    *    refuses maps under default config — their iteration order is
    *    undefined, the same reason a map must not influence routing).
    *    A fact row whose only distinguishing column is a map therefore
    *    degrades to the duplicate-row case above. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // The salt MUST be a pure function of row content: anything seeded
    // by partition/task identity (monotonically_increasing_id,
    // spark_partition_id, rand) changes when a map task is recomputed
    // after a fetch failure, routing the recomputed rows to different
    // shuffle partitions and silently dropping/duplicating join rows
    // (the SPARK-23207 class of bug — routine at 100 TB scale).
    // Hashing every (hashable) fact column keeps the spread uniform
    // even when the join key itself is a single hot value.
    val hashable = fact.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    require(hashable.nonEmpty,
      "saltedEquiJoin: every fact column is map-typed — no deterministic salt input")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(hashable: _*), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop(replicated(key)).drop("_salt")
  }

  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
      case _ => false
    }
}
