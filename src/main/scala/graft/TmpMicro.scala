package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs.count()
    def time(label: String)(f: => Unit): Unit = {
      val reps = (0 until 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"MICRO $label: min=${reps.min}%.3f")
    }
    val tks = split(lower(col("text")), " ")
    val bigramArr = when(size(tks) >= 2,
      transform(sequence(lit(1), size(tks) - 1),
        i => concat_ws(" ", element_at(tks, i), element_at(tks, i + 1))))
      .otherwise(array().cast("array<string>"))
    time("A explode(split) count tokens") {
      docs.select(explode(tks).as("t")).groupBy("t").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("B explode(bigram HOF) count") {
      docs.select(explode(bigramArr).as("b")).groupBy("b").count()
        .write.format("noop").mode("overwrite").save()
    }
    time("C bigram counts >=5 join uni twice") {
      val uni = docs.select(explode(tks).as("tok")).groupBy("tok")
        .agg(count(lit(1)).as("c"))
      val bi = docs.select(explode(bigramArr).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_ab")).filter(col("c_ab") >= 5)
      val parts = split(col("bigram"), " ")
      bi.withColumn("a", element_at(parts, 1)).withColumn("b", element_at(parts, 2))
        .join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
        .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
