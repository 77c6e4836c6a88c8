package graft
import org.apache.spark.sql.functions._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(docs.select(count(lit(1))).write.format("noop").mode("overwrite").save())
    // stage 1: shingle strings + md5 only
    val tok = docs.select(col("doc_id").as("id"),
      posexplode(graft.functions.TextFunctions.tokens(col("text"))).as(Seq("_p", "_t")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("_p"))
    val parts = (0 until 3).map(k => if (k == 0) col("_t") else lead(col("_t"), k).over(w))
    val sh = tok.select(col("id"),
        when(parts.last.isNotNull, concat_ws(" ", parts: _*)).as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("_h", pmod(graft.functions.TextFunctions.md5Hash60(col("s")), lit(1000000007L)))
    time("shingles+md5 cold")(sh.write.format("noop").mode("overwrite").save())
    // stage 2: 32-min agg on top
    val p = graft.functions.VectorFunctions.MinhashPrime
    val mins = (0 until 32).map { i =>
      val (a, b) = graft.functions.VectorFunctions.minhashCoeffs(i)
      min(pmod(col("_h") * a + b, lit(p))).as(s"_m$i")
    }
    val sigs = sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until 32).map(i => col(s"_m$i")): _*).as("sig"))
    time("+ 32-min agg cold")(sigs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
