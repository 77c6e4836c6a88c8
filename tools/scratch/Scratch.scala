package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, TimeFunctions}

/** Throwaway micro-benchmark (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warm")(li.groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save())

    // q26 with the projection barrier
    val unit = when(col("l_orderkey") % 3 === 0, "ps")
      .when(col("l_orderkey") % 3 === 1, "ns").otherwise("us")
    val str = when(col("l_orderkey") % 11 === 0, "off")
      .otherwise(concat((col("l_linenumber") * 10).cast("string"), unit))
    time("q26 new") {
      li.select(str.as("_s"))
        .select(TimeFunctions.strToTime(col("_s")).as("delay"))
        .groupBy(col("delay")).agg(count(lit(1)).as("n"))
        .orderBy("delay")
        .write.format("noop").mode("overwrite").save()
    }

    // q28 with non-regex basename/removeExtension
    val path = concat(lit("/data/run"), (col("l_orderkey") % 10).cast("string"),
      lit("/img_"), col("l_orderkey").cast("string"), lit(".edf.gz"))
    val nDistinct = countDistinct(col("l_orderkey"))
    time("q28 new") {
      li.select((col("l_orderkey") % 10).as("run"), col("l_orderkey"),
          TimeFunctions.basename(path).as("base"))
        .select(col("run"), col("l_orderkey"),
          TimeFunctions.removeExtension(col("base")).as("stem"))
        .groupBy(col("run"))
        .agg(count(lit(1)).as("n"), nDistinct.as("n_base"),
          nDistinct.as("n_stem"), min(col("stem")).as("first_stem"))
        .orderBy("run")
        .write.format("noop").mode("overwrite").save()
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("q37 current") {
      graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    // persist-sh variant, inlined
    time("q37 persist sh") {
      val sh0 = docs.select(col("doc_id").as("id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("_p", "_t")))
        .select(col("id"), col("_p"), xxhash64(col("_t")).as("_h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("_p"))
      val leads = (0 until 3).map(k =>
        if (k == 0) col("_h") else lead(col("_h"), k).over(w))
      val sh = sh0.select(col("id"),
          when(leads.last.isNotNull, xxhash64(leads: _*)).as("s"))
        .filter(col("s").isNotNull).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val threshold = 0.8
        val df = sh.groupBy(col("s")).agg(count(lit(1)).as("_df"))
        val byRarity = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("_df"), col("s"))
        val docSize = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
        val ranked = sh.join(df, Seq("s"))
          .withColumn("_rn", row_number().over(byRarity))
          .withColumn("n_sh", count(lit(1)).over(docSize))
        val prefixLen = floor(col("n_sh") * (1.0 - threshold) + 1e-9).cast("int") + 1
        val prefix = ranked.filter(col("_rn") <= prefixLen)
          .select(col("s"), col("id"), col("_rn"), col("n_sh"))
        val alpha = ceil((col("n_a") + col("n_b")) * (threshold / (1.0 + threshold)) - 1e-9)
        val ubound = lit(1) + least(col("n_a") - col("r_a"), col("n_b") - col("r_b"))
        val cand = prefix.select(col("s"), col("id").as("id_a"),
            col("_rn").as("r_a"), col("n_sh").as("n_a"))
          .join(prefix.select(col("s"), col("id").as("id_b"),
            col("_rn").as("r_b"), col("n_sh").as("n_b")), Seq("s"))
          .filter(col("id_a") < col("id_b"))
          .filter(col("n_b") >= col("n_a") * threshold - 1e-9 &&
                  col("n_a") >= col("n_b") * threshold - 1e-9)
          .filter(ubound >= alpha)
          .select(col("id_a"), col("id_b"))
          .distinct()
        val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
        val inter = cand
          .join(sh.select(col("id").as("id_a"), col("s")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("s")), Seq("id_b", "s"))
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
          .join(sizes.select(col("id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
          .withColumn("jaccard",
            col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .filter(col("jaccard") >= threshold)
          .select("id_a", "id_b", "jaccard")
          .write.format("noop").mode("overwrite").save()
      } finally sh.unpersist()
    }
    spark.stop()
  }
}
