package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the naive n² cross join. Exact dedup
  * is a hash groupBy on a 128-bit fingerprint (shuffles 16-byte keys, not
  * bodies). MinHash/SimHash/embedding near-dup all bucket first (LSH bands /
  * hash prefix / coarse quantization) so the candidate-pair join shuffles
  * only same-bucket groups; the expensive verification runs per candidate
  * pair, whose count is ~linear in corpus size for realistic dup rates.
  */
object Dedup {

  /** Exact dedup: group by content fingerprint; keep the smallest id as the
    * canonical representative. Returns (fingerprint, keep_id, n_dups).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup: surviving rows only (one per distinct normalized text). */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val keep = exactGroups(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Candidate near-dup pairs via MinHash + banded LSH:
    * shingle → minhash signature → band keys → explode → self-join on band
    * → distinct (idA < idB) pairs with estimated Jaccard ≥ `threshold`.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
                      idCol: String = "doc_id", shingleSize: Int = 3,
                      nHashes: Int = 32, nBands: Int = 8,
                      threshold: Double = 0.6): DataFrame = {
    val rowsPerBand = nHashes / nBands
    val sigs = docs
      .select(col(idCol).as("id"),
        VectorFunctions.minhashSignature(
          TextFunctions.shingles(col(textCol), shingleSize), nHashes).as("sig"))
      .withColumn("band",
        explode(VectorFunctions.minhashBands(col("sig"), nBands, rowsPerBand)))
    val a = sigs.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash; bucket on the top
    * `prefixBits` bits (cheap blocking); verify by Hamming distance ≤
    * `maxHamming` within buckets. A production variant would use several
    * rotated prefixes; one prefix demonstrates the plan shape.
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", prefixBits: Int = 12,
                   maxHamming: Int = 3): DataFrame = {
    val hashed = docs.select(
      col(idCol).as("id"),
      VectorFunctions.simhash(TextFunctions.tokens(col(textCol))).as("sh"))
      .withColumn("bucket", shiftrightunsigned(col("sh"), 64 - prefixBits))
    val a = hashed.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = hashed.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", VectorFunctions.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram Jaccard similarity for candidate pairs produced by any
    * blocking stage: explode distinct shingles, join on shingle, count
    * intersections, compute |A∩B| / (|A| + |B| − |A∩B|). Only same-shingle
    * groups shuffle — never the full cross product.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", n: Int = 3,
                        threshold: Double = 0.8): DataFrame = {
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
    val a = exploded.select(col("s"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = exploded.select(col("s"), col("id").as("id_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-duplicate pairs: LSH-signature blocking + exact cosine
    * verification above `threshold`.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, vecCol: String = "embedding",
                            idCol: String = "vec_id", dim: Int = 64,
                            nBits: Int = 8, threshold: Double = 0.95): DataFrame = {
    val sig = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshSignature(col(vecCol), nBits, dim).as("bucket"))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
