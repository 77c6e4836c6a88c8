package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns, plus the hashing
  * primitives for near-duplicate detection (MinHash, SimHash, random-
  * hyperplane LSH). No UDFs anywhere; the per-pair kernels (dot / sqL2 /
  * cosine / minhashJaccard / the LSH sign bits) are native codegen'd
  * Catalyst expressions ([[VectorExpressions]]) — the former
  * `aggregate`/`zip_with` higher-order forms are CodegenFallback in Spark
  * (interpreted lambda walk + a zipped array allocation per row), which
  * dominated the candidate-verification stages of the similarity family.
  * The lambda twins ([[dotLambda]] etc.) are kept for the FunctionsSpec
  * bit-identity pins.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.PlanExec.{column => ofExpr, expression}

  /** Cast to array<double> (codegen'd Cast — the HOF `transform` twin of
    * this is interpreted). No-op on array<double> inputs.
    */
  private def asDoubleArr(a: Column): Column = a.cast("array<double>")

  /** Elementwise product then sum — dot(a, b). Arrays are cast to double
    * first so float inputs accumulate in double (deterministic across
    * engines). Fused one-pass codegen kernel; ascending fold order.
    */
  def dot(a: Column, b: Column): Column =
    ofExpr(VectorExpressions.DotExpr(
      expression(asDoubleArr(a)), expression(asDoubleArr(b))))

  /** HOF twin of [[dot]] (spec pin only). */
  private[graft] def dotLambda(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Cast array<float|int|...> to array<double>. */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance — ascending-index sequential fold, so an external
    * engine's `list_reduce` over `generate_series` accumulates bit-
    * identically. Fused one-pass codegen kernel.
    */
  def sqL2(a: Column, b: Column): Column =
    ofExpr(VectorExpressions.SqL2Expr(
      expression(asDoubleArr(a)), expression(asDoubleArr(b))))

  /** HOF twin of [[sqL2]] (spec pin only). */
  private[graft] def sqL2Lambda(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; null-safe via greatest(eps) in the denominator.
    * Fused kernel: dot and both norms in ONE ascending pass (the HOF form
    * walked both arrays three times, interpreted).
    */
  def cosine(a: Column, b: Column): Column =
    ofExpr(VectorExpressions.CosineExpr(
      expression(asDoubleArr(a)), expression(asDoubleArr(b))))

  /** HOF twin of [[cosine]] (spec pin only). */
  private[graft] def cosineLambda(a: Column, b: Column): Column =
    dotLambda(a, b) /
      greatest(sqrt(dotLambda(a, a)) * sqrt(dotLambda(b, b)), lit(1e-300))

  /** Driver-side twin of [[cosine]]: the same ordered left folds over
    * doubles (each accumulator folds positions ascending, then the same
    * eps-guarded division), so values equal the Column expression bit for
    * bit — the contract the streaming dedup state operators and the
    * k-means/residual trainers rely on. ONE implementation: every
    * driver-side cosine in the engine must call this, not re-derive it.
    */
  def cosineDriver(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-300)
  }

  /** splitmix64 finalizer — the public-domain mixing constant pipeline;
    * shared by the minhash coefficient family and the LSH hyperplanes.
    */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplane h_j ∈ R^dim, j = plane index:
    * components uniform in [-1, 1) from splitmix64(j·2^32 + d). Seedless
    * and identical on every engine/executor. (A previous sin(1 + j·dim + d)
    * generator made consecutive planes phase-shifted copies of each other —
    * sin(x + 64 mod 2π) — which correlated multi-table LSH buckets and
    * capped the recall achievable by adding tables.)
    * Components are uniform rather than gaussian; for sign-of-dot LSH the
    * bucketing quality is equivalent (symmetric around 0).
    */
  def hyperplane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      mix64((j.toLong << 32) + d).toDouble / 9.223372036854776e18
    }

  /** Plane-index base for [[jlProject]] — disjoint from the LSH planes
    * (j = 0..nBits·tables) so a pipeline using both never correlates its
    * projection with its bucketing.
    */
  val JlPlaneBase: Int = 0x100000

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * component j = ⟨v, h_{base+j}⟩ / √outDim over the same deterministic
    * splitmix64 hyperplane family as the LSH path (seedless, identical
    * on every engine/executor — the reason an oracle can replay it as
    * literal lists). Uniform-component planes satisfy the JL bound like
    * gaussian ones (Achlioptas 2003 — database-friendly projections).
    *
    * The 100 TB shape: each corpus row is projected ONCE (outDim·dim
    * multiplies), after which every pairwise comparison costs outDim
    * instead of dim — the standard coarse-pass preprocessing in front of
    * an exact re-rank ([[graft.operators.Similarity.projectedTopK]]).
    * Per-row left-to-right fold, so values are partition-order-free.
    */
  def jlProject(v: Column, outDim: Int, dim: Int,
                planeBase: Int = JlPlaneBase): Column = {
    require(outDim >= 1 && outDim <= dim,
      s"jlProject: outDim=$outDim must be in 1..dim=$dim")
    val s = 1.0 / math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      aggregate(
        zip_with(asDouble(v), lit(hyperplane(planeBase + j, dim).toArray),
          (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x) * lit(s)
    }: _*)
  }

  /** Sign bit of <v, h_j> as 0/1. */
  def hyperplaneBit(v: Column, j: Int, dim: Int): Column = {
    val h = hyperplane(j, dim)
    val prod = aggregate(
      zip_with(asDouble(v), lit(h.toArray), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    when(prod >= 0, 1).otherwise(0)
  }

  /** Random-hyperplane LSH signature: `nBits`-char string of 0/1. Vectors
    * with high cosine similarity collide with high probability; used to
    * bucket candidates before exact re-ranking (the scale path for ANN —
    * the bucket join shuffles only same-signature groups instead of the
    * full n² cross join). Fused codegen kernel: all `nBits` plane dots in
    * one pass over the vector ([[lshBits]]); the per-bit HOF chain built
    * nBits interpreted folds per row.
    */
  def lshSignature(v: Column, nBits: Int, dim: Int): Column =
    lshBits(v, 0, nBits, dim)

  /** [[lshSignature]] starting at an arbitrary plane index — table t of a
    * multi-table family is `lshBits(v, t * nBits, nBits, dim)`.
    */
  def lshBits(v: Column, startPlane: Int, nBits: Int, dim: Int): Column =
    ofExpr(VectorExpressions.LshBitsExpr(
      expression(asDoubleArr(v)), startPlane, nBits, dim))

  /** HOF twin of [[lshSignature]] (spec pin only). */
  private[graft] def lshSignatureLambda(v: Column, nBits: Int, dim: Int): Column =
    concat((0 until nBits).map(j => hyperplaneBit(v, j, dim).cast("string")): _*)

  /** Corpus-scale LSH signatures as a relational pipeline: explode vector
    * components, join the broadcast (bit, dim, weight) hyperplane table,
    * one hash aggregation of the nBits dot products, then sign-assemble.
    * Identical output to `lshSignature` (same hyperplanes, same left-to-
    * right accumulation per projection is NOT required — only the SIGN of
    * the projection is used, and |dot| ⋙ summation noise for random data;
    * the two paths are asserted equal in the test suite on real vectors).
    * Keeps the generated code small where the per-row variant inlines
    * nBits × dim literal multiplies.
    * Input: (idCol, vecCol); output: (idCol, bucket).
    */
  def lshSignatures(df: org.apache.spark.sql.DataFrame, nBits: Int, dim: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planes = for (j <- 0 until nBits; d <- 0 until dim)
      yield (j, d, hyperplane(j, dim)(d))
    val planeDf = planes.toDF("_j", "_d", "_w")
    val comps = df.select(col(idCol), posexplode(asDouble(col(vecCol))).as(Seq("_d0", "_x")))
      .withColumn("_d", col("_d0").cast("int")).drop("_d0")
    comps.join(broadcast(planeDf), Seq("_d"))
      .groupBy(col(idCol), col("_j"))
      .agg(sum(col("_x") * col("_w")).as("_dot"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          // collect_list order is nondeterministic → sort (bit index, bit)
          // structs, then strip to the bit characters
          array_sort(collect_list(struct(col("_j"),
            when(col("_dot") >= 0, "1").otherwise("0").as("_b")))),
          x => x.getField("_b")),
        "").as("bucket"))
  }

  /** Multi-table LSH signatures in one relational pass: `nTables`
    * independent `nBits` signatures per vector (table t uses hyperplanes
    * t·nBits … t·nBits+nBits−1). Same explode + broadcast-plane-join +
    * two-aggregation shape as `lshSignatures`, with the table index as one
    * more key — the plane table is nTables× bigger but still tiny, and the
    * shuffle carries nTables·nBits dots per vector. Multiple tables are the
    * standard recall lever for single-probe LSH (union of candidates);
    * output: (idCol, _t, bucket).
    */
  def lshSignaturesMulti(df: org.apache.spark.sql.DataFrame, nBits: Int,
                         nTables: Int, dim: Int,
                         idCol: String = "vec_id", vecCol: String = "embedding")
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planes = for (t <- 0 until nTables; j <- 0 until nBits; d <- 0 until dim)
      yield (t, j, d, hyperplane(t * nBits + j, dim)(d))
    val planeDf = planes.toDF("_t", "_j", "_d", "_w")
    val comps = df.select(col(idCol), posexplode(asDouble(col(vecCol))).as(Seq("_d0", "_x")))
      .withColumn("_d", col("_d0").cast("int")).drop("_d0")
    comps.join(broadcast(planeDf), Seq("_d"))
      .groupBy(col(idCol), col("_t"), col("_j"))
      .agg(sum(col("_x") * col("_w")).as("_dot"))
      .groupBy(col(idCol), col("_t"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("_j"),
            when(col("_dot") >= 0, "1").otherwise("0").as("_b")))),
          x => x.getField("_b")),
        "").as("bucket"))
  }

  /** 64-bit SimHash over an array of token strings: each token is hashed
    * (xxhash64), each of the 64 bit positions accumulates +1/-1, sign of
    * the sum is the output bit. Near-identical documents differ in few bits.
    */
  def simhash(tokensCol: Column): Column =
    simhashFromHashes(transform(tokensCol, t => xxhash64(t)))

  /** [[simhash]] over PRE-HASHED tokens (array<long>). The 64 per-bit
    * folds each read the input column — feed a MATERIALIZED column (its
    * own projection alias), or an inline token-hashing expression is
    * re-evaluated 64× per row (the CollapseProject inline-vs-materialize
    * rule; same hazard class as the q83 residual fix).
    */
  def simhashFromHashes(hashesCol: Column): Column = {
    val bits = (0 until 64).map { b =>
      val vote = aggregate(
        hashesCol, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Large prime for the MinHash universal-hash family. */
  val MinhashPrime: Long = 4294967311L // smallest prime > 2^32

  /** Deterministic (a, b) coefficients for permutation i (splitmix64). */
  def minhashCoeffs(i: Int): (Long, Long) = {
    val a = (mix64(i.toLong * 2 + 1) & 0x7fffffffL) | 1L // odd, positive
    val b = mix64(i.toLong * 2 + 2) & 0x7fffffffL
    (a, b)
  }

  /** MinHash signature (array<long>, length `nHashes`) over an array of
    * shingle strings. h_i(x) = (a_i * xxhash64(x) + b_i) mod p, minimized
    * over shingles. Empty shingle sets get p (sentinel max).
    */
  def minhashSignature(shinglesCol: Column, nHashes: Int): Column =
    minhashSignatureFromReduced(
      transform(shinglesCol, s => pmod(xxhash64(s), lit(MinhashPrime))),
      nHashes)

  /** [[minhashSignature]] over an ALREADY-REDUCED hash array (elements =
    * pmod(xxhash64(shingle), p)). The nHashes folds each read the input —
    * feed a MATERIALIZED column or the reduction is re-evaluated nHashes×
    * per row (see [[simhashFromHashes]]).
    */
  def minhashSignatureFromReduced(reducedCol: Column, nHashes: Int): Column = {
    val sigs = (0 until nHashes).map { i =>
      val (a, b) = minhashCoeffs(i)
      aggregate(
        reducedCol, lit(MinhashPrime),
        (acc, h) => least(acc, pmod(h * a + b, lit(MinhashPrime))))
    }
    array(sigs: _*)
  }

  /** LSH band keys from a MinHash signature: `nBands` strings, each a
    * hash of `rowsPerBand` consecutive signature entries. Documents sharing
    * any band key are near-dup candidates (then verified by exact Jaccard).
    */
  def minhashBands(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { b =>
      concat_ws("_", lit(b),
        xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand))))
    }: _*)

  /** Estimated Jaccard similarity from two equal-length MinHash signatures:
    * fraction of agreeing positions.
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    ofExpr(VectorExpressions.MinhashJaccardExpr(
      expression(sigA), expression(sigB)))

  /** HOF twin of [[minhashJaccard]] (spec pin only). */
  private[graft] def minhashJaccardLambda(sigA: Column, sigB: Column): Column = {
    val agree = aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, v) => acc + v)
    when(size(sigA) > 0, agree / size(sigA).cast("double"))
  }
}
