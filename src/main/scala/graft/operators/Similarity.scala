package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (`array<float>`): exact
  * brute-force top-k as the correctness baseline, and two approximate
  * scale paths — random-hyperplane LSH buckets (Charikar, STOC 2002) and
  * IVF coarse quantization (inverted-file probing as in Jégou et al.,
  * "Product quantization for nearest neighbor search", TPAMI 2011 — here
  * without the PQ compression stage). Distributed top-k shapes follow the
  * prune-then-rerank pattern surveyed in the retrieved top-k literature
  * (PAPERS.md: EDBT 2020 incremental top-k; ICDE 2021 REPOSE).
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. Query side is broadcast
    * (queries ≪ corpus); the cosine predicate is a codegen'd native
    * expression, so the scan side stays in one whole-stage-codegen pipeline
    * and parallelizes over corpus partitions. Top-k per query via
    * row_number window, tie-broken by neighbor id for determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q)
      .join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("score", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Deterministic random hyperplanes (standard normal components) from a
    * fixed seed; `java.util.Random.nextGaussian` is algorithmically
    * specified, so signatures are identical across JVMs.
    */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of a vector column against the given hyperplanes,
    * packed into a Long — vectors with small angles agree on most bits.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorFunctions.dot(vec, lit(p)) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest centroid (coarse quantizer); each query probes only the
    * `nprobe` closest centroid cells and exact-reranks inside them. The
    * assignment is a narrow projection; the probe is an equi-join on
    * centroid id — a hash-partitioned join at scale, scanning nprobe/nlist
    * of the corpus per query instead of all of it.
    *
    * Centroids here are the first `nlist` corpus vectors by id —
    * deterministic "sampled" centroids (a k-means refinement would slot in
    * without changing the plan shape).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents: Array[(Int, Array[Float])] = corpus
      .orderBy(col(idCol).asc).limit(nlist)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }

    def cellScores(vec: Column): Column =
      array(cents.map { case (i, cv) =>
        struct(VectorFunctions.cosine(vec, typedlit(cv)).as("s"), lit(i).as("cell"))
      }.toIndexedSeq: _*)

    // corpus side: nearest cell = argmax cosine over centroids
    val assigned = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cell", array_max(cellScores(col("cv"))).getField("cell"))

    // query side: top-nprobe cells, exploded to (query, cell) probes
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("cells",
        slice(reverse(array_sort(cellScores(col("qv")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("cells").getField("cell")).as("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    broadcast(probes)
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  /** Approximate top-k: candidates = corpus vectors agreeing with the query
    * signature on ≥ (numPlanes − maxBitDiff) sign bits, exact-reranked by
    * cosine. Bucket-equality (maxBitDiff = 0) makes the join a pure
    * hash-partitioned equi-join on the signature — the 100 TB shape; small
    * maxBitDiff trades shuffle width for recall (multi-probe).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, numPlanes: Int = 16, maxBitDiff: Int = 3, seed: Long = 42L): DataFrame = {
    // derive dimensionality from the data — a silent mismatch would bucket
    // on prefix components (DotProduct loops to min length)
    val dim = queries.select(size(col(vecCol))).head().getInt(0)
    val planes = hyperplanes(dim, numPlanes, seed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qsig", hyperplaneSignature(col("qv"), planes))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("csig", hyperplaneSignature(col("cv"), planes))
    val candidates = broadcast(q).join(c,
      col("query_id") =!= col("neighbor_id") &&
        bit_count(col("qsig").bitwiseXOR(col("csig"))) <= maxBitDiff)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    candidates
      .withColumn("score", VectorFunctions.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }
}
