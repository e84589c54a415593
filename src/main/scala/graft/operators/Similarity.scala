package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design (100 TB corpus):
  *  - `topK` is a broadcast of the (small) query set against a single
  *    scan of the corpus — per-query top-k via a window partitioned by
  *    query id, so the corpus is read once regardless of query count.
  *    The sort inside each window is bounded by AQE partition sizing.
  *  - `hyperplaneBuckets` is the scale path: bucket assignment is a
  *    map-only pass (no shuffle); candidate generation becomes an
  *    equi-join on the bucket key instead of a cross product, trading
  *    recall for a ~2^planes reduction in compared pairs. Probing
  *    neighboring buckets (Hamming distance 1) recovers recall.
  *  - `knnClassify` keeps the labeled corpus on the scan side and
  *    broadcasts the test rows; majority vote is a partial-aggregable
  *    count. All deterministic: ties broken by (sim desc, vec_id).
  */
object Similarity {

  /** Zero-norm-safe cosine: an all-zero (null-imputed/padded) vector
    * scores 0.0 instead of raising DIVIDE_BY_ZERO under Spark's
    * default ANSI mode and killing the whole scan. Identical to the
    * unguarded division for every nonzero-norm pair. */
  private def cosSim(dotC: Column, denom: Column): Column =
    when(denom === 0.0, lit(0.0)).otherwise(dotC / denom)

  /** Exact brute-force top-k neighbors of each query row.
    * `queries`/`corpus`: (id, embedding). Output:
    * (query_id, vec_id, sim, rank) with rank 1..k. `excludeSelf` drops
    * vec_id == query_id pairs — right for self-search over ONE table
    * (a vector's nearest neighbor is trivially itself); set it false
    * when queries and corpus are DIFFERENT tables, where an id
    * collision is not a self-pair and exclusion would silently drop a
    * true neighbor. */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           excludeSelf: Boolean = true): DataFrame = {
    // norms are precomputed per row (not per pair): the pair loop then
    // does ONE dot product instead of three — same doubles, third the work
    val q = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
                           norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("vec_id"), col("embedding").as("c_emb"),
                          norm(col("embedding")).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val pairs = c.crossJoin(broadcast(q))
    (if (excludeSelf) pairs.filter(col("vec_id") =!= col("query_id")) else pairs)
      .select(col("query_id"), col("vec_id"),
              cosSim(dot(col("q_emb"), col("c_emb")),
                     col("q_norm") * col("c_norm")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** k-NN majority-vote classification of `test` rows against the
    * labeled `train` corpus. Output: (id, predicted_label, votes).
    * Majority ties break toward the smaller label. Test and train are
    * separate id namespaces, so no self-exclusion: a test id equal to
    * a train id is a coincidence, not the same row. */
  def knnClassify(test: DataFrame, train: DataFrame, k: Int): DataFrame = {
    val neighbors = topK(
      test.select(col("id"), col("embedding")),
      train.select(col("id"), col("embedding")), k, excludeSelf = false)
      .join(train.select(col("id").as("vec_id"), col("label")), Seq("vec_id"))
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    neighbors
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rn", row_number().over(voteW))
      .filter(col("rn") === 1)
      .select(col("query_id").as("id"), col("label").as("predicted_label"),
              col("votes"))
  }

  /** Map-only LSH bucket assignment (the ANN scale path). */
  def hyperplaneBuckets(corpus: DataFrame, nPlanes: Int, dim: Int): DataFrame =
    corpus.select(col("id").as("vec_id"),
                  hyperplaneBucket(col("embedding"), nPlanes, dim).as("bucket"))

  /** Centroids collected to the driver as (cid, double-promoted
    * embedding, norm), sorted by cid — the k·dim doubles every IVF
    * implementation ships. Collect is MODEL-sized (a coarse quantizer,
    * never corpus data). Element promotion float→double is exact, and
    * the norm is the same left-to-right `acc += x·x` fold then sqrt
    * that [[graft.functions.DotProductFold]]-backed `norm()` computes,
    * so executor-side sims are bit-identical to the former
    * column-vs-column form. */
  private def collectCentroids(centroids: DataFrame): Array[(Long, Seq[Double], Double)] =
    centroids.select(col("cid"), col("embedding")).collect()
      .map { r =>
        val emb: Seq[Double] = r.getSeq[Any](1).map {
          case f: Float => f.toDouble
          case d: Double => d
          case x: Number => x.doubleValue()
        }
        var acc = 0.0
        emb.foreach(x => acc += x * x)
        (r.getLong(0), emb, math.sqrt(acc))
      }.sortBy(_._1)

  /** One array literal of (cent, cnorm, cid) structs for [[ivfAssign]] /
    * [[ivfTopK]]'s map-only scoring. */
  private def centroidLiteral(cents: Array[(Long, Seq[Double], Double)]): Column = {
    require(cents.nonEmpty, "empty centroid set")
    array(cents.map { case (cid, emb, nrm) =>
      struct(typedLit(emb).as("cent"), lit(nrm).as("cnorm"), lit(cid).as("cid"))
    }.toSeq: _*)
  }

  /** Per-row array of (negsim, cid) structs, one per centroid —
    * ascending struct order ≡ (sim desc, cid asc), the window ordering
    * this replaces: `Double.compare(-a,-b) = -Double.compare(a,b)` for
    * every non-NaN pair including ±0.0, so argmax/top-n selections are
    * value-identical to the former `row_number` form. Requires a
    * `v_norm` column alongside `embedding`. */
  private def centroidScores(centLit: Column): Column =
    transform(centLit, c =>
      struct((-cosSim(dot(col("embedding"), c.getField("cent")),
                      col("v_norm") * c.getField("cnorm"))).as("negsim"),
             c.getField("cid").as("cid")))

  /** IVF cell assignment with externally supplied coarse centroids
    * (production IVF ships trained centroids as data; k-means training
    * is offline). Each corpus vector goes to its highest-cosine
    * centroid; ties break toward the smaller centroid id.
    * `corpus`: (id, embedding); `centroids`: (cid, embedding).
    *
    * MAP-ONLY: centroids ride along as an array literal (the same
    * argmax layout as [[KMeans.train]]) and each vector picks its cell
    * via `array_min` over (negsim, cid) structs — one corpus scan, ZERO
    * shuffle. The former shape — crossJoin(broadcast) + row_number
    * window partitioned by id — pushed |corpus|×|centroids| expanded
    * rows through a shuffle to keep one per vector; at a production
    * cell count (4k-64k centroids) that is a thousandfold row
    * expansion of a 100 TB scan. */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val centLit = centroidLiteral(collectCentroids(centroids))
    corpus.select(col("id"), col("embedding"),
                  norm(col("embedding")).as("v_norm"))
      .select(col("id"),
        array_min(centroidScores(centLit)).getField("cid").as("cid"))
  }

  /** IVF ANN top-k: each query probes its `nprobe` nearest cells and
    * searches only the corpus vectors assigned there — the coarse-
    * quantizer pruning that makes 100 TB ANN tractable (candidates
    * shrink ~|cells|/nprobe-fold; recall < 1 for vectors whose true
    * neighbors live in unprobed cells). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              nprobe: Int, k: Int): DataFrame = {
    val assignment = ivfAssign(corpus, centroids)
    val centLit = centroidLiteral(collectCentroids(centroids))
    // probe selection is map-only too: per query, sort the (negsim,
    // cid) score array and slice the first nprobe — no query×centroid
    // row expansion, no window shuffle. Same ordering as the former
    // row_number over (cent_sim desc, cid).
    val probes = queries
      .select(col("id").as("query_id"), col("embedding"),
              norm(col("embedding")).as("v_norm"))
      .select(col("query_id"), col("embedding").as("q_emb"),
        col("v_norm").as("q_norm"),
        explode(slice(array_sort(centroidScores(centLit)), 1, nprobe))
          .as("probe"))
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        col("probe.cid").as("cid"))
    val cand = corpus.select(col("id").as("vec_id"), col("embedding").as("c_emb"),
                             norm(col("embedding")).as("c_norm"))
      .join(assignment.withColumnRenamed("id", "vec_id"), Seq("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("cid"),
        cosSim(dot(col("q_emb"), col("c_emb")), col("q_norm") * col("c_norm")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** ANN top-k restricted to same-bucket candidates: equi-join on the
    * bucket key replaces the cross product. Output like [[topK]] plus
    * the candidate's bucket; recall < 1 by construction.
    *
    * `probeHamming1 = true` turns on multiprobe: each query also probes
    * every bucket at Hamming distance 1 from its own (one hyperplane
    * sign flipped — the buckets where borderline near-neighbors land).
    * The probe list is a query-side explode (queries are the broadcast
    * side, so it multiplies the tiny side by nPlanes+1, never the
    * corpus scan); candidates stay an equi-join on the bucket key. The
    * standard recall/cost dial: nPlanes+1 of 2^nPlanes buckets probed
    * instead of 1, so more planes + multiprobe beats fewer planes at
    * the SAME candidate count with materially higher recall (measured
    * by q55 vs q50). */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int, dim: Int,
              probeHamming1: Boolean = false): DataFrame = {
    val qb = hyperplaneBuckets(queries, nPlanes, dim)
      .withColumnRenamed("vec_id", "query_id")
      .join(queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
                           norm(col("embedding")).as("q_norm")),
            Seq("query_id"))
    val probes =
      if (!probeHamming1) qb.withColumn("probe", col("bucket"))
      else qb.withColumn("probe", explode(array(
        col("bucket") +:
          (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*)))
    val cb = hyperplaneBuckets(corpus, nPlanes, dim)
      .join(corpus.select(col("id").as("vec_id"), col("embedding").as("c_emb"),
                          norm(col("embedding")).as("c_norm")),
            Seq("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cb.join(broadcast(probes.drop("bucket")), col("bucket") === col("probe"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
              cosSim(dot(col("q_emb"), col("c_emb")), col("q_norm") * col("c_norm"))
                .as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Scalar-quantized (int8) brute-force top-k — the memory-bandwidth
    * path for large-corpus search: embeddings shrink 4× (int8 vs
    * float32), the scan reads a quarter of the bytes, and the scoring
    * inner loop is integer multiply-add. Quantization is symmetric with
    * ONE corpus-wide scale (127/max|x|, an order-free max aggregate
    * broadcast back via crossJoin — no collect, no second shuffle);
    * q8 = clamp(floor(x·scale + 0.5), ±127). Because quantized dot
    * products are exact 64-bit integers, ranking has no float
    * accumulation at all — the whole search is bitwise reproducible in
    * any engine, and ties are impossible except at equal integer scores
    * (broken by vec_id). `dot_hat` = qdot/scale² approximates the true
    * float dot product for downstream thresholds.
    * Output: (query_id, vec_id, qdot, dot_hat, rank ≤ k). */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val stats = corpus.agg(
      max(aggregate(col("embedding"), lit(0.0),
        (acc, x) => greatest(acc, abs(x.cast("double"))))).as("max_abs"))
      // an all-zero corpus has max_abs = 0: scale 1.0 quantizes every
      // value to 0 instead of raising ANSI DIVIDE_BY_ZERO
      .select(when(col("max_abs") === 0.0, lit(1.0))
        .otherwise(lit(127.0) / col("max_abs")).as("scale"))
    def quant(emb: org.apache.spark.sql.Column, scale: org.apache.spark.sql.Column) =
      transform(emb, x =>
        greatest(least(floor(x.cast("double") * scale + 0.5), lit(127L)), lit(-127L)))
    val c = corpus.crossJoin(broadcast(stats))
      .select(col("id").as("vec_id"), quant(col("embedding"), col("scale")).as("q8"),
              col("scale"))
    val q = queries.crossJoin(broadcast(stats))
      .select(col("id").as("query_id"), quant(col("embedding"), col("scale")).as("p8"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("vec_id"))
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("p8"), col("q8"), _ * _), lit(0L), _ + _).as("qdot"),
        (col("scale") * col("scale")).as("scale2"))
      .withColumn("dot_hat", col("qdot").cast("double") / col("scale2"))
      .drop("scale2")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
