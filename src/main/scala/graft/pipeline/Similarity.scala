package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, plus two scale paths —
  * random-hyperplane LSH bucketing and an IVF-style coarse quantizer.
  *
  * Scale design: the query vector folds into the scan as a literal array
  * (one map-side pass, no shuffle); top-k is TakeOrdered (per-partition
  * heap + driver merge of k rows, never a global sort). LSH/IVF prune the
  * scan to matching buckets/lists — with a bucketed/partitioned layout the
  * pruning is file-level at 100 TB.
  */
object Similarity {

  /** Dot product — native codegen expression (graft.functions.DotProduct);
    * the HOF formulation `aggregate(zip_with(...))` costs a lambda eval +
    * intermediate array per row, which dominates all-pairs similarity.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic random hyperplanes (unit-free gaussians, seed-fixed).
    * Public: the planes are index *metadata* — tests and the SQL oracle
    * embed them as literals to replicate the bucketing exactly.
    */
  def planesFor(dim: Int, k: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of `v` against `k` random hyperplanes, packed into
    * a long — the classic cosine-LSH bucket key.
    */
  def hyperplaneSig(v: Column, k: Int, seed: Long = 42L, dim: Int = 64): Column = {
    val planes = planesFor(dim, k, seed)
    (0 until k).map { i =>
      when(dot(v, typedlit(planes(i).toSeq)) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** Exact brute-force cosine top-k for one query vector. */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedlit(query)
    val qn = math.sqrt(query.map(x => x * x).sum)
    df.select(col(idCol),
        (dot(col(vecCol).cast("array<double>"), q) /
          (l2norm(col(vecCol).cast("array<double>")) * lit(qn))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Exact kNN graph: every vector's top-k cosine neighbors (the
    * embedding-space structure dedup/clustering/retrieval pipelines
    * consume). Brute force with a broadcast nested loop — the exact
    * baseline; at corpus scale the LSH (sim2) and IVF (sim3) paths
    * bound candidates instead. Norms are computed once per side, and
    * the per-key top-k is a window rank, never a global sort.
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", l2norm(col("v")))
      // zero vectors have no direction: cosine would be 0/0 = NaN, and
      // Spark orders NaN greatest — a degenerate vector would rank as
      // everyone's nearest neighbor. Excluded from both sides.
      .filter(col("n") > 0)
    // a small corpus arrives as one parquet file = 1-2 scan partitions,
    // which would serialize the O(n²·dim) dot products on one core; widen
    // the left (streamed) side so the nested loop parallelizes
    val target = spark.sparkContext.defaultParallelism
    val widened = if (v.rdd.getNumPartitions < target) v.repartition(target) else v
    val a = widened.select(col("id").as("a_id"), col("v").as("a_v"), col("n").as("a_n"))
    val b = v.select(col("id").as("b_id"), col("v").as("b_v"), col("n").as("b_n"))
    a.crossJoin(broadcast(b)).filter(col("a_id") =!= col("b_id"))
      .withColumn("cos", dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      // project the vectors away BEFORE the rank shuffle: the window moves
      // O(n²) rows, and 24-byte (id, id, cos) rows shuffle ~50× less than
      // rows still carrying two dim-length arrays
      .select(col("a_id"), col("b_id"), col("cos"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("a_id").as("vec_id"), col("b_id").as("neighbor_id"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: only vectors whose hyperplane signature is
    * within `maxBitDiff` bits of the query's signature are scored. With a
    * layout bucketed on the signature this prunes to a handful of files.
    */
  def annTopKLsh(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, planes: Int = 10, maxBitDiff: Int = 2,
      seed: Long = 42L): DataFrame = {
    val qSig = { // evaluate the signature for the literal query on the driver
      val ps = planesFor(query.length, planes, seed)
      (0 until planes).foldLeft(0L) { (acc, i) =>
        val d = ps(i).zip(query).map { case (a, b) => a * b }.sum
        if (d >= 0) acc | (1L << i) else acc
      }
    }
    val v = col(vecCol).cast("array<double>")
    df.withColumn("__sig", hyperplaneSig(v, planes, seed, query.length))
      .filter(bit_count(col("__sig").bitwiseXOR(lit(qSig))) <= maxBitDiff)
      .select(col(idCol),
        (dot(v, typedlit(query)) /
          (l2norm(v) * lit(math.sqrt(query.map(x => x * x).sum)))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** IVF-style index: coarse centroids from a deterministic sample (every
    * table gets `nlist` centroids), vectors assigned to nearest centroid.
    * Returns the assigned DataFrame + centroids for probing. At scale the
    * assignment column becomes the partition/bucket key of the stored
    * table, so probes prune files.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      spark: org.apache.spark.sql.SparkSession): (DataFrame, Array[(Int, Seq[Double])]) = {
    val centroids = df.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol).cast("array<double>")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }
    val v = col(vecCol).cast("array<double>")
    // nearest centroid by max cosine (argmax over a literal array of centroids)
    val best = centroids.map { case (i, c) =>
      struct((dot(v, typedlit(c)) / (l2norm(v) * lit(math.sqrt(c.map(x => x * x).sum)))).as("s"),
        lit(i).as("i"))
    }
    (df.withColumn("__list", greatest(best: _*)("i")), centroids)
  }

  /** IVF probe: score only vectors in the `nprobe` lists nearest to the
    * query, then exact top-k within them.
    */
  def ivfTopK(assigned: DataFrame, centroids: Array[(Int, Seq[Double])],
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      nprobe: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val probeLists = centroids.map { case (i, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val cos = c.zip(query).map { case (a, b) => a * b }.sum / (cn * qn)
      (i, cos)
    }.sortBy(-_._2).take(nprobe).map(_._1)
    val v = col(vecCol).cast("array<double>")
    assigned.filter(col("__list").isin(probeLists.toIndexedSeq: _*))
      .select(col(idCol), (dot(v, typedlit(query)) / (l2norm(v) * lit(qn))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
