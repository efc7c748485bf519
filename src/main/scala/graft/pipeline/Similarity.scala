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

  /** ANN kNN graph — the scale path for [[knnGraph]]: candidate pairs come
    * from `tables` independent hyperplane-LSH bucketings (seeds seed,
    * seed+1, …), then exact cosine + per-key top-k within the candidate
    * set only. Each table's candidates are an equi-join on the packed
    * signature — a keyed shuffle whose volume scales with bucket occupancy
    * (≈ n²/2^planes per table), never all-pairs, and nothing is broadcast —
    * so the construction survives corpus sizes where [[knnGraph]]'s
    * broadcast nested loop dies. Multi-probe (on by default) also matches
    * buckets ONE bit away — the probe side explodes each signature into
    * its planes+1 single-bit flips, the classic multi-probe-LSH recall
    * boost for (planes+1)× candidate lookups instead of another full
    * table. A true neighbor at angle θ collides in one table with
    * p^planes (+ planes·p^(planes-1)(1-p) multi-probed), p = 1-θ/π;
    * tables independent draws on top.
    */
  def knnGraphAnn(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 8, tables: Int = 3, seed: Long = 42L,
      dim: Int = 64, multiProbe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("n", l2norm(col("v")))
      .filter(col("n") > 0) // zero vectors have no direction (see knnGraph)
    // signatures cost tables×planes dot products per row and feed
    // 2×tables+2 plan branches — materialize them once
    val sigs = (0 until tables).foldLeft(v) { (acc, t) =>
      acc.withColumn(s"__sig$t", hyperplaneSig(col("v"), planes, seed + t, dim))
    }.localCheckpoint()
    def probes(sig: Column): Column =
      if (!multiProbe) array(sig)
      else array((sig +: (0 until planes).map(j =>
        sig.bitwiseXOR(lit(1L << j)))): _*)
    val cand = (0 until tables).map { t =>
      val a = sigs.select(col("id").as("a_id"),
        explode(probes(col(s"__sig$t"))).as("__s"))
      val b = sigs.select(col("id").as("b_id"), col(s"__sig$t").as("__s"))
      a.join(b, "__s").filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"))
    }.reduce(_ union _).distinct()
    val av = sigs.select(col("id").as("a_id"), col("v").as("a_v"), col("n").as("a_n"))
    val bv = sigs.select(col("id").as("b_id"), col("v").as("b_v"), col("n").as("b_n"))
    cand.join(av, "a_id").join(bv, "b_id")
      // project vectors away before the rank shuffle, like knnGraph
      .select(col("a_id"), col("b_id"),
        (dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))).as("cos"))
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
    val centroids = firstNCentroids(df, idCol, vecCol, nlist)
    (df.withColumn("__list", ivfListOf(col(vecCol), centroids)), centroids)
  }

  /** The deterministic first-`nlist`-by-id coarse centroids — the
    * oracle-replayable quantizer [[ivfAssign]] and the persisted
    * [[graft.core.VectorIndex]] share.
    */
  def firstNCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[(Int, Seq[Double])] =
    df.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol).cast("array<double>")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0)) }

  /** Nearest-list assignment against FIXED centroids: argmax centroid
    * cosine, ties to the larger index (the single definition every
    * caller — ephemeral assign, persisted index build/refresh — shares,
    * so tie-breaking can never drift between them).
    */
  def ivfListOf(vec: Column,
      centroids: Array[(Int, Seq[Double])]): Column =
    // one-pass native kernel: the declarative greatest-of-structs form
    // re-evaluated the vector cast and the norm once per centroid when
    // the optimizer inlined the assignment into a probe filter (alias
    // substitution has no cost check, and FilterExec does no
    // subexpression elimination — 34 dots + 33 casts/row in sim3's
    // audited plan). Identical arithmetic and tie-breaking (larger
    // index), so every generated oracle replays unchanged.
    graft.functions.VectorExprs.ivfArgmax(vec.cast("array<double>"),
      centroids.sortBy(_._1).map(_._2.toArray).toArray, divide = true)

  /** IVF coarse centroids via deterministic spherical k-means — the
    * production quantizer ([[ivfAssign]]'s first-n-by-id centroids stay as
    * the oracle-stable baseline; on skewed data they give arbitrarily
    * unbalanced lists). Seeding is greedy farthest-point over an
    * md5-ordered deterministic sample (k-means++'s spread without RNG);
    * each of `iters` Lloyd rounds assigns by argmax centroid cosine and
    * re-centers each list on its mean direction. Every round is one
    * aggregate job; only nlist×dim doubles ever reach the driver.
    * (Per-list double sums commute differently across partitionings, so
    * centroid coordinates can differ in final ulps between runs — an
    * index-build property, fine for an index, which is why the sim3
    * ORACLE keeps the first-n baseline.)
    */
  /** Cluster-balanced corpus sampling: k-means the embeddings, then keep
    * at most `perCluster` rows of each cluster (deterministic md5 order)
    * — the semantic-diversity rebalancing move ("don't let one topic
    * dominate the mix"), embedding-space analog of the per-domain
    * [[Sampling.capPerGroup]] rule, which also supplies the salted
    * skew-proof top-k underneath. Output: (idCol, cluster, rank).
    */
  def clusterBalancedSample(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, perCluster: Int): DataFrame =
    clusterBalancedSampleWithCentroids(df, idCol, vecCol, nlist,
      perCluster)._1

  /** [[clusterBalancedSample]] plus the k-means centroids the rows were
    * assigned with — what lets a caller replay the assignment in plain
    * SQL with the centroids as literals (the sim2/sim3 generated-oracle
    * pattern: the centroids are deterministic index metadata, but only
    * the engine computes them, so the caller captures them post-run).
    */
  def clusterBalancedSampleWithCentroids(df: DataFrame, idCol: String,
      vecCol: String, nlist: Int, perCluster: Int)
      : (DataFrame, Array[(Int, Seq[Double])]) = {
    val (assigned, cens) = ivfAssignKMeans(df, idCol, vecCol, nlist)
    val scored = assigned.withColumn("__mr",
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 15),
        16, 10).cast("long"))
    (graft.pipeline.Sampling.capPerGroup(scored, idCol, "__list", "__mr",
        perCluster)
      .select(col(idCol), col("__list").as("cluster"), col("rank")), cens)
  }

  def ivfAssignKMeans(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5, seed: Long = 42L,
      sampleSize: Int = 2048): (DataFrame, Array[(Int, Seq[Double])]) = {
    val vd = col(vecCol).cast("array<double>")
    // unit vectors: assignment score is then a plain dot product, and the
    // re-center step is robust to magnitude outliers
    val unit = df.select(col(idCol).as("__id"), vd.as("__v"))
      .withColumn("__n", l2norm(col("__v"))).filter(col("__n") > 0)
      .select(col("__id"),
        transform(col("__v"), x => x / col("__n")).as("__u"))
      .persist()
    try {
      val sample = unit
        .orderBy(md5(concat_ws(":", col("__id").cast("string"), lit(seed))),
          col("__id"))
        .limit(math.max(sampleSize, nlist))
        .collect().map(_.getSeq[Double](1).toArray)
      require(sample.length >= nlist,
        s"k-means needs >= $nlist non-zero vectors, got ${sample.length}")
      def dotA(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }
        s
      }
      // greedy farthest-point seeding: next centroid = sample point with
      // the smallest max-cosine to any chosen one (deterministic spread).
      // A running per-point max — updated once per newly picked centroid —
      // keeps this O(nlist·sample·dim) instead of O(nlist²·sample·dim),
      // which at nlist ~1k would stall the driver for hours.
      val picked = scala.collection.mutable.ArrayBuffer(sample.head)
      val maxCos = sample.map(s => dotA(s, sample.head))
      while (picked.length < nlist) {
        var best = 0
        var i = 1
        while (i < sample.length) {
          if (maxCos(i) < maxCos(best)) best = i
          i += 1
        }
        val next = sample(best)
        picked += next
        i = 0
        while (i < sample.length) {
          val d = dotA(sample(i), next)
          if (d > maxCos(i)) maxCos(i) = d
          i += 1
        }
      }
      var centroids = picked.toArray
      def argmaxList(u: Column, cs: Array[Array[Double]]): Column =
        greatest(cs.zipWithIndex.map { case (c, i) =>
          struct(dot(u, typedlit(c.toSeq)).as("s"), lit(i).as("i"))
        }.toIndexedSeq: _*)("i")
      val dim = centroids(0).length
      for (_ <- 1 to iters) {
        val sums = unit.withColumn("__list", argmaxList(col("__u"), centroids))
          .select(col("__list"), posexplode(col("__u")).as(Seq("__p", "__x")))
          .groupBy("__list", "__p").agg(sum("__x").as("__s"))
          .collect()
        val next = centroids.map(_.clone()) // empty lists keep their centroid
        sums.groupBy(_.getInt(0)).foreach { case (listId, rows) =>
          val mean = new Array[Double](dim)
          rows.foreach(r => mean(r.getInt(1)) = r.getDouble(2))
          val norm = math.sqrt(dotA(mean, mean))
          if (norm > 0) next(listId) = mean.map(_ / norm)
        }
        centroids = next
      }
      // assign the ORIGINAL frame like ivfAssign (zero vectors included;
      // centroids are unit so cosine = dot / ||v||); cast + norm hoisted
      // into their own projection so they evaluate once per row, not
      // once per centroid (see ivfAssign)
      val best = centroids.zipWithIndex.map { case (c, i) =>
        struct((dot(col("__ivf_vd"), typedlit(c.toSeq)) / col("__ivf_nv"))
          .as("s"), lit(i).as("i"))
      }
      (df.withColumn("__ivf_vd", vd)
        .withColumn("__ivf_nv", l2norm(col("__ivf_vd")))
        .withColumn("__list", greatest(best.toIndexedSeq: _*)("i"))
        .drop("__ivf_vd", "__ivf_nv"),
        centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
    } finally unit.unpersist()
  }

  /** The `nprobe` list ids nearest to the query by centroid cosine (ties
    * to the smaller index — the stable sortBy). Driver-side: nlist
    * centroids only. Shared by [[ivfTopK]] and the persisted
    * [[graft.core.VectorIndex]] probe so list selection can never drift.
    */
  def probeListsFor(centroids: Array[(Int, Seq[Double])],
      query: Seq[Double], nprobe: Int): Array[Int] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    centroids.map { case (i, c) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val cos = c.zip(query).map { case (a, b) => a * b }.sum / (cn * qn)
      (i, cos)
    }.sortBy(-_._2).take(nprobe).map(_._1)
  }

  /** IVF probe: score only vectors in the `nprobe` lists nearest to the
    * query, then exact top-k within them.
    */
  def ivfTopK(assigned: DataFrame, centroids: Array[(Int, Seq[Double])],
      idCol: String, vecCol: String, query: Seq[Double], k: Int,
      nprobe: Int): DataFrame = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    val probeLists = probeListsFor(centroids, query, nprobe)
    val v = col(vecCol).cast("array<double>")
    assigned.filter(col("__list").isin(probeLists.toIndexedSeq: _*))
      .select(col(idCol), (dot(v, typedlit(query)) / (l2norm(v) * lit(qn))).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization codebook: the vector dimension splits into `m`
    * subspaces; each subspace gets `ksub` centroids = the subvectors of
    * the first `ksub` vectors by id — the same deterministic,
    * oracle-replayable sampling as [[ivfAssign]] (a kmeans-refined
    * codebook would drop in the same way [[ivfAssignKMeans]] does for
    * IVF; the SQL oracle needs the reproducible baseline).
    * Returns codebook(j)(i) = centroid i of subspace j.
    */
  def pqCodebook(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val sample = df.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.length >= ksub, s"PQ needs >= $ksub vectors, got ${sample.length}")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m)(j => sample.map(_.slice(j * dsub, (j + 1) * dsub)))
  }

  /** PQ encoding: each vector compresses to `m` small codes (4 bits each
    * at ksub=16) — 8 bytes instead of 256 for a float[64] — by taking,
    * per subspace, the L2-nearest codebook centroid. The distance is the
    * reduced form `||c||² - 2·v_sub·c` (the `||v_sub||²` term is constant
    * across candidates, so the argmin is unchanged and one dot product
    * per candidate is saved); ties break to the smaller centroid index.
    * Adds `__code: array<int>`. At 100 TB the codes column is what gets
    * stored and scanned — the raw vectors are only read to build it.
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebook: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    // hoist the cast vector and each subspace slice into their own
    // multi-referenced projection columns: inlined, every candidate
    // centroid re-evaluated its subspace's slice AND the cast (m·ksub
    // array materializations per row); hoisted they evaluate once per
    // row/subspace — identical values (see ivfAssign for the same move)
    val subCols = (0 until m).map(j => s"__pq_s$j")
    val withSubs = (0 until m).foldLeft(
        df.withColumn("__pq_vd", col(vecCol).cast("array<double>"))) {
      (d, j) => d.withColumn(subCols(j),
        slice(col("__pq_vd"), j * dsub + 1, dsub))
    }
    val codes = (0 until m).map { j =>
      val sub = col(subCols(j))
      val cands = codebook(j).zipWithIndex.map { case (c, i) =>
        val cc = c.map(x => x * x).sum
        struct((lit(cc) - lit(2.0) * dot(sub, typedlit(c.toSeq))).as("d"),
          lit(i).as("i"))
      }
      least(cands.toIndexedSeq: _*)("i")
    }
    withSubs.withColumn("__code", array(codes: _*))
      .drop(("__pq_vd" +: subCols): _*)
  }

  /** PQ top-k via asymmetric distance computation (ADC): the query builds
    * an m×ksub lookup table of subspace distances ONCE on the driver, and
    * the scan ranks every vector by `Σ_j lut(j)(code_j)` — m array
    * lookups + adds per row, never touching the raw vectors. The LUT uses
    * the same reduced distance as [[pqEncode]] (the query's own subnorms
    * are constant across all vectors, so the ranking is unchanged).
    * Approximate by construction; the exact baseline is [[cosineTopK]].
    */
  /** The query's m×ksub ADC lookup table — per subspace, the reduced
    * distance `||c||² − 2·q_sub·c` to every codebook centroid (the
    * query's own subnorms are rank-constant). Driver-side; shared by
    * [[pqTopK]] and the persisted [[graft.core.VectorIndex]] ADC probe.
    */
  def adcLut(codebook: Array[Array[Array[Double]]],
      query: Seq[Double]): Array[Seq[Double]] = {
    val m = codebook.length
    val dsub = codebook(0)(0).length
    Array.tabulate(m) { j =>
      val qs = query.slice(j * dsub, (j + 1) * dsub)
      codebook(j).map { c =>
        c.map(x => x * x).sum - 2.0 * qs.zip(c).map { case (a, b) => a * b }.sum
      }.toSeq
    }
  }

  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, m: Int = 8, ksub: Int = 16,
      broadcastThreshold: Int = 512): DataFrame = {
    val codebook = pqCodebook(df, idCol, vecCol, m, ksub)
    val lut: Array[Seq[Double]] = adcLut(codebook, query)
    // Two physically different plans, identical results. Small codebooks
    // (the default 8x16) inline codebook + LUT as codegen'd literals —
    // fastest, but plan size grows as m*ksub literal arrays. Production
    // PQ shapes (m=64, ksub=256 -> 16k arrays) would bloat every plan
    // copy shipped per task, so past the threshold the codebook rides a
    // broadcast variable into one fused encode+ADC kernel instead, and
    // plan size stays constant in m*ksub.
    val scored =
      if (m * ksub <= broadcastThreshold) {
        val adc = (0 until m).map { j =>
          element_at(typedlit(lut(j)), col("__code")(j) + 1)
        }.reduce(_ + _)
        pqEncode(df, idCol, vecCol, codebook)
          .select(col(idCol), adc.as("__adc"))
      } else {
        val spark = df.sparkSession
        val bcCode = spark.sparkContext.broadcast(codebook)
        val bcLut = spark.sparkContext.broadcast(lut.map(_.toArray))
        // same math as pqEncode + the LUT sum: per subspace, the
        // L2-argmin centroid via the reduced distance (ties to the
        // smaller index), then the query's precomputed subspace distance
        val adcOf = udf { (v: Seq[Double]) =>
          val code = bcCode.value
          val l = bcLut.value
          var acc = 0.0
          var j = 0
          while (j < code.length) {
            val cands = code(j)
            var best = 0
            var bestD = Double.MaxValue
            var i = 0
            while (i < cands.length) {
              val c = cands(i)
              var cc = 0.0; var dot = 0.0
              var x = 0
              while (x < c.length) {
                cc += c(x) * c(x); dot += v(j * c.length + x) * c(x); x += 1
              }
              val d = cc - 2.0 * dot
              if (d < bestD) { bestD = d; best = i }
              i += 1
            }
            acc += l(j)(best)
            j += 1
          }
          acc
        }
        df.select(col(idCol),
          adcOf(col(vecCol).cast("array<double>")).as("__adc"))
      }
    scored
      .orderBy(col("__adc").asc, col(idCol))
      .limit(k)
      .select(col(idCol))
  }
}
