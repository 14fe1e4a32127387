package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Similarity search over an embedding column (`array<float>`).
  *
  * Tiers:
  *  - brute-force cosine top-k: exact baseline — one broadcast of the
  *    query vector, one pass over the corpus, `TakeOrderedAndProject`
  *    physical top-k (no full sort);
  *  - sign-LSH (random hyperplanes): each vector gets a small bucket id
  *    from the signs of `planes` fixed pseudo-random projections;
  *    candidates = same bucket → exact rerank. At 100 TB the bucket id
  *    is a partition/bucketing column, so a query touches one bucket,
  *    not the corpus. Multi-probe = OR over neighboring buckets.
  *  - pairwise near-dup: all candidate pairs with cosine ≥ τ, for
  *    embedding-based dedup; exact (verification tier) or LSH-bucketed.
  *
  * Hyperplane weights are ±1 derived from md5 at PLAN TIME (driver-side
  * constants, [[PortableHash.md5Hex]]), so the same buckets are
  * reproducible in any engine — and the per-row cost is a fused
  * multiply-add over the array, no hashing at runtime.
  */
object SimilarityOps {

  /** Cosine similarity of two equally-sized numeric array columns. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** (rank, id) for a scored candidate set: `orderBy.limit(k)` plans as
    * `TakeOrderedAndProject` (no full sort), then the ≤k survivors fold
    * into ONE bounded array that is sorted and position-exploded. No
    * `row_number` over an unpartitioned Window anywhere — that pattern
    * moves ALL data to one task the moment a caller lifts the limit. */
  private def rankTopK(scored: DataFrame, k: Int, idCol: String): DataFrame =
    scored.orderBy(col("cos").desc, col(idCol)).limit(k)
      .agg(array_sort(collect_list(
        struct((-col("cos")).as("nc"), col(idCol).as("id")))).as("__top__"))
      .select(posexplode(col("__top__")).as(Seq("__p__", "__s__")))
      .select((col("__p__") + 1).cast("int").as("rank"),
        col("__s__").getField("id").as(idCol))

  /** Exact top-k by cosine against one query vector (broadcast). */
  def bruteForceTopK(corpus: DataFrame, query: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = query.select(col(vecCol).as("__qv__"))
    val scored = corpus.crossJoin(broadcast(q))
      .withColumn("cos", cosine(col(vecCol), col("__qv__")))
    rankTopK(scored, k, idCol)
  }

  /** Sign-LSH over `planes` fixed hyperplanes with ±1 weights derived
    * deterministically from md5(plane:dim) parity. */
  final case class SignLsh(planes: Int = 8, dims: Int = 64) {
    require(planes <= 30)

    /** Plan-time weight matrix: w(p)(d) ∈ {-1,+1}. */
    val weights: Array[Array[Double]] =
      Array.tabulate(planes, dims) { (p, d) =>
        val hex = PortableHash.md5Hex(s"$p:$d")
        if ((Integer.parseInt(hex.substring(0, 1), 16) & 1) == 1) 1.0 else -1.0
      }

    /** Bucket id column: bit p set iff dot(vec, w_p) > 0. The cast
      * vector is let-bound so it is built once, not once per plane. */
    def bucket(vecCol: Column): Column =
      graft.functions.Cols.let(transform(vecCol, x => x.cast("double"))) { vd =>
        val bits = (0 until planes).map { p =>
          val w = array(weights(p).map(lit): _*)
          val dot = aggregate(zip_with(vd, w, (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x)
          when(dot > 0, lit(1L << p)).otherwise(lit(0L))
        }
        bits.reduce(_ + _)
      }

    /** ANN top-k: restrict to the query's bucket, exact cosine rerank.
      * Returns (rank, idCol) like the brute-force tier. */
    def topK(corpus: DataFrame, query: DataFrame, k: Int,
        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      val q = query.select(col(vecCol).as("__qv__"),
        bucket(col(vecCol)).as("__qb__"))
      val cand = corpus.withColumn("__b__", bucket(col(vecCol)))
        .join(broadcast(q), col("__b__") === col("__qb__"))
      val scored = cand
        .withColumn("cos", cosine(col(vecCol), col("__qv__")))
      rankTopK(scored, k, idCol)
    }
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nlist` centroids
    * assigns every vector to its best cell; a query probes only its
    * `nprobe` best cells and reranks exactly.
    *
    * The quantizer here is sampled (the `nlist` lowest-id vectors act
    * as centroids) rather than k-means-trained — deterministic, which
    * is what the cross-engine verification needs; swapping in trained
    * centroids changes only the `centroids` method. Centroids live as
    * PLAN-TIME literal arrays (the broadcast-dict pattern: nlist ≈ √N
    * stays driver-size even at 10^9 vectors), so cell assignment is a
    * per-row codegen'd expression and the index write is just
    * `partitionBy(cell)` — a query then scans nprobe partitions, not
    * the corpus.
    */
  final case class IvfIndex(nlist: Int = 16, nprobe: Int = 4) {

    /** Deterministic sampled centroids: the nlist lowest ids. */
    def centroids(df: DataFrame, idCol: String = "vec_id",
        vecCol: String = "embedding"): Array[Array[Double]] =
      df.where(col(idCol) < nlist).orderBy(col(idCol))
        .select(transform(col(vecCol), x => x.cast("double")))
        .collect().map(_.getSeq[Double](0).toArray)

    /** (cos, cell) structs ranked best-first for a vector. The cast
      * vector and its norm are let-bound: computed once per row, not
      * once per centroid. */
    private def rankedCells(vecCol: Column, cents: Array[Array[Double]]): Column =
      graft.functions.Cols.let(transform(vecCol, x => x.cast("double"))) { vd =>
        graft.functions.Cols.let(
          sqrt(aggregate(vd, lit(0.0), (acc, x) => acc + x * x))) { nv =>
          reverse(array_sort(array(cents.zipWithIndex.map { case (ct, i) =>
            val c = array(ct.map(lit): _*)
            val norm = math.sqrt(ct.map(x => x * x).sum)
            val dot = aggregate(zip_with(vd, c, (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x)
            struct((dot / (nv * norm)).as("cos"), lit(i).as("cell"))
          }: _*)))
        }
      }

    /** Best cell id for each vector (the index/partition column). */
    def cell(vecCol: Column, cents: Array[Array[Double]]): Column =
      element_at(rankedCells(vecCol, cents), 1).getField("cell")

    /** Materialize the IVF index: the corpus written `partitionBy(cell)`
      * — the at-rest layout where a query SCANS ONLY its nprobe cell
      * partitions instead of the corpus (partition pruning shows up as
      * `PartitionFilters: [cell IN (...)]` in the scan). Returns the
      * plan-time centroids to pass to [[topKIndexed]]. */
    def writeIndex(corpus: DataFrame, io: graft.sink.TableIO, table: String,
        idCol: String = "vec_id", vecCol: String = "embedding")
        : Array[Array[Double]] = {
      val cents = centroids(corpus, idCol, vecCol)
      io.overwritePartitions(
        corpus.withColumn("cell", cell(col(vecCol), cents)),
        table, Seq("cell"))
      cents
    }

    /** ANN top-k over a materialized index: the query's nprobe best
      * cells become a partition-pruning predicate (a bounded driver-side
      * list, like the reference's shard lookup), then exact rerank over
      * only those partitions. */
    def topKIndexed(spark: org.apache.spark.sql.SparkSession,
        io: graft.sink.TableIO, table: String,
        cents: Array[Array[Double]], query: DataFrame, k: Int,
        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      val probes = slice(rankedCells(col(vecCol), cents), 1, nprobe)
      // nprobe cell ids for ONE query vector: bounded control-plane read
      val qRows = query
        .select(transform(col(vecCol), x => x.cast("double")).as("__qv__"),
          transform(probes, p => p.getField("cell")).as("__qcells__"))
        .take(1)
      if (qRows.isEmpty)
        return io.read(spark, table).limit(0)
          .select(lit(0).cast("int").as("rank"), col(idCol))
      val qCells = qRows.head.getSeq[Int](1)
      val qVec = array(qRows.head.getSeq[Double](0) // literal: broadcast-free
        .map(lit): _*)
      val cand = io.read(spark, table)
        .where(col("cell").isin(qCells: _*)) // partition pruning
      val scored = cand.withColumn("cos", cosine(col(vecCol), qVec))
      rankTopK(scored, k, idCol)
    }

    /** ANN top-k: probe the query's nprobe best cells, exact rerank. */
    def topK(corpus: DataFrame, query: DataFrame, k: Int,
        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
      val cents = centroids(corpus, idCol, vecCol)
      val probes = slice(rankedCells(col(vecCol), cents), 1, nprobe)
      val q = query.select(col(vecCol).as("__qv__"),
        transform(probes, p => p.getField("cell")).as("__qcells__"))
      val cand = corpus.withColumn("__cell__", cell(col(vecCol), cents))
        .join(broadcast(q), array_contains(col("__qcells__"), col("__cell__")))
      val scored = cand
        .withColumn("cos", cosine(col(vecCol), col("__qv__")))
      rankTopK(scored, k, idCol)
    }
  }

  /** Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos) with
    * rounded cosine ≥ threshold.
    *
    * The DEFAULT is the LSH tier (`exact = false`): candidates are
    * restricted to pairs sharing a SignLsh bucket — the 100 TB path (the
    * self-join key is the bucket id, so the shuffle fans out per-bucket,
    * not n²). `exact = true` compares all pairs via a non-equi self-join
    * — an O(n²) VERIFICATION tier, opt-in only, never the default a
    * caller gets by accident.
    */
  final case class EmbedNearDup(threshold: Double, exact: Boolean = false,
      lsh: SignLsh = SignLsh()) {
    def pairs(df: DataFrame, idCol: String = "vec_id",
        vecCol: String = "embedding"): DataFrame = {
      // hoist the double-cast and the norm OUT of the pair join: per-pair
      // work drops to one fused dot product (3× fewer array passes)
      val vd = transform(col(vecCol), x => x.cast("double"))
      val prepped = df.select(col(idCol), vd.as("__v__"),
        sqrt(aggregate(vd, lit(0.0), (acc, x) => acc + x * x)).as("__n__"))
      val base = if (exact) {
        val a = prepped.select(col(idCol).as("vec_a"), col("__v__").as("va"),
          col("__n__").as("na"))
        val b = prepped.select(col(idCol).as("vec_b"), col("__v__").as("vb"),
          col("__n__").as("nb"))
        a.join(b, col("vec_a") < col("vec_b"))
      } else {
        val withB = prepped.withColumn("__b__", lsh.bucket(col("__v__")))
        val a = withB.select(col(idCol).as("vec_a"), col("__v__").as("va"),
          col("__n__").as("na"), col("__b__"))
        val b = withB.select(col(idCol).as("vec_b"), col("__v__").as("vb"),
          col("__n__").as("nb"), col("__b__"))
        a.join(b, Seq("__b__")).where(col("vec_a") < col("vec_b"))
          .select("vec_a", "va", "na", "vec_b", "vb", "nb")
      }
      val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      base.withColumn("cos", round(dot / (col("na") * col("nb")), 4))
        .where(col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    }
  }
}
