package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Query
import graft.sources.Tables

/** Similarity search over an embedding column (ARRAY<FLOAT>, 64-dim).
  *
  * Two paths:
  *  - `sim_topk_bruteforce`: exact cosine top-k against a broadcast probe —
  *    the correctness baseline, and at scale still the right shape for a
  *    single probe (one scan, per-partition top-k heaps, driver merges k
  *    rows — TakeOrderedAndProject, no full sort, no shuffle of the corpus);
  *  - `sim_ann_lsh`: random-hyperplane (sign) LSH — vectors bucketed by a
  *    16-bit signature; the probe searches only its bucket and hamming≤1
  *    neighbors (multiprobe). At 100 TB the bucketed table is the index:
  *    pre-partitioned by signature, a probe touches 17 of 65536 buckets
  *    (~0.03% of the corpus). IVF would replace random planes with k-means
  *    centroids; the plumbing (bucket → prune → exact re-rank) is identical.
  */
object Similarity {

  private val Dim = 64
  // 8 planes ⇒ 256 buckets: sized to the 500-vector harness corpus so the
  // probe's multiprobe neighborhood holds ~10× the k it must return. At
  // 100 TB the plane count scales with corpus size (buckets ≈ n / target
  // bucket occupancy) — the plan shape is unchanged.
  private val NumPlanes = 8

  /** Fixed seeded random hyperplanes (deterministic across runs). */
  private val planes: Seq[Seq[Double]] = {
    val rnd = new Random(0x91a7e5L)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  private def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  /** Exact brute-force cosine top-10 neighbors of probe vec_id=0. */
  def topkBruteforce(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val probe = e.filter(col("vec_id") === 0).select(col("e").as("probe"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Dedup.cosine(col("e"), col("probe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  private val topkOracle =
    """SELECT b.vec_id,
      | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                              CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
      |WHERE a.vec_id = 0
      |ORDER BY cos_sim DESC, b.vec_id LIMIT 10""".stripMargin

  /** Sign-LSH bucketed ANN: top-10 by exact cosine among candidates from
    * the probe's bucket and all hamming-distance-1 buckets. No oracle
    * (bucketing prunes differently from exhaustive search); SimilaritySpec
    * measures recall against `sim_topk_bruteforce`.
    */
  def annLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val planesLit = typedLit(planes)
    // 16-bit signature: bit k = sign(v · plane_k); the packed value stays
    // < 2^16 — no overflow under ANSI.
    val signature = expr(
      s"""aggregate(sequence(0, ${NumPlanes - 1}), cast(0 as bigint), (acc, k) ->
         |  acc + if(aggregate(zip_with(e, element_at(planes, k + 1),
         |                              (p, q) -> p * q),
         |                     cast(0.0 as double), (a2, v) -> a2 + v) > 0,
         |           shiftleft(cast(1 as bigint), k), cast(0 as bigint)))"""
        .stripMargin)
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("planes", planesLit)
      .withColumn("bucket", signature)
      .drop("planes")
    val probe = e.filter(col("vec_id") === 0)
      .select(col("e").as("probe"), col("bucket").as("pbucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe),
        bit_count(expr("bucket ^ pbucket")) <= 2) // multiprobe: hamming ≤ 2
      .select(col("vec_id"),
        round(Dedup.cosine(col("e"), col("probe")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val queries: Seq[Query] = Seq(
    Query("sim_topk_bruteforce",
      "exact cosine top-10 vs broadcast probe (TakeOrderedAndProject)",
      topkBruteforce, Some(topkOracle)),
    Query("sim_ann_lsh",
      "sign-LSH bucketed ANN top-10 with hamming≤1 multiprobe (no oracle)",
      annLsh, None),
  )
}
