package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorExprs.cosineSim

/** Approximate-nearest-neighbor search over the embeddings table.
  * Brute-force cosine top-k is the exactness baseline; IVF (inverted
  * file over a coarse quantizer, probe-1 — Jégou/Douze/Schmid,
  * "Product quantization for nearest neighbor search", TPAMI 2011,
  * minus the PQ compression) is the 100 TB scale path: the centroid
  * set is broadcast, each vector shuffles once on its cell id, and a
  * query probes one cell instead of the full corpus.
  */
object Ann {

  private def embDf(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")

  /** Exact cosine top-10 for query vectors (vec_id < 10): broadcast
    * the tiny query set against the full corpus — one scan, no
    * quadratic blowup. */
  def topkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = embDf(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosineSim(col("qe"), col("emb")).as("c"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF probe-2: queries search their top-2 cells (higher recall at
    * 2× probe cost — the standard IVF recall knob). Cell assignment is
    * an aggregate over the broadcast-centroid scores (map-side
    * combinable: the 8 scored rows per vector collapse to one ≤2-cell
    * list before the exchange), not a per-vector sort window. */
  def ivfTopkProbe2(spark: SparkSession, dir: String): DataFrame = {
    val e = embDf(spark, dir)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("emb").as("ce"))
    val ranked = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("emb"), col("cent_id"), cosineSim(col("emb"), col("ce")).as("c"))
      .groupBy(col("vec_id"), col("emb"))
      .agg(slice(array_sort(collect_list(
        struct((-col("c")).as("nc"), col("cent_id").as("cid")))), 1, 2).as("top2"))
    val cells = ranked
      .select(col("vec_id"), col("emb"), col("top2").getItem(0).getField("cid").as("cell"))
    val q = ranked.filter(col("vec_id") >= 8 && col("vec_id") < 18)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"),
        explode(col("top2")).as("t"))
      .select(col("query_id"), col("qe"), col("t.cid").as("cell"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("vec_id"))
    cells.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosineSim(col("qe"), col("emb")).as("c"))
      .distinct()
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** IVF probe-1: centroids = vec_id < 8 (deterministic codebook);
    * every vector is assigned to its max-cosine cell; queries
    * (8 ≤ vec_id < 18) search only their own cell, top 5. */
  def ivfTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = embDf(spark, dir)
    val cent = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("emb").as("ce"))
    // cell assignment as an aggregate (min over (-cos, cent_id)
    // structs) — map-side combinable, no per-vector sort window
    val cells = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("emb"), col("cent_id"), cosineSim(col("emb"), col("ce")).as("c"))
      .groupBy(col("vec_id"), col("emb"))
      .agg(min(struct((-col("c")).as("nc"), col("cent_id").as("cid"))).as("best"))
      .select(col("vec_id"), col("emb"), col("best.cid").as("cell"))
    val q = cells.filter(col("vec_id") >= 8 && col("vec_id") < 18)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"), col("cell"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("vec_id"))
    cells.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosineSim(col("qe"), col("emb")).as("c"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
      .orderBy("query_id", "rank")
  }
}
