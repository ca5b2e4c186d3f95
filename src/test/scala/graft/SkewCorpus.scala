package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic skewed synthetic corpus generator — the promoted form
  * of the r9 inline 10× stress corpus (one builder, any multiplier), so
  * the dedup/ANN/funnel scale claims accumulate measured evidence at
  * sf1-equivalent sizes instead of re-deriving ad-hoc corpora per spec.
  *
  * Writes `documents.parquet`, `embeddings.parquet`, `events.parquet`
  * into a fresh temp dir shaped exactly like a driver sf dir (so every
  * `SparkEntry.queries` entry and operator function runs on it
  * unchanged), scaled from the given base corpus:
  *
  *  - documents: base ∪ (docMult−1) salted replicas (distinct texts —
  *    band keys spread) ∪ `hotDocCopies` exact copies of ONE base text
  *    (every copy lands in the same LSH band buckets — the hot-bucket
  *    shape that breaks naive all-pairs dedup). Hot doc_ids start at
  *    `hotDocBase(baseRows, docMult)`.
  *  - embeddings: base ∪ replicas with vec_id offsets and a per-replica
  *    deterministic dim-0 perturbation (vectors stay distinct, the
  *    space keeps its geometry; query ids 32..41 survive verbatim).
  *  - events: base ∪ replicas on offset user/event ids (funnel
  *    structure per user preserved) ∪ ONE hot user emitting
  *    `hotUserEvents` events on a view/click/signup/purchase cycle —
  *    the one-key-dominates stream no per-user state machine may
  *    buffer whole.
  *
  * Everything derives from (base corpus, multipliers) — no RNG — so
  * runs are bit-reproducible and comparable round over round.
  */
object SkewCorpus {
  val HotUserId = 9999999L

  def hotDocBase(baseRows: Long, docMult: Int): Long = baseRows * docMult

  /** Builds the corpus and returns its directory. */
  def write(spark: SparkSession, baseSf: String,
            docMult: Int, hotDocCopies: Int,
            embMult: Int,
            eventMult: Int, hotUserEvents: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-skewcorpus").toString

    // ---- documents ----
    val docs = Tables.documents(spark, baseSf)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val nDocs = docs.count()
    val reps = docs.crossJoin(spark.range(1, docMult.toLong).toDF("rep"))
      .selectExpr(s"doc_id + $nDocs * rep AS doc_id",
        "concat(text, ' v', CAST(rep AS STRING), '-', CAST(doc_id AS STRING)) AS text",
        "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val hotText = docs.orderBy("doc_id").select("text").head().getString(0)
    val hotBase = hotDocBase(nDocs, docMult)
    // typed lit(), NOT selectExpr interpolation: Spark SQL literals
    // treat backslash as an escape, so interpolated text containing
    // '\' would corrupt or fail to parse
    val hot = spark.range(hotBase, hotBase + hotDocCopies).toDF("doc_id")
      .select(col("doc_id"), lit(hotText).as("text"), lit("en").as("lang"),
        lit("hotdup").as("source"),
        lit(hotText.length.toLong).as("n_chars"))
    docs.unionAll(reps).unionAll(hot)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // ---- embeddings ----
    val emb = Tables.embeddings(spark, baseSf).select("vec_id", "embedding", "label")
    val nVec = emb.count()
    val embReps = emb.crossJoin(spark.range(1, embMult.toLong).toDF("rep"))
      .selectExpr(s"vec_id + $nVec * rep AS vec_id",
        "transform(embedding, (x, i) -> IF(i = 0, CAST(x + rep * 0.0001 AS FLOAT), x)) AS embedding",
        "label")
    emb.unionAll(embReps)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // ---- events ----
    val ev = Tables.events(spark, baseSf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val nEv = ev.count()
    val maxUser = ev.agg(max(col("user_id"))).head().getLong(0) + 1
    val evReps = ev.crossJoin(spark.range(1, eventMult.toLong).toDF("rep"))
      .selectExpr(s"event_id + $nEv * rep AS event_id", "ts",
        s"user_id + $maxUser * rep AS user_id", "event_type", "value", "props")
    val hotEv = spark.range(0, hotUserEvents.toLong).toDF("i")
      .selectExpr(s"i + ${nEv * eventMult} AS event_id",
        "timestamp_micros(i * 1000) AS ts",
        s"CAST($HotUserId AS BIGINT) AS user_id",
        "element_at(array('view', 'click', 'signup', 'purchase', 'click'), CAST(i % 5 AS INT) + 1) AS event_type",
        "CAST(0.0 AS DOUBLE) AS value", "'{}' AS props")
    // scramble on-disk order deterministically (xxhash64 — no RNG):
    // the hot user's 30k-event run must NOT sit time-sorted in one
    // file, or a bounded per-key reorder buffer would never see the
    // beyond-capacity displacement this corpus exists to exercise
    ev.unionAll(evReps).unionAll(hotEv)
      .orderBy(xxhash64(col("event_id")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
}
